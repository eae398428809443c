"""Domain-skew handling: hot-domain detection + salted repartitioning.

The reference has no skew story — hot domains simply serialize behind
their slow handlers (SURVEY §4).  Per the north_rule, this engine handles
domain skew explicitly with a salted groupby-aggregate-sort repartition
*before* the classify stage:

1. ``domain_counts``: partial per-batch counts inside ``map_batches``
   (the combiner pattern — only (domain, n) pairs enter the shuffle, not
   rows), then a small ``groupby(domain).sum()``.
2. ``salted_key``: hot domains get ``domain#<hash(doc_id) % K>`` so no
   single partition owns a hot site; cold domains keep ``domain``.
3. ``rebalance_by_domain``: sort by the salted key → range partitions
   co-locate each (domain, salt) bucket.

When to use: extraction itself is per-row and needs NO co-location — run
``rebalance_by_domain`` only when a downstream per-domain aggregate or a
rule-cache-locality optimization wants domain-clustered blocks, or when
wildly varying per-domain document sizes skew block costs.  It is off by
default in ``run_extraction``.
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc

_DOMAIN_PATTERN = r"https?://(?P<domain>[^/]+)"


def add_domain_column(batch: pa.Table) -> pa.Table:
    """Vectorized domain extraction from doc_id (requests-path semantics:
    www kept, ref:519)."""
    ext = pc.extract_regex(batch.column("doc_id"), _DOMAIN_PATTERN)
    domain = pc.struct_field(ext, "domain")
    domain = pc.fill_null(domain, "")
    return batch.append_column("domain", domain)


def _partial_domain_counts(batch: pa.Table) -> pa.Table:
    batch = add_domain_column(batch)
    counts = batch.group_by("domain").aggregate([("domain", "count")])
    return counts.rename_columns(["domain", "n"])


def domain_counts(ds):
    """Dataset of (domain, n) — partial-aggregated before the shuffle."""
    partial = ds.map_batches(_partial_domain_counts, batch_format="pyarrow",
                             zero_copy_batch=True)
    return partial.groupby("domain").sum("n")


def detect_hot_domains(ds, hot_fraction: float = 0.05,
                       max_hot: int = 64) -> list[str]:
    """Domains holding ≥ hot_fraction of all rows.

    The (domain, total) table is tiny (one row per domain) — safe to pull
    to the driver even at corpus scale.
    """
    counts = domain_counts(ds).to_pandas()
    if counts.empty:
        return []
    col = "sum(n)"
    total = counts[col].sum()
    hot = counts[counts[col] >= hot_fraction * total]
    hot = hot.sort_values(col, ascending=False).head(max_hot)
    return hot["domain"].tolist()


def _salt_of(doc_id: str, buckets: int) -> int:
    # deterministic, process-stable (NOT python hash(), which is salted)
    return zlib.crc32(doc_id.encode("utf-8")) % buckets


def add_salted_key(batch: pa.Table, hot: frozenset[str],
                   buckets: int) -> pa.Table:
    batch = add_domain_column(batch)
    doc_ids = batch.column("doc_id").to_pylist()
    domains = batch.column("domain").to_pylist()
    keys = [
        f"{dom}#{_salt_of(did, buckets):03d}" if dom in hot else dom
        for did, dom in zip(doc_ids, domains)
    ]
    return batch.append_column("skew_key", pa.array(keys, pa.string()))


def rebalance_by_domain(ds, hot_domains: list[str], buckets: int = 16):
    """Salted repartition: hot domains split across ``buckets`` keys, then
    a range-partitioning sort co-locates each bucket.  Returns the
    rebalanced dataset (still carrying ``domain`` and ``skew_key``)."""
    hot = frozenset(hot_domains)
    keyed = ds.map_batches(
        lambda b: add_salted_key(b, hot, buckets),
        batch_format="pyarrow", zero_copy_batch=True)
    return keyed.sort("skew_key")
