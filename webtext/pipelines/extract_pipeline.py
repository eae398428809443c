"""End-to-end extraction pipeline: read → (rebalance) → extract → write,
with shard-granular commit + resume.

Execution model (SURVEY §4): one streaming pass per round — no barrier
between read, extract and write; Ray's streaming executor pipelines
blocks with backpressure and spills via the object store.  Rounds exist
only as the commit granularity: a round of input shards is extracted,
written, and committed atomically to the manifest; a failed round leaves
no commit record and is redone idempotently (its round directory is
overwritten by shard-list hash).  This is the reference's
"completed_folder subtraction" resume pattern (run_all_starts.py:21-42)
at shard granularity, without its batch barrier: within a round all
shards stream concurrently.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time

import pyarrow as pa

from ..sources.io import list_fragments, read_documents
from ..sources.manifest import CommitManifest
from ..stages.extractor import ExtractorActor

KEPT_STATUSES = ("ok", "timeout")


def default_pool_size() -> int:
    """Fixed actor-pool size leaving ~25% CPU headroom for the read and
    write task operators.  An exact-fit pool (actors == cluster CPUs)
    starves the reader and collapses throughput (measured: 32/32 actors
    on 32 CPUs ran 4x slower than 24/32); a fixed pool also avoids the
    autoscaling ramp that dominates short jobs."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    # never exact-fit, even on a 1-2 CPU driver cluster: leave at least
    # one CPU for the read/write task operators or the pool stalls
    return max(1, min(ncpu - 1, int(ncpu * 0.75)))


def extract_dataset(ds, *, batch_size: int = 32, concurrency=None):
    """Attach the extraction actor-pool stage to a documents Dataset."""
    import ray

    if concurrency is None:
        concurrency = default_pool_size()
    return ds.map_batches(
        ExtractorActor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def _round_id(shards: list[str]) -> str:
    h = hashlib.sha256("\n".join(os.path.basename(s)
                                 for s in shards).encode())
    return h.hexdigest()[:12]


def _shard_name(path: str) -> str:
    return os.path.basename(path).replace(".parquet", "")


def _tag_shard(batch: pa.Table) -> pa.Table:
    """Adds the shard provenance column from the reader's path column.
    Plain function → task-based map, fused with the read (an actor here
    would funnel every batch through one process)."""
    paths = batch.column("path").to_pylist()
    shard = pa.array([_shard_name(p) for p in paths], pa.string())
    batch = batch.drop_columns(["path"])
    return batch.append_column("shard", shard)


def run_extraction(
    input_dir: str,
    output_dir: str,
    *,
    batch_size: int = 32,
    concurrency=None,
    shards_per_round: int = 16,
    resume: bool = True,
    rebalance: bool = False,
    hot_fraction: float = 0.05,
    salt_buckets: int = 16,
) -> dict:
    """Extract every pending input shard; returns manifest totals.

    ``rebalance=True`` inserts the salted-domain repartition before the
    classify stage (see webtext.stages.skew for when that pays off).
    """
    import ray.data

    manifest = CommitManifest(output_dir)
    shards = list_fragments(input_dir)
    if not shards:
        raise FileNotFoundError(
            f"no input fragments (*.parquet) under {input_dir!r}")
    if resume:
        done = manifest.committed_shards()
        shards = [s for s in shards if _shard_name(s) not in done]

    for start in range(0, len(shards), shards_per_round):
        round_shards = shards[start:start + shards_per_round]
        round_dir = os.path.join(output_dir,
                                 f"round-{_round_id(round_shards)}")
        if os.path.exists(round_dir):
            shutil.rmtree(round_dir)   # uncommitted partial from a crash

        t0 = time.perf_counter()
        ds = ray.data.read_parquet(round_shards,
                                   columns=["doc_id", "spans"],
                                   include_paths=True)
        ds = ds.map_batches(_tag_shard, batch_format="pyarrow",
                            zero_copy_batch=True)
        if rebalance:
            from ..stages.skew import rebalance_for_extraction
            # one materialized pass detects hot domains AND feeds the
            # scope="hot" split: extraction wants ACTOR BALANCE, not
            # cold-domain co-location — only the skewed rows pay the
            # exchange; the cold majority streams into the actor pool
            ds, _hot = rebalance_for_extraction(
                ds, hot_fraction=hot_fraction, buckets=salt_buckets)

        extracted = _extract_keeping_shard(ds, batch_size=batch_size,
                                           concurrency=concurrency)
        extracted.write_parquet(round_dir, partition_cols=["shard"])
        seconds = time.perf_counter() - t0

        records = _collect_round_metrics(round_dir, round_shards, seconds)
        manifest.commit(records)

    return manifest.totals()


class _ExtractorWithShard(ExtractorActor):
    """Extraction actor that forwards the shard provenance column."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        shards = batch.column("shard")
        out = super().__call__(batch.drop_columns(["shard"]))
        return out.append_column("shard", shards)


def _extract_keeping_shard(ds, *, batch_size, concurrency):
    import ray

    if concurrency is None:
        concurrency = default_pool_size()
    return ds.map_batches(
        _ExtractorWithShard,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def _collect_round_metrics(round_dir: str, round_shards: list[str],
                           seconds: float) -> list[dict]:
    """Per-shard lineage records from a cheap columnar read-back of the
    just-written round (status/method/n_chars_out only — no payloads).

    Streaming Arrow aggregation: each scanner batch is group-by-reduced
    in C (shard × status × method-combo partials), partials are merged,
    and only the tiny aggregate table is ever turned into Python objects
    — per-document rows never materialize on the driver."""
    import collections

    import pyarrow.dataset as pads

    dataset = pads.dataset(round_dir, partitioning="hive")
    keys = ["shard", "status", "method"]
    partials = []
    for rb in dataset.to_batches(columns=["status", "method",
                                          "n_chars_out", "shard"]):
        t = pa.Table.from_batches([rb])
        partials.append(t.group_by(keys).aggregate(
            [("n_chars_out", "sum"), ("status", "count")]))
    if partials:
        merged = pa.concat_tables(partials).group_by(keys).aggregate(
            [("n_chars_out_sum", "sum"), ("status_count", "sum")])
        merged = merged.rename_columns(
            keys + ["n_chars_out_sum", "status_count_sum"])
    else:
        merged = pa.Table.from_pydict(
            {k: [] for k in keys + ["n_chars_out_sum",
                                    "status_count_sum"]})

    by_shard: dict[str, dict] = {}
    total_docs = 0
    for row in merged.to_pylist():          # aggregate rows only — tiny
        shard, n = str(row["shard"]), int(row["status_count_sum"])
        rec = by_shard.setdefault(shard, {
            "shard": shard, "docs": 0, "ok": 0, "timeout": 0, "failed": 0,
            "error_pattern": 0, "n_chars_out": 0,
            "method_histogram": collections.Counter(),
            "round_dir": os.path.basename(round_dir),
        })
        rec["docs"] += n
        rec[row["status"]] += n
        rec["n_chars_out"] += int(row["n_chars_out_sum"])
        for m in (row["method"] or "").split(","):
            if m:
                rec["method_histogram"][m] += n
        total_docs += n
    total_docs = max(1, total_docs)
    records = []
    for shard_path in round_shards:
        name = _shard_name(shard_path)
        rec = by_shard.get(name, {
            "shard": name, "docs": 0, "ok": 0, "timeout": 0, "failed": 0,
            "error_pattern": 0, "n_chars_out": 0, "method_histogram": {},
            "round_dir": os.path.basename(round_dir)})
        rec["method_histogram"] = dict(rec["method_histogram"])
        rec["seconds"] = seconds * rec["docs"] / total_docs
        rec["docs_per_sec"] = (rec["docs"] / rec["seconds"]
                               if rec["seconds"] > 0 else 0.0)
        records.append(rec)
    return records


def read_output(output_dir: str, statuses=KEPT_STATUSES,
                as_of: int | None = None):
    """Dataset over committed rounds only (uncommitted partials are
    invisible), filtered to kept statuses.

    ``as_of`` = snapshot time travel at round granularity (the
    Iceberg-style read the immutable manifest makes free): only the
    first ``as_of`` committed rounds IN COMMIT ORDER are visible —
    the exact dataset a consumer saw after that round's commit,
    regardless of how many rounds a resumed run appended since.
    None (default) reads every committed round."""
    import ray.data

    import glob

    manifest = CommitManifest(output_dir)
    seen: set[str] = set()
    ordered: list[str] = []
    for r in manifest.records():        # append order = commit order
        d = r["round_dir"]
        if d not in seen:
            seen.add(d)
            ordered.append(d)
    if as_of is not None:
        ordered = ordered[:as_of]
    round_dirs = sorted(ordered)
    files = [
        f
        for d in round_dirs
        for f in sorted(glob.glob(os.path.join(output_dir, d, "**",
                                               "*.parquet"),
                                  recursive=True))
    ]
    if not files:
        raise FileNotFoundError(f"no committed rounds under {output_dir}")
    ds = ray.data.read_parquet(files)
    allowed = list(statuses)
    return ds.filter(
        expr=" or ".join(f"status == '{s}'" for s in allowed))


def run_pipeline_in_memory(docs: list[dict], *, batch_size: int = 32,
                           concurrency=None):
    """Small-scale helper (tests/smoke): list of docs → extracted rows."""
    import ray.data

    from ..schema import INPUT_SCHEMA

    table = pa.Table.from_pylist(docs, schema=INPUT_SCHEMA)
    ds = ray.data.from_arrow(table)
    return extract_dataset(ds, batch_size=batch_size,
                           concurrency=concurrency)
