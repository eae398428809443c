"""Bench corpus: large deterministic interleaved corpus, generated in
parallel by Ray tasks and cached as sharded parquet under /tmp.

The hot-domain family is oversampled to ~50% of rows (FIXTURES.md
``hot-domain``), making the corpus a skew testbed as well as a
throughput one.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..schema import INPUT_SCHEMA
from ..synth import (_BOILER, FAMILY_GENERATORS, _html_doc, _paragraph,
                     _rng, gen_hot_domain)

_CORE_FAMILIES = list(FAMILY_GENERATORS)


def _gen_hot_heavy(seed: int, i: int) -> dict:
    """Bench variant of the hot-domain family: ~8 KB pages (24
    paragraphs) so per-doc extraction cost approaches real web pages
    rather than toy snippets."""
    rng = _rng(seed, "hot-domain-heavy", i)
    doc_id = f"https://hot.example.com/hot-domain/{i}"
    paras = "".join(f"<p>{_paragraph(rng)}</p>" for _ in range(24))
    html = (f"<html><head><title>hot {i}</title></head><body>"
            f"{_BOILER}<main>{paras}</main></body></html>")
    return _html_doc(doc_id, html)


def _gen_batch(batch, seed: int) -> pa.Table:
    """index batch → documents; even indices are heavy hot-domain docs
    (≈50% of rows on one domain = the skew testbed)."""
    idxs = batch["id"].tolist() if hasattr(batch["id"], "tolist") \
        else list(batch["id"])
    docs = []
    nfam = len(_CORE_FAMILIES)
    for j in idxs:
        j = int(j)
        if j % 2 == 0:
            docs.append(_gen_hot_heavy(seed, j // 2))
        else:
            k = j // 2
            fam = _CORE_FAMILIES[k % nfam]
            docs.append(FAMILY_GENERATORS[fam](seed, k // nfam))
    return pa.Table.from_pylist(docs, schema=INPUT_SCHEMA)


# bump when any generator changes so cached corpora invalidate
GEN_VERSION = 2


def ensure_bench_corpus(n_docs: int = 60_000, seed: int = 42,
                        root: str = "/tmp/webtext_bench") -> str:
    """Generate (once) and return the corpus directory."""
    import ray.data

    path = os.path.join(root, f"corpus-v{GEN_VERSION}-n{n_docs}-s{seed}")
    marker = os.path.join(path, "_COMPLETE")
    if os.path.exists(marker):
        return path
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    ds = ray.data.range(n_docs)
    ds = ds.map_batches(lambda b: _gen_batch(b, seed),
                        batch_size=2000, batch_format="numpy")
    ds.write_parquet(path, min_rows_per_file=2000)
    with open(marker, "w") as f:
        f.write("ok")
    return path
