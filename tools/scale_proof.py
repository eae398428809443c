#!/usr/bin/env python
"""sf1 scale-proof (round-4 verdict item 5): one measured
order-of-magnitude point above the bench scale.

Synthesizes an sf1 corpus (10x sf0.1) DETERMINISTICALLY by tiling the
driver's documents/embeddings tables with shifted ids — copy k shifts
ids by k*10_000_000 (id % 100 is preserved, so the daily-crawl splits
keep their 50/50 shape), appends a per-copy token to each text (keeps
the natural exact-dup rate instead of creating a 90%-duplicate corpus)
and perturbs one embedding dimension per copy.  No external data.

Then runs, each in a FRESH Ray session at 32 cpus:
  * headline extraction over a 400k-doc synthetic corpus (10x bench),
  * dedup_apply (MinHash-LSH end-to-end) at sf1,
  * incremental_near_dedup with the persisted band index (index build
    untimed — the build-once lifecycle),
  * knn_ivf_indexed with the persisted IVF index (same lifecycle),
recording wall seconds, peak driver RSS, and Ray spill bytes — the
flat-RSS / bounded-spill evidence BASELINE.md's 100-TB posture argues
from design.

Usage: python tools/scale_proof.py [target ...]
  (default: synth + all four targets, one subprocess per target)
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1_DIR = os.environ.get("WEBTEXT_SCALE_DIR", "/tmp/testdata_sf1")
SRC_DIR = "/root/testdata/sf0.1"
FACTOR = 10
SHIFT = 10_000_000


def make_sf1() -> None:
    """Tile documents + embeddings 10x with shifted ids (pure pyarrow,
    no Ray — runs once, idempotent via a done-marker).  No-op when
    WEBTEXT_SCALE_DIR points at an existing corpus (the sf0.1
    comparison row)."""
    if os.environ.get("WEBTEXT_SCALE_DIR") and os.path.isdir(SF1_DIR) \
            and not SF1_DIR.startswith("/tmp/testdata_sf1"):
        return
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    marker = os.path.join(SF1_DIR, ".done")
    if os.path.exists(marker):
        return
    os.makedirs(SF1_DIR, exist_ok=True)

    docs = pq.read_table(os.path.join(SRC_DIR, "documents.parquet"))
    outs = []
    for k in range(FACTOR):
        ids = pc.add(docs.column("doc_id"), k * SHIFT)
        text = docs.column("text") if k == 0 else \
            pc.binary_join_element_wise(
                docs.column("text"), f" s{k}", "")
        t = pa.Table.from_arrays(
            [ids, text, docs.column("lang"), docs.column("source"),
             pc.add(docs.column("n_chars"),
                    0 if k == 0 else len(f" s{k}"))],
            names=["doc_id", "text", "lang", "source", "n_chars"])
        outs.append(t)
    pq.write_table(pa.concat_tables(outs),
                   os.path.join(SF1_DIR, "documents.parquet"))

    emb = pq.read_table(os.path.join(SRC_DIR, "embeddings.parquet"))
    vecs = np.stack(
        [np.asarray(v, dtype=np.float32)
         for v in emb.column("embedding").to_pylist()])
    labels = emb.column("label")
    vids = emb.column("vec_id")
    outs = []
    d = vecs.shape[1]
    for k in range(FACTOR):
        vk = vecs.copy()
        if k:
            vk[:, k % d] += np.float32(0.001 * k)
        t = pa.Table.from_arrays(
            [pc.add(vids, k * SHIFT),
             pa.array(list(vk), pa.list_(pa.float32())),
             labels],
            names=["vec_id", "embedding", "label"])
        outs.append(t)
    pq.write_table(pa.concat_tables(outs),
                   os.path.join(SF1_DIR, "embeddings.parquet"))
    with open(marker, "w") as f:
        f.write("ok")


def _spilled_bytes() -> int:
    tot = 0
    for p in glob.glob("/tmp/ray/**/ray_spilled_objects_*/**",
                       recursive=True):
        if os.path.isfile(p):
            try:
                tot += os.path.getsize(p)
            except OSError:
                pass
    return tot


def _measure(fn) -> dict:
    import resource

    spill0 = _spilled_bytes()
    t0 = time.perf_counter()
    rows = fn()
    dt = time.perf_counter() - t0
    return {
        "seconds": round(dt, 2),
        "rows": rows,
        "driver_peak_rss_mib": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024,
            1),
        "spilled_mib": round((_spilled_bytes() - spill0) / 2**20, 1),
    }


def run_target(target: str) -> dict:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False)
    out: dict = {"target": target}
    if target == "extract":
        from webtext.pipelines import run_extraction
        from webtext.pipelines.bench_corpus import ensure_bench_corpus

        corpus = ensure_bench_corpus(400_000)

        def go():
            d = f"/tmp/webtext_sf1/out-{os.getpid()}"
            totals = run_extraction(corpus, d, batch_size=128,
                                    concurrency=20,
                                    shards_per_round=1000)
            import shutil
            shutil.rmtree(d, ignore_errors=True)
            return totals["docs"]

        out.update(_measure(go))
        out["docs_per_sec"] = round(out["rows"] / out["seconds"], 1)
    else:
        import __ray_entry__ as entry

        qs = entry.queries()
        if target == "knn_ivf_indexed":
            # IVF index build untimed (build-once lifecycle); prewarm
            # itself also wants TPC-H tables the sf1 tiling omits
            from webtext.functions import ann
            path = entry._ivf_index_path(SF1_DIR)
            if not os.path.exists(path):
                ann.ivf_build_index(entry._emb(SF1_DIR), path,
                                    nlist=16)
        if target == "incremental_near_dedup":
            # trigger the one-time band-index build untimed
            qs[target](SF1_DIR).count()

        def go():
            r = qs[target](SF1_DIR)
            return r.count() if hasattr(r, "count") else len(r)

        out.update(_measure(go))
    ray.shutdown()
    return out


def main() -> int:
    targets = sys.argv[1:] or ["extract", "dedup_apply",
                               "incremental_near_dedup",
                               "knn_ivf_indexed"]
    if targets == ["--synth"]:
        make_sf1()
        print("synth ok")
        return 0
    make_sf1()
    if len(targets) == 1 and os.environ.get("WEBTEXT_SF1_CHILD"):
        print(json.dumps(run_target(targets[0])))
        return 0
    for t in targets:
        env = dict(os.environ, WEBTEXT_SF1_CHILD="1")
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), t],
            env=env, capture_output=True, text=True, cwd=REPO)
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        print(line, flush=True)
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
