"""Committed-output compaction job — storage maintenance for the
resumable extraction layout.

`run_extraction` writes one round directory per shard batch (the commit
grain that makes resume an anti-join, see pipelines/extract_pipeline.py)
— so a long job over many small input shards leaves MANY small parquet
files.  At 100-TB scale that's the classic small-files problem: every
downstream read pays per-file open cost and the object store fragments.
This job rewrites all committed rounds into one `round-compact-*`
directory with ~target_rows_per_file rows per file, preserving every
row (ALL statuses — compaction is byte-faithful maintenance, not
filtering), the shard provenance column, and the commit-manifest
lineage (per-shard records recomputed from the compacted data itself,
so `read_output` and `lineage_report` keep working and a resumed
extraction against the SOURCE input still sees every shard committed).

Usage (also a job entry point):

    ray job submit --working-dir . -- \
        python -m webtext.jobs.compact <src_output_dir> <dst_output_dir> \
        [--target-rows-per-file N]

The destination is a fresh output directory (refused if it already has
a manifest) — the source is never mutated, so a failed compaction
cannot lose data; flipping consumers to the compacted copy is the
caller's atomic switch (same move-as-commit posture as the reference's
update_delivery_file.py:72-83 delivery rename).
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import os
import shutil
import sys
import time


def _committed_files(src_dir: str) -> tuple[list[str], list[str]]:
    """(files, shard_names) of every committed round under src."""
    from ..pipelines.extract_pipeline import CommitManifest

    manifest = CommitManifest(src_dir)
    records = manifest.records()
    if not records:
        raise FileNotFoundError(f"no committed rounds under {src_dir}")
    round_dirs = sorted({r["round_dir"] for r in records})
    files = [f for d in round_dirs
             for f in sorted(glob.glob(os.path.join(src_dir, d, "**",
                                                    "*.parquet"),
                                       recursive=True))]
    shards = sorted({r["shard"] for r in records})
    return files, shards


def compact_output(src_dir: str, dst_dir: str, *,
                   target_rows_per_file: int = 65536) -> dict:
    """Compact a committed extraction output into ``dst_dir``; returns
    the new manifest totals.  Row-preserving: every committed row of
    every status survives, only the file layout changes."""
    import ray.data

    from ..pipelines.extract_pipeline import (CommitManifest,
                                              _collect_round_metrics)

    dst_manifest = CommitManifest(dst_dir)
    if dst_manifest.records():
        raise FileExistsError(
            f"{dst_dir!r} already holds a committed output — compaction "
            "writes to a fresh directory (the source is never mutated)")

    files, shards = _committed_files(src_dir)
    src_totals = CommitManifest(src_dir).totals()
    total_rows = max(1, src_totals["docs"])
    n_files = max(1, -(-total_rows // target_rows_per_file))

    tag = hashlib.md5("\n".join(sorted(files)).encode()).hexdigest()[:12]
    round_dir = os.path.join(dst_dir, f"round-compact-{tag}")
    if os.path.exists(round_dir):
        shutil.rmtree(round_dir)   # uncommitted partial from a crash

    t0 = time.perf_counter()
    # hive partitioning recovers the shard provenance column that
    # write_parquet(partition_cols=["shard"]) moved into dir names
    ds = ray.data.read_parquet(files)
    if "shard" not in ds.schema().names:
        raise ValueError("committed rounds lost the shard column")
    # shard provenance stays as an IN-FILE column (NOT hive dirs): a
    # per-shard directory would re-fragment the layout back to one
    # file per input shard — exactly the small-files problem this job
    # removes.  The lineage read-back groups by the column instead.
    ds.repartition(n_files).write_parquet(round_dir)
    seconds = time.perf_counter() - t0

    records = _collect_round_metrics(round_dir, shards, seconds)
    dst_manifest.commit(records)
    totals = dst_manifest.totals()
    if totals["docs"] != src_totals["docs"]:
        raise RuntimeError(
            f"compaction row-count drift: src {src_totals['docs']} != "
            f"dst {totals['docs']} — dst manifest NOT trustworthy")
    return totals


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="compact a committed extraction output")
    parser.add_argument("src")
    parser.add_argument("dst")
    parser.add_argument("--target-rows-per-file", type=int,
                        default=65536)
    parser.add_argument("--num-cpus", type=int, default=None)
    args = parser.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)
    try:
        totals = compact_output(
            args.src, args.dst,
            target_rows_per_file=args.target_rows_per_file)
        print(totals)
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
