"""Cluster job entry point for any registered operator query.

Every pipeline in ``__ray_entry__.queries()`` becomes a runnable job:

    ray job submit --working-dir . -- \\
        python -m webtext.jobs.run_query <query-name> \\
        --sf-dir <storage>/tables --output <storage>/result \\
        [--list] [--num-cpus N]

The result lands as PARTITIONED parquet (Ray writes one file per
output block, so a big result is many files and a re-run can target a
fresh directory); small in-memory results (Arrow tables the query
already collected) write one file.  ``--list`` prints the registry.

Only this entry point owns a Ray session (guarded — reused if the job
runner already initialised one)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="run one registered webtext operator query")
    parser.add_argument("query", nargs="?",
                        help="query name (see --list)")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                        help="input table directory")
    parser.add_argument("--output", default=None,
                        help="write the result here as parquet "
                             "(default: print row count only)")
    parser.add_argument("--partition-by", default=None,
                        help="comma-separated columns: write the result "
                             "hive-partitioned (one directory per key, "
                             "so a re-run can target/skip partitions)")
    parser.add_argument("--list", action="store_true",
                        help="print available query names and exit")
    parser.add_argument("--num-cpus", type=int, default=None,
                        help="local mode only: cap the Ray session CPUs")
    args = parser.parse_args(argv)

    # repo root on sys.path so __ray_entry__ imports from any cwd
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    import __ray_entry__ as entrymod

    registry = entrymod.queries()
    if args.list:
        for name in sorted(registry):
            print(name)
        return 0
    if not args.query or args.query not in registry:
        print(f"unknown query {args.query!r}; use --list",
              file=sys.stderr)
        return 2

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        init_kwargs = {"include_dashboard": False}
        if args.num_cpus:
            init_kwargs["num_cpus"] = args.num_cpus
            init_kwargs["address"] = "local"
        ray.init(**init_kwargs)

    t0 = time.perf_counter()
    result = registry[args.query](args.sf_dir)

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    if args.output:
        # refuse a non-empty target: the row count below walks every
        # *.parquet under --output, so stale files from a previous run
        # would silently mix into both the on-disk result and the count
        if os.path.isdir(args.output) and any(
                f.endswith(".parquet")
                for _r, _d, fs in os.walk(args.output) for f in fs):
            raise SystemExit(
                f"--output {args.output} already contains parquet "
                "files; point at a fresh directory")
        if isinstance(result, pd.DataFrame):
            result = pa.Table.from_pandas(result, preserve_index=False)
        if isinstance(result, pa.Table):
            os.makedirs(args.output, exist_ok=True)
            pq.write_table(result,
                           os.path.join(args.output, "part-0.parquet"))
            n = result.num_rows
        else:                     # ray.data.Dataset → one file per block
            if args.partition_by:
                result.write_parquet(
                    args.output,
                    partition_cols=args.partition_by.split(","))
            else:
                result.write_parquet(args.output)
            # count from the written files' footers — re-running the
            # (lazy) pipeline just to count would execute it twice
            n = 0
            for root, _dirs, files in os.walk(args.output):
                for f in files:
                    if f.endswith(".parquet"):
                        n += pq.ParquetFile(
                            os.path.join(root, f)).metadata.num_rows
    else:
        if isinstance(result, pa.Table):
            n = result.num_rows
        elif isinstance(result, pd.DataFrame):
            n = len(result)
        else:
            n = result.count()

    print(json.dumps({"query": args.query, "rows": int(n),
                      "sec": round(time.perf_counter() - t0, 3),
                      "output": args.output}))
    if owns_session:              # never tear down a caller's session
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
