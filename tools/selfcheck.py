"""Driver-mimicking selfcheck: fresh process, sf0.01, per-query timing,
JSON artifact out.  Run before every commit:

    python tools/selfcheck.py [sf_dir] [--cold] [--json OUT]

Mimics the driver's worst case: chdirs to /tmp BEFORE ray.init so Ray
workers cannot import webtext via cwd (the round-2 driver artifact came
back empty because an actor stage hung exactly this way).  --cold removes
the /tmp caches (committed runs, IVF indexes) first, so the timing
reflects what the driver's fresh container pays.  Exit 0 only when every
query matches its oracle (or passes its rows-only check).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--cold", action="store_true",
                    help="wipe /tmp/webtext_* caches first")
    ap.add_argument("--json", default="/tmp/selfcheck.json")
    ap.add_argument("--num-cpus", type=int, default=8)
    args = ap.parse_args()

    if args.cold:
        for p in glob.glob("/tmp/webtext_*"):
            shutil.rmtree(p, ignore_errors=True)

    os.chdir("/tmp")  # driver worst case: repo not on the cwd path

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)

    sys.path.insert(0, REPO)
    t_import = time.perf_counter()
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    tag = args.sf_dir.rstrip("/").rsplit("/", 1)[-1]
    oracles = {k: v.replace("/goldens/sf0.01/", f"/goldens/{tag}/")
               for k, v in oracles.items()}

    results: dict[str, dict] = {}
    t_all = time.perf_counter()
    for name, fn in qs.items():
        t0 = time.perf_counter()
        row: dict = {"status": "?", "sec": 0.0}
        try:
            got = canon(to_pandas(fn(args.sf_dir)))
            row["rows"] = len(got)
            if name not in oracles:
                row["status"] = "rows_only"
            else:
                want = canon(con.execute(oracles[name]).fetchdf())
                if list(got.columns) != list(want.columns):
                    row["status"] = "FAIL_schema"
                    row["detail"] = (f"{list(got.columns)} != "
                                     f"{list(want.columns)}")
                elif len(got) != len(want):
                    row["status"] = "FAIL_rows"
                    row["detail"] = f"{len(got)} != {len(want)}"
                elif not got.equals(want):
                    ndiff = int((got != want).any(axis=1).sum())
                    row["status"] = "FAIL_values"
                    row["detail"] = f"{ndiff} differing rows"
                else:
                    row["status"] = "ok"
        except Exception as e:  # noqa: BLE001
            row["status"] = "ERROR"
            row["detail"] = f"{type(e).__name__}: {e}"
        row["sec"] = round(time.perf_counter() - t0, 3)
        results[name] = row
        print(f"[{row['status']:>10}] {name:28s} {row['sec']:7.2f}s "
              f"{row.get('detail', '')}")

    total = time.perf_counter() - t_all
    bad = [n for n, r in results.items()
           if r["status"] not in ("ok", "rows_only")]
    summary = {
        "sf": args.sf_dir, "num_cpus": args.num_cpus,
        "import_to_first_query_sec": round(t_all - t_import, 3),
        "total_sec": round(total, 3),
        "n_queries": len(results),
        "n_ok": sum(r["status"] == "ok" for r in results.values()),
        "n_rows_only": sum(r["status"] == "rows_only"
                           for r in results.values()),
        "failed": bad,
        "queries": results,
    }
    with open(args.json, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\ntotal {total:.1f}s  ok={summary['n_ok']} "
          f"rows_only={summary['n_rows_only']} failed={bad}")
    print(f"wrote {args.json}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
