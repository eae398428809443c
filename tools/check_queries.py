"""Driver-style correctness harness: run each __ray_entry__ query and its
DuckDB oracle at a given sf, compare row-count + schema + order-insensitive
values.  Usage: python tools/check_queries.py [sf_dir] [only_query ...]"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

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


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # golden oracles are pinned to the driver's sf0.01 path — retarget
    # them when checking another scale factor locally
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    oracles = {k: v.replace("/goldens/sf0.01/", f"/goldens/{tag}/")
               for k, v in oracles.items()}
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            print(f"unknown query name(s): {unknown}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    failed = []
    for name, fn in qs.items():
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"[ERR ] {name}: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"[rows] {name}: {len(got)} rows (no oracle)")
            continue
        want = canon(con.execute(oracles[name]).fetchdf())
        if list(got.columns) != list(want.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} != "
                  f"{list(want.columns)}")
            failed.append(name)
        elif len(got) != len(want):
            print(f"[FAIL] {name}: rows {len(got)} != {len(want)}")
            failed.append(name)
        elif not got.equals(want):
            diff = (got != want).any(axis=1)
            print(f"[FAIL] {name}: {int(diff.sum())} differing rows; "
                  f"first:\n{got[diff].head(3)}\nvs\n{want[diff].head(3)}")
            failed.append(name)
        else:
            print(f"[ OK ] {name}: {len(got)} rows match oracle")
    print("FAILED:" if failed else "ALL OK", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1
                  else "/root/testdata/sf0.01",
                  sys.argv[2:] or None))
