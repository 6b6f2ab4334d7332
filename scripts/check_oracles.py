"""Emulates the driver's correctness gate: runs every queries() entry on
Spark and its oracle_sql() on DuckDB at the given sf dir, compares row count,
column names, and order-insensitive values. Usage:

    python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from discogsography_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(9)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_oracles", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"skip  {name}: no oracle (rows-only), rows={len(got)} ({time.time()-t0:.1f}s)")
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        g, x = normalize(got), normalize(exp)
        status = []
        if list(g.columns) != list(x.columns):
            status.append(f"cols {list(g.columns)} != {list(x.columns)}")
        if len(g) != len(x):
            status.append(f"rows {len(g)} != {len(x)}")
        if not status:
            try:
                # rtol=0: the driver's gate is an EXACT value hash — pandas'
                # default rtol=1e-5 let a 1.7e-7 relative error (a real
                # summation-order cent flip) pass locally while the driver
                # failed. Any float dust must be red here too.
                pd.testing.assert_frame_equal(
                    g, x, check_dtype=False, rtol=0.0, atol=0.0
                )
            except AssertionError as e:
                status.append(f"values differ: {str(e)[:400]}")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            print(f"ok    {name}: rows={len(g)} ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures")
    for n, msg in failures:
        print(f"  {n}: {msg[:300]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
