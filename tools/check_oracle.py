"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01; compare row
count, sorted column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tenzir_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR {e}"))
            print(f"FAIL {name}: duckdb error {e}")
            continue
        dcols = sorted(ddf.columns)
        if scols != dcols:
            failures.append((name, f"columns {scols} != {dcols}"))
            print(f"FAIL {name}: columns {scols} != {dcols}")
            continue
        if len(srows) != len(ddf):
            failures.append((name, f"rowcount {len(srows)} != {len(ddf)}"))
            print(f"FAIL {name}: rowcount {len(srows)} != {len(ddf)}")
            continue
        sset = sorted((tuple(norm(r[c]) for c in scols) for r in srows), key=repr)
        dset = sorted((tuple(norm(v) for v in row) for row in
                       ddf[scols].itertuples(index=False, name=None)), key=repr)
        if sset != dset:
            diffs = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b][:3]
            detail = "; ".join(f"row{i}: spark={sset[i]} duck={dset[i]}" for i in diffs)
            failures.append((name, f"values differ: {detail}"))
            print(f"FAIL {name}: values differ: {detail[:400]}")
            continue
        print(f"PASS {name}: {len(srows)} rows")
    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
