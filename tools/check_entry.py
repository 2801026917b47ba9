"""Driver-mimic correctness check: run every queries() entry on Spark
and its oracle_sql() twin on DuckDB at sf0.01; compare row count,
column names (sorted), and order-insensitive values.

Usage: python tools/check_entry.py [name ...]
"""

from __future__ import annotations

import math
import sys

import os

import duckdb

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main():
    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = sys.argv[1:] or sorted(qs)
    failures = []
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle; rows-only check)")
            if len(srows) == 0:
                print(f"  WARNING: zero rows from {name}")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            failures.append(name)
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
        elif len(sr) != len(dr):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(sr)} duck={len(dr)}")
        elif sr != dr:
            failures.append(name)
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:5]
            print(f"FAIL  {name}: values differ, first diffs: {diff}")
        else:
            print(f"OK    {name}: {len(sr)} rows")
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print(f"all {len(names)} checks passed")


if __name__ == "__main__":
    main()
