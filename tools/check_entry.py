"""Driver-mimic correctness check: run every queries() entry on Spark
and its oracle_sql() twin on DuckDB at sf0.01; compare row count,
column names (sorted), and order-insensitive values.

Floats compare at FULL precision (repr round-trip) by default — the
driver hashes exact values, so a last-ulp divergence that a 6-sig-digit
normalization would forgive still reads as a hash mismatch there. Set
CHECK_FLOAT_SIG=6 to fall back to significant-digit normalization.

The --partitions flag re-runs the Spark side at several
spark.sql.shuffle.partitions values and also checks the runs against
EACH OTHER: a float aggregate whose partial-sum merge order leaks into
the output flips between configs (the round-3 flap class) and fails
here before the driver sees it.

Usage: python tools/check_entry.py [--partitions 2,7,32]
           [--dump out.txt] [name ...]

--dump writes each checked entry's canonicalized row set (columns
sorted by name, cells repr-normalized, rows sorted — exactly the form
this script compares) to ``out.txt`` as one block per entry. Purpose:
a driver-side hash mismatch that cannot be reproduced locally then
starts from a value-level diff against the committed dump instead of
a boolean — see tools/dumps/README.md.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
FLOAT_SIG = os.environ.get("CHECK_FLOAT_SIG")  # None -> full precision
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            return "0.0"  # -0.0 == 0.0
        if FLOAT_SIG:
            return f"{v:.{int(FLOAT_SIG)}g}"
        return repr(v)
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

    args = sys.argv[1:]
    partitions = [8]
    dump_path = None
    while args and args[0].startswith("--"):
        if args[0] == "--partitions":
            partitions = [int(x) for x in args[1].split(",")]
            args = args[2:]
        elif args[0] == "--dump":
            dump_path = args[1]
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", str(partitions[0]))
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
    names = args or sorted(qs)
    failures = []
    dump_f = open(dump_path, "w") if dump_path else None
    for name in names:
        runs = []  # (partitions, cols, normalized rows)
        err = None
        for np_ in partitions:
            spark.conf.set("spark.sql.shuffle.partitions", str(np_))
            if len(partitions) > 1:
                # see tests/test_entry_stability.py: without this the
                # CacheManager serves run 2 from run 1's cached
                # subtrees and the cross-config check is vacuous
                spark.catalog.clearCache()
            try:
                sdf = qs[name](spark, SF_DIR)
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
            except Exception as e:
                err = e
                break
            runs.append((np_, *norm_rows(scols, srows)))
        if err is not None:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {err}")
            continue
        # cross-config stability: every run must be bit-identical
        unstable = [
            (runs[0][0], np_) for np_, c, r in runs[1:]
            if (c, r) != (runs[0][1], runs[0][2])
        ]
        if unstable:
            failures.append(name)
            print(f"FAIL  {name}: UNSTABLE across shuffle partitions "
                  f"{[u[1] for u in unstable]} vs {runs[0][0]}")
            continue
        sc, sr = runs[0][1], runs[0][2]
        if dump_f is not None:
            print(f"== {name} columns={sc}", file=dump_f)
            for row in sr:
                print("\t".join(row), file=dump_f)
        if name not in oracles:
            print(f"ROWS  {name}: {len(sr)} rows "
                  f"(no oracle; rows-only check)")
            if len(sr) == 0:
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
            tag = (f"{len(partitions)} cfgs" if len(partitions) > 1
                   else "1 cfg")
            print(f"OK    {name}: {len(sr)} rows ({tag})")
    if dump_f is not None:
        dump_f.close()
        print(f"dump written: {dump_path}")
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print(f"all {len(names)} checks passed")


if __name__ == "__main__":
    main()
