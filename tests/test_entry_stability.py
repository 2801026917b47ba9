"""Partition-count stability for every gated registry entry.

The driver's correctness gate hashes entry output values exactly, so
any aggregate whose result depends on partial-merge order (a DOUBLE
sum crossing a round() boundary, a nondeterministic tie-break) flaps
the gate between runs. Round 3 shipped exactly that bug twice
(agg_terms_topn / agg_sum_bucket). This suite runs every entry at two
different spark.sql.shuffle.partitions values and requires the
collected output to be IDENTICAL at full precision — catching the
next instance before the driver does.
"""

import math

import pytest

from siem_on_amazon_opensearch_service_spark import entry_queries

SF_DIR = "/root/testdata/sf0.001"
PARTS = (3, 17)


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            return "0.0"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _snapshot(spark, fn, n_parts):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    # drop every persisted frame (entry-internal persists, the shared
    # index cache): otherwise Spark's CacheManager plan-matches the
    # second run's identical subtrees onto the FIRST run's cached
    # partitions and the invariance of exactly those subtrees is
    # never exercised
    spark.catalog.clearCache()
    try:
        df = fn(spark, SF_DIR)
        cols = sorted(range(len(df.columns)), key=lambda i: df.columns[i])
        rows = sorted(
            tuple(_norm_cell(r[i]) for i in cols) for r in df.collect()
        )
        return sorted(df.columns), rows
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", sorted(entry_queries.registry()))
def test_entry_output_is_partition_invariant(spark, name):
    fn = entry_queries.registry()[name]
    a = _snapshot(spark, fn, PARTS[0])
    b = _snapshot(spark, fn, PARTS[1])
    assert a[0] == b[0], f"{name}: schema changed with partition count"
    assert len(a[1]) == len(b[1]), (
        f"{name}: row count changed with partition count"
    )
    diffs = [(x, y) for x, y in zip(a[1], b[1]) if x != y][:3]
    assert not diffs, (
        f"{name}: output differs between shuffle.partitions={PARTS[0]} "
        f"and {PARTS[1]}; first diffs: {diffs}"
    )
