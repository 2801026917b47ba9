"""Registry aggregations that have no (or weaker) SQL oracles:
HLL cardinality error bound, index stats sanity."""

from siem_on_amazon_opensearch_service_spark import entry_queries
from siem_on_amazon_opensearch_service_spark.entry_search import (  # noqa: F401
    ft_index_stats,
)

SF = "/root/testdata/sf0.01"


def test_approx_cardinality_error_bounded(spark):
    """The rows-only `agg_cardinality_approx` (HLL++, rsd=0.02) must
    stay within a conservative 3x-rsd band of the exact counts."""
    reg = entry_queries.registry()
    approx = {
        r["event_type"]: r["n_users_approx"]
        for r in reg["agg_cardinality_approx"](spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in reg["agg_cardinality_exact"](spark, SF).collect()
    }
    assert approx.keys() == exact.keys()
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(3, 0.06 * e), (k, approx[k], e)


def test_index_stats_consistent(spark):
    reg = entry_queries.registry()
    r = reg["ft_index_stats"](spark, SF).collect()[0]
    assert r["n_blocks"] > 0 and r["n_postings"] > r["n_blocks"]
    assert r["compressed_bytes"] > 0
    # delta+varbyte on dense small ids: a handful of bytes per posting
    assert 1.0 <= r["bytes_per_posting"] <= 8.0
