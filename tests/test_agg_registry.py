"""Registry aggregations that have no (or weaker) SQL oracles:
HLL cardinality error bound, index stats sanity."""

from siem_on_amazon_opensearch_service_spark import entry_queries
from siem_on_amazon_opensearch_service_spark.entry_search import (  # noqa: F401
    ft_index_stats,
)

SF = "/root/testdata/sf0.01"


def test_approx_cardinality_error_bounded(spark):
    """`agg_cardinality` (HLL++, rsd=0.02) asserts in-band itself:
    every bucket's approx_in_bound boolean must hold."""
    reg = entry_queries.registry()
    rows = reg["agg_cardinality"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["approx_in_bound"], (r["event_type"], r["n_users"])


def test_index_stats_consistent(spark):
    reg = entry_queries.registry()
    r = reg["ft_index_stats"](spark, SF).collect()[0]
    assert r["n_postings"] > 0
    assert r["n_salted_terms"] >= 0
    # delta+varbyte layout sanity folded into the gated boolean
    assert r["layout_ok"] is True
