"""Star-tree pre-aggregated cube: build == groupBy truth, gid
addressing, where-filtered merge re-aggregation, avg derivation,
search-body routing (answer vs fall-back), and partition pruning on
the persisted layout."""

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators.startree import (
    StarTree, startree_build, startree_query, startree_route,
)

ROWS = [
    # (grp, src, ts, value)
    ("a", "s1", "2024-01-03", 10.0),
    ("a", "s1", "2024-01-20", 20.0),
    ("a", "s2", "2024-02-01", 30.0),
    ("b", "s1", "2024-02-11", 40.0),
    ("b", "s2", "2024-02-12", 50.0),
    ("b", "s2", "2024-03-01", 60.0),
    (None, "s1", "2024-03-05", 70.0),
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(
        ROWS, "grp string, src string, ts_s string, value double")
    return df.withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")


@pytest.fixture(scope="module")
def st(docs):
    return startree_build(
        docs,
        ["grp", "src",
         {"date_histogram": {"field": "ts", "calendar_interval": "month"}}],
        {"value": ["sum", "min", "max", "value_count"]})


def _truth(docs, by, where_expr=None):
    d = docs if where_expr is None else docs.filter(where_expr)
    rows = (d.groupBy(*by)
            .agg(F.count(F.lit(1)).alias("doc_count"),
                 F.sum("value").alias("value_sum"))
            .collect())
    return {tuple(str(r[b]) for b in by): (r["doc_count"], r["value_sum"])
            for r in rows}


def test_cube_matches_groupby_every_dim_subset(docs, st):
    for by in ([], ["grp"], ["src"], ["grp", "src"]):
        got = startree_query(st, by, [("value", "sum")]).collect()
        want = _truth(docs, by)
        if not by:
            assert got[0]["doc_count"] == 7
            assert got[0]["value_sum"] == pytest.approx(280.0)
            continue
        gmap = {tuple(str(r[b]) for b in by):
                (r["doc_count"], r["value_sum"]) for r in got}
        assert gmap == {k: (n, pytest.approx(s))
                        for k, (n, s) in want.items()}


def test_null_key_is_a_real_bucket(st):
    rows = {r["grp"]: r["doc_count"]
            for r in startree_query(st, ["grp"]).collect()}
    assert rows == {"a": 3, "b": 3, None: 1}


def test_where_merge_and_avg(docs, st):
    got = startree_query(
        st, ["grp"], [("value", "avg"), ("value", "min")],
        where={"src": "s2"}).collect()
    gmap = {r["grp"]: (r["doc_count"], r["value_avg"], r["value_min"])
            for r in got}
    assert gmap == {"a": (1, pytest.approx(30.0), 30.0),
                    "b": (2, pytest.approx(55.0), 50.0)}
    # range where on the date dim
    got2 = startree_query(
        st, ["src"], [("value", "sum")],
        where={"ts__month": {"gte": "2024-02-01"}}).collect()
    assert {r["src"]: r["value_sum"] for r in got2} == {
        "s1": pytest.approx(110.0), "s2": pytest.approx(140.0)}


def test_non_algebraic_metric_rejected(docs):
    with pytest.raises(ValueError, match="algebraic"):
        startree_build(docs, ["grp"], {"value": ["percentiles"]})
    st = startree_build(docs, ["grp"], {"value": ["sum"]})
    with pytest.raises(ValueError, match="avg"):
        startree_query(st, ["grp"], [("value", "avg")])


def test_route_answers_covered_body(docs, st):
    body = {"query": {"bool": {"filter": [{"term": {"src": "s1"}}]}},
            "aggs": {"by_grp": {"terms": {"field": "grp", "size": 5},
                                "aggs": {"v": {"sum": {"field": "value"}}}},
                     "by_month": {"date_histogram": {
                         "field": "ts", "calendar_interval": "month"}}}}
    res = startree_route(st, body)
    assert res is not None
    byg = {r["by_grp"]: (r["doc_count"], r["v"])
           for r in res["by_grp"].collect()}
    want = _truth(docs, ["grp"], F.col("src") == "s1")
    assert byg == {None if k == ("None",) else k[0]:
                   (n, pytest.approx(s)) for k, (n, s) in want.items()}
    months = [str(r["by_month"])[:7] for r in res["by_month"].collect()]
    assert months == ["2024-01", "2024-02", "2024-03"]


def test_route_falls_back_when_not_coverable(st):
    # full-text query -> not dim-only
    assert startree_route(st, {
        "query": {"match": {"text": "spark"}},
        "aggs": {"g": {"terms": {"field": "grp"}}}}) is None
    # metric on an unmaterialized field
    assert startree_route(st, {
        "aggs": {"g": {"terms": {"field": "grp"},
                       "aggs": {"p": {"sum": {"field": "other"}}}}}}) is None
    # non-algebraic sub-agg
    assert startree_route(st, {
        "aggs": {"g": {"terms": {"field": "grp"},
                       "aggs": {"p": {"percentiles":
                                      {"field": "value"}}}}}}) is None


def test_save_load_partition_pruning(spark, docs, st, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("startree") / "st")
    st.save(path)
    st2 = StarTree.load(spark, path)
    assert st2.dims == st.dims and st2.metrics == st.metrics
    q = startree_query(st2, ["grp"], [("value", "sum")])
    got = {r["grp"]: r["value_sum"] for r in q.collect()}
    assert got == {"a": pytest.approx(60.0), "b": pytest.approx(150.0),
                   None: pytest.approx(70.0)}
    # the gid equality must reach the scan as a PARTITION filter --
    # non-queried cube slices are never read
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_gid" in plan


def test_sync_sequence_equals_full_build(spark, docs, tmp_path_factory):
    from pyspark.sql import functions as F
    from siem_on_amazon_opensearch_service_spark.operators.startree import (
        startree_sync,
    )

    path = str(tmp_path_factory.mktemp("startree") / "sync")
    dims = ["grp", "src",
            {"date_histogram": {"field": "ts",
                                "calendar_interval": "month"}}]
    mets = {"value": ["sum", "min", "max", "value_count"]}
    first = docs.filter(F.col("ts") < "2024-02-10")
    wm0 = first.agg(F.max("ts")).head()[0]
    startree_build(first, dims, mets).save(path, watermark=wm0)

    res = startree_sync(spark, path, docs, "ts")
    assert res["delta_docs"] == docs.filter(
        F.col("ts") > F.lit(wm0)).count()

    synced = StarTree.load(spark, path)
    full = startree_build(docs, dims, mets)

    def canon(st):
        cols = sorted(set(st.cube.columns))
        return sorted(
            tuple(str(r[c]) for c in cols) for r in st.cube.collect())

    assert canon(synced) == canon(full)
    # idempotent: nothing past the new watermark
    res2 = startree_sync(spark, path, docs, "ts")
    assert res2["delta_docs"] == 0
    assert canon(StarTree.load(spark, path)) == canon(full)


def test_search_body_routes_through_startree(spark):
    from siem_on_amazon_opensearch_service_spark.index import build_index
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_body,
    )

    rows = [(0, "spark a", "a", "s1", 10.0), (1, "spark b", "a", "s2", 20.0),
            (2, "spark c", "b", "s1", 30.0), (3, "other d", "b", "s2", 40.0)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, grp string, src string, "
        "value double")
    ix = build_index(spark, d, text_col="text", id_col="doc_id",
                     keep_cols=["grp", "src", "value"])
    st = startree_build(d, ["grp", "src"], {"value": ["sum",
                                                      "value_count"]})
    covered = {"query": {"term": {"src": "s1"}}, "size": 0,
               "aggs": {"g": {"terms": {"field": "grp"},
                              "aggs": {"v": {"sum": {"field": "value"}}}}}}
    via_st = search_body(ix, covered, startree=st)
    plain = search_body(ix, covered)
    a = {r["g"]: (r["doc_count"], r["v"])
         for r in via_st["aggs"]["g"].collect()}
    b = {r["g"]: (r["doc_count"], r["v"])
         for r in plain["aggs"]["g"].collect()}
    assert a == b == {"a": (1, 10.0), "b": (1, 30.0)}
    # uncovered (full-text query) falls back to the document path
    uncov = {"query": {"match": {"text": "spark"}}, "size": 0,
             "aggs": {"g": {"terms": {"field": "grp"}}}}
    via_st2 = search_body(ix, uncov, startree=st)
    assert {r["g"]: r["doc_count"]
            for r in via_st2["aggs"]["g"].collect()} == {"a": 2, "b": 1}


def test_interval_aliases_and_decorated_specs(docs, st):
    from siem_on_amazon_opensearch_service_spark.operators.startree import (
        startree_route,
    )

    # "1M" alias must bucket identically to "month" (not NULL-collapse)
    st2 = startree_build(
        docs, [{"date_histogram": {"field": "ts",
                                   "calendar_interval": "1M"}}],
        {"value": ["sum"]})
    rows = {str(r["ts__month"])[:7]: r["doc_count"]
            for r in startree_query(st2, ["ts__month"]).collect()}
    assert rows == {"2024-01": 2, "2024-02": 3, "2024-03": 2}
    with pytest.raises(ValueError, match="calendar_interval"):
        startree_build(docs, [{"date_histogram": {
            "field": "ts", "calendar_interval": "90m"}}], {})
    # decorated range spec (boost next to the field) falls back, never
    # crashes
    assert startree_route(st, {
        "query": {"range": {"ts__month": {"gte": "2024-02-01"},
                            "boost": 2.0}},
        "aggs": {"g": {"terms": {"field": "grp"}}}}) is None
    # routed bucket key column is named after the AGG, like run_aggs
    res = startree_route(st, {"aggs": {"g": {"terms": {"field": "grp"}}}})
    assert "g" in res["g"].columns and "grp" not in res["g"].columns
