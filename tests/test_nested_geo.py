"""Nested-field (block-join analog) and geo family tests."""

import duckdb
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators.geo import (
    geo_bounds_centroid, geohash, geohash_sql, haversine_km,
    in_bounding_box)
from siem_on_amazon_opensearch_service_spark.operators.nested_docs import (
    inner_hits, nest_children, nested_count, nested_match, object_match)


@pytest.fixture(scope="module")
def flat(spark):
    # parent 1: error>180 in ONE element; parent 2: error and >180 only
    # across DIFFERENT elements; parent 3: no error at all.
    rows = [
        (1, 10, "error", 190.0),
        (1, 11, "view", 10.0),
        (2, 20, "error", 50.0),
        (2, 21, "view", 200.0),
        (3, 30, "view", 300.0),
        (1, 12, "error", 195.0),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double"
    )


def test_nested_vs_object_semantics(flat):
    nested = nest_children(flat, ["user_id"],
                           ["event_id", "event_type", "value"])
    pred = lambda e: (e.event_type == "error") & (e.value > 180)  # noqa: E731
    strict = sorted(r.user_id for r in nested_match(
        nested, "children", pred).collect())
    # object (flattened) semantics: each clause may match a different child
    loose = sorted(r.user_id for r in object_match(
        nested, "children",
        [lambda e: e.event_type == "error", lambda e: e.value > 180],
    ).collect())
    assert strict == [1]          # only user 1 has ONE element with both
    assert loose == [1, 2]        # user 2 is the cross-element false positive


def test_nested_count_and_inner_hits(flat):
    nested = nest_children(flat, ["user_id"],
                           ["event_id", "event_type", "value"])
    pred = lambda e: (e.event_type == "error") & (e.value > 180)  # noqa: E731
    counts = {r.user_id: r.n_matched_children
              for r in nested_count(nested, "children", pred).collect()}
    assert counts == {1: 2, 2: 0, 3: 0}

    cmp = lambda a, b: F.when(a.value > b.value, -1).when(  # noqa: E731
        a.value < b.value, 1).otherwise(
        F.when(a.event_id < b.event_id, -1).when(
            a.event_id > b.event_id, 1).otherwise(0))
    hits = inner_hits(nested, "children", pred, cmp, size=1).collect()
    assert len(hits) == 1 and hits[0].user_id == 1
    assert hits[0].hits[0].event_id == 12  # value 195 beats 190


def test_nested_match_is_join_free(flat):
    import io
    from contextlib import redirect_stdout

    nested = nest_children(flat, ["user_id"],
                           ["event_id", "event_type", "value"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        nested_match(
            nested, "children", lambda e: e.event_type == "error"
        ).explain("formatted")
    assert "Join" not in buf.getvalue()  # the array IS the block join


def test_geohash_matches_duckdb_and_spark(spark):
    df = spark.createDataFrame(
        [(37.7749, -122.4194), (-33.8688, 151.2093), (51.5072, -0.1276),
         (90.0, 180.0), (-90.0, -180.0), (0.0, 0.0)],
        "lat double, lon double",
    )
    got = [r.gh for r in df.select(
        geohash("lat", "lon", 5).alias("gh")).collect()]
    duck = duckdb.connect()
    want = [duck.sql(
        "SELECT " + geohash_sql(f"CAST({lat} AS DOUBLE)",
                                f"CAST({lon} AS DOUBLE)", 5)
    ).fetchone()[0] for lat, lon in
        [(37.7749, -122.4194), (-33.8688, 151.2093), (51.5072, -0.1276),
         (90.0, 180.0), (-90.0, -180.0), (0.0, 0.0)]]
    assert got == want
    assert got[0] == "9q8yy"  # San Francisco, public known value
    assert got[1] == "r3gx2"  # Sydney
    assert got[2] == "gcpvj"  # London


def test_bbox_bounds_centroid(spark):
    df = spark.createDataFrame(
        [(10.0, 10.0), (20.0, 20.0), (30.0, 30.0), (-50.0, 170.0)],
        "lat double, lon double",
    )
    inside = df.filter(
        in_bounding_box(F.col("lat"), F.col("lon"),
                        top=25.0, left=5.0, bottom=5.0, right=25.0))
    assert inside.count() == 2
    row = geo_bounds_centroid(df, F.col("lat"), F.col("lon")).collect()[0]
    assert (row.top, row.bottom, row.left, row.right) == (30.0, -50.0,
                                                          10.0, 170.0)
    assert abs(row.centroid_lat - 2.5) < 1e-9 and row.n == 4


def test_haversine_known_distance(spark):
    # SF -> LA great-circle distance ~559 km (public figure)
    df = spark.createDataFrame([(34.0522, -118.2437)], "lat double, lon double")
    d = df.select(haversine_km(
        F.col("lat"), F.col("lon"), 37.7749, -122.4194).alias("d")
    ).collect()[0].d
    assert 550 < d < 570


def test_reverse_nested_terms(flat):
    from siem_on_amazon_opensearch_service_spark.operators.nested_docs import (
        reverse_nested_terms)

    nested = nest_children(flat, ["user_id"],
                           ["event_id", "event_type", "value"])
    got = {
        r["child_value"]: (r["doc_count"], r["reverse_doc_count"])
        for r in reverse_nested_terms(
            nested, "children", "event_type", ["user_id"]).collect()
    }
    # 'error': 3 child elements but only 2 distinct parents (user 1
    # has two error children) — the overcount reverse_nested fixes
    assert got["error"] == (3, 2)
    assert got["view"] == (3, 3)


def test_new_agg_operators_small(spark):
    from siem_on_amazon_opensearch_service_spark.operators.aggs import (
        boxplot, global_and_query, missing_count, multi_terms,
        weighted_avg, welch_t_test)

    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 1.0),
         ("b", None, 1.0)],
        "k string, v double, w double")
    wa = {r["k"]: r["weighted_avg"]
          for r in weighted_avg(df, F.col("v"), F.col("w"), ["k"]).collect()}
    assert wa["a"] == (1.0 * 1 + 3.0 * 3) / 4.0 and wa["b"] == 10.0
    assert missing_count(df, F.col("v")).first()["missing_count"] == 1
    g = {r["scope"]: r["doc_count"]
         for r in global_and_query(df, F.col("k") == "a",
                                   F.col("v")).collect()}
    assert g == {"all": 4, "query": 2}
    mt = multi_terms(df, ["k"], size=1).first()
    assert mt["k"] in ("a", "b") and mt["doc_count"] == 2
    bp = {r["k"]: r for r in boxplot(df, F.col("v"), ["k"]).collect()}
    assert bp["a"]["q2"] == 2.0  # exact interpolated median of {1,3}
    t = welch_t_test(
        spark.createDataFrame(
            [("x", 1.0), ("x", 2.0), ("x", 3.0),
             ("y", 11.0), ("y", 12.0), ("y", 13.0)], "k string, v double"),
        F.col("v"), F.col("k") == "x", F.col("k") == "y").first()
    # means 2 vs 12, var 1 each, n 3 each -> t = -10 / sqrt(2/3)
    assert abs(t["t_stat"] - (-10.0 / (2.0 / 3.0) ** 0.5)) < 1e-9
