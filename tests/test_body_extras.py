"""Body-surface extras: _geo_distance sort, top_metrics, profile,
_field_caps."""

import math

import pytest

from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.mappings import (
    field_caps,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    run_aggs, search_body,
)

ROWS = [
    (0, "spark stream", 35.68, 139.69, "a", 10.0, 3.0),   # Tokyo
    (1, "spark table", 34.69, 135.50, "a", 20.0, 1.0),    # Osaka
    (2, "spark join", 51.51, -0.13, "b", 30.0, 2.0),      # London
    (3, "spark window", 40.71, -74.01, "b", 40.0, 2.0),   # NYC
    (4, "other words", 48.86, 2.35, "b", 50.0, 9.0),      # Paris
]


@pytest.fixture(scope="module")
def ix(spark):
    docs = spark.createDataFrame(
        [(i, t, {"lat": la, "lon": lo}, g, v, s)
         for i, t, la, lo, g, v, s in ROWS],
        "doc_id long, text string, "
        "loc struct<lat:double,lon:double>, grp string, "
        "value double, sortkey double")
    return build_index(spark, docs, text_col="text", id_col="doc_id",
                       keep_cols=["loc", "grp", "value", "sortkey"])


def _hav_km(lat, lon, clat, clon):
    p = math.radians
    return 2 * 6371.0 * math.asin(math.sqrt(
        math.sin(p(lat - clat) / 2) ** 2
        + math.cos(p(clat)) * math.cos(p(lat))
        * math.sin(p(lon - clon) / 2) ** 2))


def test_geo_distance_sort_matches_python(ix):
    body = {"query": {"match": {"text": "spark"}},
            "sort": [{"_geo_distance": {
                "loc": {"lat": 35.68, "lon": 139.69},
                "order": "asc", "unit": "km"}}],
            "size": 10}
    got = [r.doc_id for r in search_body(ix, body)["hits"].collect()]
    exp = sorted(
        (i for i, t, *_ in ROWS if "spark" in t),
        key=lambda i: (_hav_km(ROWS[i][2], ROWS[i][3], 35.68, 139.69), i))
    assert got == list(exp)
    # GeoJSON [lon, lat] array form and desc order
    body["sort"] = [{"_geo_distance": {
        "loc": [139.69, 35.68], "order": "desc", "unit": "mi"}}]
    got2 = [r.doc_id for r in search_body(ix, body)["hits"].collect()]
    assert got2 == list(reversed(exp))
    with pytest.raises(ValueError):
        search_body(ix, {"query": {"match_all": {}},
                         "sort": [{"_geo_distance": {
                             "loc": [0, 0], "unit": "parsec"}}]})


def test_top_metrics_per_bucket(ix):
    spec = {"by_grp": {"terms": {"field": "grp"}, "aggs": {
        "tm": {"top_metrics": {"metrics": [{"field": "value"}],
                               "sort": {"sortkey": "desc"}}}}}}
    out = run_aggs(ix.docs, spec, "text")["by_grp"].collect()
    got = {r["by_grp"]: (r["tm_value"], r["tm_sort"]) for r in out}
    # grp a: max sortkey 3.0 -> value 10; grp b: sortkey tie 2.0 at
    # docs 2/3 loses to doc 4 (9.0) -> value 50
    assert got["a"] == (10.0, 3.0) and got["b"] == (50.0, 9.0)

    asc = {"by_grp": {"terms": {"field": "grp"}, "aggs": {
        "tm": {"top_metrics": {"metrics": [{"field": "value"}],
                               "sort": {"sortkey": "asc"}}}}}}
    out2 = run_aggs(ix.docs, asc, "text")["by_grp"].collect()
    got2 = {r["by_grp"]: r["tm_value"] for r in out2}
    # grp b sortkey tie 2.0 (docs 2 and 3): doc_id asc tie-break -> 30
    assert got2["a"] == 20.0 and got2["b"] == 30.0

    with pytest.raises(ValueError):
        run_aggs(ix.docs, {"x": {"top_metrics": {
            "metrics": [{"field": "value"}],
            "sort": {"sortkey": "desc"}, "size": 2}}}, "text")


def test_profile_returns_physical_plan(ix):
    res = search_body(ix, {"query": {"match": {"text": "spark"}},
                           "profile": True, "size": 3})
    assert "TakeOrderedAndProject" in res["profile"] or \
           "Exchange" in res["profile"]
    assert "hits" in res


def test_field_caps(spark):
    df = spark.createDataFrame(
        [], "doc_id long, text string, url string, ts timestamp, "
            "n int, ok boolean, emb array<float>, "
            "feats map<string,double>, tags array<string>, "
            "nested struct<a:int>")
    caps = field_caps(df, text_fields=("text",))
    assert caps["text"] == {"type": "text", "searchable": True,
                            "aggregatable": False}
    assert caps["url"]["type"] == "keyword" and caps["url"]["aggregatable"]
    assert caps["ts"]["type"] == "date"
    assert caps["n"]["type"] == "integer"
    assert caps["ok"]["type"] == "boolean"
    assert caps["emb"]["type"] == "knn_vector"
    assert caps["feats"]["type"] == "rank_features"
    assert caps["tags"] == {"type": "keyword", "searchable": True,
                            "aggregatable": True}
    assert caps["nested"]["type"] == "object"
    assert caps["doc_id"]["type"] == "long"
