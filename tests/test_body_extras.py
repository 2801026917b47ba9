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


# ---------------------------------------------------------------------------
# new bucket kinds: filter / global / missing, multi_terms,
# date_range / ip_range, rare_terms
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ev_ix(spark):
    rows = [
        (0, "spark alpha", "2024-01-01 00:10:00", "10.0.0.1", "a", 1.0),
        (1, "spark beta", "2024-01-02 05:00:00", "10.0.0.200", "a", 2.0),
        (2, "spark gamma", "2024-02-01 00:00:00", "10.0.1.5", "b", 3.0),
        (3, "spark delta", "2024-02-15 12:00:00", "192.168.1.9", None, 4.0),
        (4, "other words", "2024-03-01 00:00:00", "10.0.0.7", "c", 5.0),
        (5, "spark omega", "2024-03-02 00:00:00", "10.0.0.8", "a", 6.0),
    ]
    docs = spark.createDataFrame(
        [(i, t, ts, ip, g, v) for i, t, ts, ip, g, v in rows],
        "doc_id long, text string, ts_s string, ip string, "
        "grp string, value double").selectExpr(
            "doc_id", "text", "cast(ts_s as timestamp) as ts",
            "ip", "grp", "value")
    from siem_on_amazon_opensearch_service_spark.index import build_index
    return build_index(spark, docs, text_col="text", id_col="doc_id",
                       keep_cols=["ts", "ip", "grp", "value"])


def test_filter_missing_global_buckets(ev_ix):
    res = search_body(ev_ix, {
        "query": {"match": {"text": "spark"}},
        "aggs": {
            "grp_a": {"filter": {"term": {"grp": "a"}},
                      "aggs": {"v": {"sum": {"field": "value"}}}},
            "no_grp": {"missing": {"field": "grp"}},
            "all": {"global": {},
                    "aggs": {"n": {"value_count": {"field": "doc_id"}}}},
        }})
    # matched set = spark docs {0,1,2,3,5}; grp a among them = {0,1,5}
    fa = res["aggs"]["grp_a"].collect()[0]
    assert fa.doc_count == 3 and fa.v == 9.0
    assert res["aggs"]["no_grp"].collect()[0].doc_count == 1  # doc 3
    # global escapes the query: all 6 docs
    ga = res["aggs"]["all"].collect()[0]
    assert ga.doc_count == 6 and ga.n == 6
    with pytest.raises(ValueError):
        run_aggs(ev_ix.docs, {"t": {"terms": {"field": "grp"}, "aggs": {
            "f": {"filter": {"term": {"grp": "a"}}}}}}, "text")


def test_multi_terms_bucket(ev_ix):
    out = run_aggs(ev_ix.docs, {"mt": {"multi_terms": {
        "terms": [{"field": "grp"}, {"field": "value"}],
        "size": 10}}}, "text")["mt"].collect()
    got = {r.mt: r.doc_count for r in out}
    # doc 3 has null grp -> dropped (upstream multi_terms semantics)
    assert got == {"a|1.0": 1, "a|2.0": 1, "a|6.0": 1,
                   "b|3.0": 1, "c|5.0": 1}


def test_date_range_and_ip_range_buckets(ev_ix):
    out = run_aggs(ev_ix.docs, {"dr": {"date_range": {
        "field": "ts", "ranges": [
            {"key": "jan", "from": "2024-01-01", "to": "2024-02-01"},
            {"key": "feb_on", "from": "2024-02-01"},
            {"key": "all", "to": "2025-01-01"},
        ]}}}, "text")["dr"].collect()
    got = {r.dr: r.doc_count for r in out}
    assert got == {"jan": 2, "feb_on": 4, "all": 6}

    out2 = run_aggs(ev_ix.docs, {"ipr": {"ip_range": {
        "field": "ip", "ranges": [
            {"key": "low", "from": "10.0.0.0", "to": "10.0.0.100"},
            {"mask": "10.0.0.0/24"},
            {"key": "private192", "from": "192.168.0.0",
             "to": "192.169.0.0"},
        ]}}}, "text")["ipr"].collect()
    got2 = {r.ipr: r.doc_count for r in out2}
    # 10.0.0.x: .1 .200 .7 .8 ; 10.0.1.5 outside /24; one 192.168.
    assert got2 == {"low": 3, "10.0.0.0/24": 4, "private192": 1}


def test_rare_terms_bucket(ev_ix):
    out = run_aggs(ev_ix.docs, {"rare": {"rare_terms": {
        "field": "grp", "max_doc_count": 1}}}, "text")["rare"].collect()
    assert [(r.key, r.n) for r in out] == [("b", 1), ("c", 1)]


def test_suggest_block_in_body(spark, ev_ix):
    from siem_on_amazon_opensearch_service_spark.index.boolquery import (
        completion_suggest, term_suggest,
    )

    body = {"query": {"match": {"text": "spark"}}, "size": 2,
            "suggest": {
                "fix": {"text": "spakr", "term": {"size": 3}},
                "auto": {"prefix": "al", "completion": {"size": 3}},
            }}
    res = search_body(ev_ix, body)
    assert res["hits"].count() == 2
    got_fix = res["suggest"]["fix"].collect()
    twin_fix = term_suggest(ev_ix, "spakr", size=3).collect()
    assert got_fix == twin_fix and got_fix  # 'spark' suggested
    got_auto = [r[0] for r in res["suggest"]["auto"].collect()]
    assert got_auto == [r[0] for r in
                        completion_suggest(ev_ix, "al", size=3).collect()]
    assert "alpha" in got_auto
    with pytest.raises(ValueError):
        search_body(ev_ix, {"suggest": {"x": {"text": "a",
                                              "phrase": {}}}})
    with pytest.raises(ValueError):
        search_body(ev_ix, {"suggest": {"x": {"text": "a",
                                              "banana": {}}}})


def test_knn_body_ivf_method(spark, tmp_path, ev_ix):
    import numpy as np

    from siem_on_amazon_opensearch_service_spark.operators.similarity import (
        cosine_topk, ivf_save,
    )

    rng = np.random.RandomState(5)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(8)]) for i in range(40)],
        "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(c, [float(x) for x in rng.randn(8)]) for c in range(4)],
        "cent_id long, cent_vec array<double>")
    path = str(tmp_path / "ivf")
    ivf_save(vecs, cents, path)
    qv = [float(x) for x in rng.randn(8)]
    body = {"query": {"knn": {"embedding": {
        "vector": qv, "k": 5,
        "method": {"name": "ivf", "path": path, "centroids": cents,
                   "nprobe": 4}}}}, "size": 5}
    # nprobe == n_cells probes everything -> exact; vecs NOT passed
    exp = [r.vec_id for r in cosine_topk(vecs, qv, k=5).collect()]
    hits = search_body(ev_ix, body)["hits"].select("doc_id").collect()
    assert [r.doc_id for r in hits] == exp


def test_terms_include_exclude_partition(ev_ix):
    base = {"field": "grp"}
    # regex include: whole-key match (Lucene semantics)
    out = run_aggs(ev_ix.docs, {"t": {"terms": {**base,
        "include": "a|b"}}}, "text")["t"].collect()
    assert {r.t for r in out} == {"a", "b"}
    # list include / exclude
    out = run_aggs(ev_ix.docs, {"t": {"terms": {**base,
        "include": ["a", "c"], "exclude": ["c"]}}}, "text")["t"].collect()
    assert {r.t for r in out} == {"a"}
    # regex exclude
    out = run_aggs(ev_ix.docs, {"t": {"terms": {**base,
        "exclude": "a"}}}, "text")["t"].collect()
    assert {r.t for r in out} == {"b", "c"}
    # partitioned paging: the partitions tile the keyset disjointly
    seen = []
    for p in range(3):
        out = run_aggs(ev_ix.docs, {"t": {"terms": {**base,
            "include": {"partition": p, "num_partitions": 3}}}},
            "text")["t"].collect()
        seen.extend(r.t for r in out)
    assert sorted(seen) == ["a", "b", "c"]


def test_sampler_buckets_in_body(ev_ix):
    res = search_body(ev_ix, {
        "query": {"match": {"text": "spark"}},
        "aggs": {"samp": {"sampler": {"shard_size": 3}, "aggs": {
            "g": {"terms": {"field": "grp"}}}}}})
    assert res["aggs"]["samp"].collect()[0].doc_count == 3
    total = sum(r.doc_count for r in res["aggs"]["samp>g"].collect())
    assert total <= 3
    # diversified: at most 1 doc per grp before the cut
    res2 = search_body(ev_ix, {
        "query": {"match": {"text": "spark"}},
        "aggs": {"d": {"diversified_sampler": {
            "field": "grp", "shard_size": 10,
            "max_docs_per_value": 1}, "aggs": {
            "g": {"terms": {"field": "grp"}}}}}})
    counts = {r.g: r.doc_count for r in res2["aggs"]["d>g"].collect()}
    assert all(c == 1 for c in counts.values())


def test_median_absolute_deviation_metric(ev_ix):
    import statistics

    def mad(xs):
        m = statistics.median(xs)
        return statistics.median(abs(x - m) for x in xs)

    # matched docs (text: spark) grouped by grp; doc 3 has grp=None
    vals = {"a": [1.0, 2.0, 6.0], "b": [3.0]}
    res = search_body(ev_ix, {
        "query": {"match": {"text": "spark"}},
        "aggs": {"g": {"terms": {"field": "grp"},
                       "aggs": {"m": {"median_absolute_deviation":
                                      {"field": "value"}}}},
                 "overall": {"median_absolute_deviation":
                             {"field": "value"}}}})
    got = {r["g"]: r["m"] for r in res["aggs"]["g"].collect()}
    assert got == {k: pytest.approx(mad(v)) for k, v in vals.items()}
    [row] = res["aggs"]["_metrics"].collect()
    assert row["overall"] == pytest.approx(
        mad([1.0, 2.0, 3.0, 4.0, 6.0]))
