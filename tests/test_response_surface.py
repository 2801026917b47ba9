"""Response-surface options: fields / docvalue_fields /
stored_fields, min_score, track_total_hits, terminate_after,
indices_boost.

Wire contracts mirrored (OpenSearch _search request/response options;
the dashboards send `docvalue_fields` + `_source` on every saved
search): `fields`/`docvalue_fields` resolve wildcards and silently
skip unknowns; `stored_fields: "_none_"` returns metadata-only hits;
`track_total_hits: <int>` counts accurately up to the threshold then
reports a `gte` lower bound; `terminate_after` caps doc collection
(hits AND aggs); `indices_boost` multiplies per-index scores before
the coordinator's global page cut."""

import pytest

from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.aliases import (
    AliasRegistry, alias_search,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    search_body,
)

ROWS = [
    (0, "spark spark spark engine", "a", 10.0),
    (1, "spark engine", "a", 20.0),
    (2, "spark join table", "b", 30.0),
    (3, "spark window frame", "b", 40.0),
    (4, "other words entirely", "b", 50.0),
]


@pytest.fixture(scope="module")
def ix(spark):
    docs = spark.createDataFrame(
        ROWS, "doc_id long, text string, grp string, value double")
    return build_index(spark, docs, text_col="text", id_col="doc_id",
                       keep_cols=["grp", "value"])


def _hits(ix, body):
    return search_body(ix, body)["hits"]


def test_fields_with_wildcard_and_dict_form(ix):
    page = _hits(ix, {"query": {"match": {"text": "spark"}},
                      "stored_fields": "_none_",
                      "fields": ["gr*", {"field": "value"},
                                 "no_such_field"],
                      "size": 10})
    assert sorted(page.columns) == ["doc_id", "grp", "score", "value"]
    assert page.count() == 4


def test_docvalue_fields_select(ix):
    page = _hits(ix, {"query": {"match": {"text": "spark"}},
                      "docvalue_fields": [{"field": "value"}],
                      "size": 10})
    assert sorted(page.columns) == ["doc_id", "score", "value"]


def test_stored_fields_none_and_missing_raises(ix):
    page = _hits(ix, {"query": {"match": {"text": "spark"}},
                      "stored_fields": "_none_", "size": 10})
    assert sorted(page.columns) == ["doc_id", "score"]
    with pytest.raises(ValueError, match="not stored"):
        _hits(ix, {"query": {"match": {"text": "spark"}},
                   "stored_fields": ["nope"], "size": 10})


def test_source_false_metadata_only(ix):
    page = _hits(ix, {"query": {"match": {"text": "spark"}},
                      "_source": False, "size": 10})
    assert sorted(page.columns) == ["doc_id", "score"]


def test_source_object_form_includes_excludes(ix):
    page = _hits(ix, {"query": {"match": {"text": "spark"}},
                      "_source": {"includes": ["*"],
                                  "excludes": ["url", "val*"]},
                      "size": 10})
    assert "value" not in page.columns and "url" not in page.columns
    assert "grp" in page.columns and "score" in page.columns
    # string shorthand
    page2 = _hits(ix, {"query": {"match": {"text": "spark"}},
                       "_source": "gr*", "size": 10})
    assert sorted(page2.columns) == ["doc_id", "grp", "score"]


def test_source_list_plus_fields_union(ix):
    page = _hits(ix, {"query": {"match": {"text": "spark"}},
                      "_source": ["grp"], "fields": ["value"],
                      "size": 10})
    assert sorted(page.columns) == ["doc_id", "grp", "score", "value"]


def test_min_score_drops_low_hits(ix):
    full = _hits(ix, {"query": {"match": {"text": "spark"}},
                      "size": 10}).collect()
    scores = sorted((r["score"] for r in full), reverse=True)
    floor = (scores[0] + scores[1]) / 2.0  # keep exactly the best hit
    page = _hits(ix, {"query": {"match": {"text": "spark"}},
                      "min_score": floor, "size": 10}).collect()
    assert [r["score"] for r in page] == [scores[0]]


def test_track_total_hits_exact_and_bounded(ix):
    body = {"query": {"match": {"text": "spark"}}, "size": 1}
    exact = search_body(ix, dict(body, track_total_hits=True))
    assert exact["total"] == {"value": 4, "relation": "eq"}
    under = search_body(ix, dict(body, track_total_hits=2))
    assert under["total"] == {"value": 2, "relation": "gte"}
    over = search_body(ix, dict(body, track_total_hits=100))
    assert over["total"] == {"value": 4, "relation": "eq"}
    off = search_body(ix, dict(body, track_total_hits=False))
    assert "total" not in off


def test_terminate_after_caps_hits_and_aggs(ix):
    body = {"query": {"match": {"text": "spark"}},
            "terminate_after": 2, "size": 10,
            "aggs": {"n": {"value_count": {"field": "doc_id"}}}}
    res = search_body(ix, body)
    assert res["hits"].count() == 2
    assert res["terminated_early"] is True
    [row] = res["aggs"]["_metrics"].collect()
    assert row["n"] == 2
    # cap above the match count: nothing terminated
    res2 = search_body(ix, {"query": {"match": {"text": "spark"}},
                            "terminate_after": 50, "size": 10})
    assert res2["terminated_early"] is False
    assert res2["hits"].count() == 4


@pytest.fixture(scope="module")
def two_ix(spark):
    a = spark.createDataFrame(
        [(0, "spark engine"), (1, "spark join")],
        "doc_id long, text string")
    b = spark.createDataFrame(
        [(10, "spark engine"), (11, "spark window")],
        "doc_id long, text string")
    return (build_index(spark, a, text_col="text", id_col="doc_id"),
            build_index(spark, b, text_col="text", id_col="doc_id"))


def test_indices_boost_reranks_across_indices(two_ix):
    ixa, ixb = two_ix
    reg = AliasRegistry()
    reg.add("logs", ixa, name="logs-a")
    reg.add("logs", ixb, name="logs-b")
    body = {"query": {"match": {"text": "spark"}}, "size": 4}
    plain = alias_search(reg, "logs", body)["hits"].collect()
    by_id = {r["doc_id"]: r["score"] for r in plain}
    boosted = alias_search(reg, "logs", dict(
        body, indices_boost=[{"logs-b": 10.0}]))["hits"].collect()
    # boosted index hits lead the merged ranking, scores scaled 10x
    assert [r["doc_id"] for r in boosted[:2]] == sorted(
        (i for i in by_id if i >= 10),
        key=lambda i: (-by_id[i], i))
    for r in boosted:
        want = by_id[r["doc_id"]] * (10.0 if r["doc_id"] >= 10 else 1.0)
        assert r["score"] == pytest.approx(want, rel=1e-9)


def test_indices_boost_single_index_and_sort_conflict(two_ix):
    ixa, ixb = two_ix
    reg = AliasRegistry()
    reg.add("solo", ixa, name="logs-a")
    body = {"query": {"match": {"text": "spark"}}, "size": 4}
    plain = alias_search(reg, "solo", body)["hits"].collect()
    boosted = alias_search(reg, "solo", dict(
        body, indices_boost=[{"logs-a": 3.0}]))["hits"].collect()
    assert [r["doc_id"] for r in boosted] == [r["doc_id"] for r in plain]
    for p, b in zip(plain, boosted):
        assert b["score"] == pytest.approx(3.0 * p["score"], rel=1e-9)
    reg.add("both", ixa, name="logs-a")
    reg.add("both", ixb, name="logs-b")
    with pytest.raises(ValueError, match="custom sort"):
        alias_search(reg, "both", dict(
            body, indices_boost=[{"logs-a": 2.0}],
            sort=[{"doc_id": {"order": "asc"}}]))


def test_source_true_returns_full_source(ix):
    page = _hits(ix, {"query": {"match": {"text": "spark"}},
                      "_source": True, "size": 10})
    assert {"grp", "value", "doc_id", "score"} <= set(page.columns)


def test_min_score_applies_to_total_and_aggs(ix):
    full = _hits(ix, {"query": {"match": {"text": "spark"}},
                      "size": 10}).collect()
    scores = sorted((r["score"] for r in full), reverse=True)
    floor = (scores[0] + scores[1]) / 2.0
    res = search_body(ix, {"query": {"match": {"text": "spark"}},
                           "min_score": floor,
                           "track_total_hits": True, "size": 10,
                           "aggs": {"n": {"value_count":
                                          {"field": "doc_id"}}}})
    assert res["total"] == {"value": 1, "relation": "eq"}
    assert res["aggs"]["_metrics"].collect()[0]["n"] == 1


def test_terminate_after_hits_and_aggs_share_one_collection(ix):
    res = search_body(ix, {"query": {"match": {"text": "spark"}},
                           "terminate_after": 2, "size": 10,
                           "aggs": {"vals": {"sum": {"field": "value"}}}})
    hit_ids = {r["doc_id"] for r in res["hits"].collect()}
    [m] = res["aggs"]["_metrics"].collect()
    by_id = {0: 10.0, 1: 20.0, 2: 30.0, 3: 40.0}
    assert m["doc_count"] == 2
    assert m["vals"] == pytest.approx(sum(by_id[i] for i in hit_ids))


def test_explain_true_attaches_per_term_breakdown(ix):
    res = search_body(ix, {"query": {"match": {"text": "spark engine"}},
                           "explain": True, "size": 3})
    rows = res["hits"].collect()
    assert rows and all("_explanation" in r.asDict() for r in rows)
    for r in rows:
        exp = r["_explanation"] or {}
        assert set(exp) <= {"spark", "engine"}
        assert sum(exp.values()) == pytest.approx(r["score"], rel=1e-9)
    with pytest.raises(ValueError, match="explain"):
        search_body(ix, {"query": {"term": {"grp": "a"}},
                         "explain": True, "size": 3})
