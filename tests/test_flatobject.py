"""flat_object field type: arbitrary JSON searchable by root or
dotted leaf path, no mapping explosion.

Reference semantics: es_loader flattens free-form nested event dicts
into dotted keys (reference siem/utils.py:445-470); OpenSearch's
``flat_object`` mapping is the index-side type for exactly that
payload shape.  Spark dual: one ``map<string,array<string>>`` column
(``index/flatobject.py``), queried through the shared FieldLeaf
compiler (``querystring.flat_field_pred``).
"""

import json

import pytest

from siem_on_amazon_opensearch_service_spark.index import (
    build_index,
    flatten_json,
)
from siem_on_amazon_opensearch_service_spark.index.flatobject import (
    flatten_py,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    run_aggs,
    search_body,
)

DOCS = [
    (0, "alpha issue", {"labels": {"env": "prod", "team": "sec"},
                        "issue": {"number": 3214, "open": True}}),
    (1, "beta issue", {"labels": {"env": "dev"},
                       "issue": {"number": 999}}),
    (2, "gamma issue", {"labels": {"env": ["prod", "staging"]},
                        "tags": ["urgent", "net"]}),
    (3, "delta issue", {"nested": [{"k": "a"}, {"k": "b"}]}),
    (4, "epsilon issue", None),  # NULL payload: no flat query matches
]


# ---------------------------------------------------------------------------
# pure-python flattener contract
# ---------------------------------------------------------------------------


def test_flatten_py_shapes():
    flat = flatten_py({"a": {"b": 1, "c": [2, 3]},
                       "d": [{"e": "x"}, {"e": "y"}],
                       "f": True, "g": None, "h": 2.5})
    assert flat == {"a.b": ["1"], "a.c": ["2", "3"],
                    "d.e": ["x", "y"], "f": ["true"], "h": ["2.5"]}
    assert flatten_py({}) == {}


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ix(spark):
    raw = spark.createDataFrame(
        [(i, t, json.dumps(a) if a is not None else None)
         for i, t, a in DOCS],
        "doc_id long, text string, raw string")
    docs = flatten_json(raw, "raw", "attrs").drop("raw")
    return build_index(spark, docs, text_col="text", id_col="doc_id",
                       keep_cols=["attrs"])


def _ids(ix, query):
    hits = search_body(ix, {"query": query, "size": 10})["hits"]
    return sorted(r.doc_id for r in hits.collect())


def test_flatten_json_column(ix):
    got = {r.doc_id: r.attrs for r in ix.docs.collect()}
    assert got[0]["labels.env"] == ["prod"]
    assert got[2]["labels.env"] == ["prod", "staging"]
    assert got[3]["nested.k"] == ["a", "b"]
    assert got[4] is None


def test_leaf_term_and_multivalue(ix):
    assert _ids(ix, {"term": {"attrs.labels.env": "prod"}}) == [0, 2]
    assert _ids(ix, {"term": {"attrs.labels.env": "staging"}}) == [2]
    assert _ids(ix, {"term": {"attrs.issue.open": "true"}}) == [0]


def test_root_search_any_leaf(ix):
    # root name matches the value anywhere in the subtree
    assert _ids(ix, {"term": {"attrs": "urgent"}}) == [2]
    assert _ids(ix, {"term": {"attrs": "prod"}}) == [0, 2]
    assert _ids(ix, {"term": {"attrs": "nope"}}) == []


def test_exists_and_wildcard_and_terms(ix):
    assert _ids(ix, {"exists": {"field": "attrs.issue.number"}}) \
        == [0, 1]
    assert _ids(ix, {"exists": {"field": "attrs"}}) == [0, 1, 2, 3]
    assert _ids(ix, {"wildcard": {"attrs.issue.number": "3*"}}) == [0]
    assert _ids(ix, {"terms": {"attrs.labels.team": ["sec", "ops"]}}) \
        == [0]


def test_range_numeric_dialect(ix):
    # numeric bounds compare numerically (engine dialect; upstream
    # flat_object would compare "999" > "3214" lexically)
    got = _ids(ix, {"range": {"attrs.issue.number": {"gte": 1000}}})
    assert got == [0]


def test_null_map_passes_must_not(ix):
    body = {"query": {"bool": {
        "must": [{"match": {"text": "issue"}}],
        "must_not": [{"term": {"attrs.labels.env": "prod"}}],
    }}, "size": 10}
    got = sorted(r.doc_id for r in
                 search_body(ix, body)["hits"].collect())
    assert got == [1, 3, 4]


def test_flat_in_filters_agg(ix):
    aggs = {"envs": {"filters": {"filters": {
        "prod": {"term": {"attrs.labels.env": "prod"}},
        "has_issue": {"exists": {"field": "attrs.issue.number"}},
    }}}}
    rows = {r["envs"]: r["doc_count"]
            for r in run_aggs(ix.docs, aggs)["envs"].collect()}
    assert rows == {"prod": 2, "has_issue": 2}


def test_query_string_and_kql_route_flat(ix):
    from siem_on_amazon_opensearch_service_spark.index.kql import (
        parse_kql,
    )

    assert _ids(ix, {"query_string": {
        "query": "attrs.labels.env:prod"}}) == [0, 2]
    assert _ids(ix, parse_kql("attrs.labels.env:prod")) == [0, 2]


def test_malformed_json_yields_null(spark):
    raw = spark.createDataFrame(
        [(0, "{not json"), (1, "[1,2]"), (2, '{"a": 1}')],
        "doc_id long, raw string")
    got = {r.doc_id: r.attrs
           for r in flatten_json(raw, "raw", "attrs").collect()}
    assert got[0] is None and got[1] is None
    assert got[2] == {"a": ["1"]}


def test_unsupported_op_on_flat_field_raises(ix):
    with pytest.raises(ValueError, match="flat_object"):
        search_body(ix, {"query": {"terms_set": {"attrs.labels.env": {
            "terms": ["prod"],
            "minimum_should_match_field": "doclen"}}},
            "size": 5})["hits"].collect()
