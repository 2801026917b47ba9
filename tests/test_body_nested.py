"""Search-body surface for the ``nested`` field type and the
join-field ``parent_id`` lookup.

Reference semantics: the index template maps 15 fields as ``nested``
(deploy_es/data.ini:280 ``threat.enrichments`` etc., written by the
IOC enrichment join es_loader/siem/ioc.py:259-284); a nested query
matches a parent only when a SINGLE element satisfies ALL inner
clauses, the nested aggregation switches the bucket context to
elements, and reverse_nested switches back to parents.
"""

import pytest

from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    search_body,
)

# doc 0: ip/0.9 + domain/0.2  -> strict match for (typ=ip AND conf>=.5)
# doc 1: ip/0.2 + domain/0.9  -> object-semantics trap: clauses match
#                                DIFFERENT elements; nested must reject
# doc 2: ip/0.8 + ip/0.6      -> two matching elements (score_mode sum)
# doc 3: no enrichments (empty array)
# doc 4: NULL threat struct
ROWS = [
    (0, "alpha spark", [("i0", "ip", 0.9), ("i1", "domain", 0.2)],
     "answer", "0"),
    (1, "beta spark", [("i2", "ip", 0.2), ("i3", "domain", 0.9)],
     "answer", "0"),
    (2, "gamma spark", [("i4", "ip", 0.8), ("i5", "ip", 0.6)],
     "question", None),
    (3, "delta spark", [], "question", None),
    (4, "epsilon spark", None, "answer", "2"),
]

_SCHEMA = (
    "doc_id long, text string, "
    "threat struct<enrichments:array<struct<"
    "ind:string,typ:string,conf:double>>>, "
    "join_name string, join_parent string"
)


@pytest.fixture(scope="module")
def ix(spark):
    docs = spark.createDataFrame(
        [(i, t, {"enrichments": e} if e is not None else None, jn, jp)
         for i, t, e, jn, jp in ROWS], _SCHEMA)
    return build_index(spark, docs, text_col="text", id_col="doc_id",
                       keep_cols=["threat", "join_name", "join_parent"])


_NESTED_Q = {"nested": {
    "path": "threat.enrichments",
    "query": {"bool": {"must": [
        {"term": {"threat.enrichments.typ": "ip"}},
        {"range": {"threat.enrichments.conf": {"gte": 0.5}}},
    ]}}}}


def test_nested_single_element_semantics(ix):
    got = sorted(r.doc_id for r in
                 search_body(ix, {"query": _NESTED_Q, "size": 10})
                 ["hits"].collect())
    # doc 1 has typ=ip (elem 0) and conf>=.5 (elem 1) but no single
    # element with both -- the flattened/object mapping would match it
    assert got == [0, 2]


def test_nested_composes_inside_bool(ix):
    body = {"query": {"bool": {
        "must": [{"match": {"text": "spark"}}],
        "filter": [_NESTED_Q],
        "must_not": [{"term": {"join_name": "question"}}],
    }}, "size": 10}
    got = sorted(r.doc_id for r in
                 search_body(ix, body)["hits"].collect())
    assert got == [0]


def test_nested_score_mode_sum_and_inner_hits(ix):
    q = {"nested": dict(_NESTED_Q["nested"], score_mode="sum",
                        inner_hits={"name": "enr_hits", "size": 5})}
    rows = {r.doc_id: r for r in
            search_body(ix, {"query": q, "size": 10})
            ["hits"].collect()}
    assert set(rows) == {0, 2}
    assert rows[2].score == pytest.approx(2.0)   # two matching elems
    assert rows[0].score == pytest.approx(1.0)
    assert [e.ind for e in rows[2].enr_hits] == ["i4", "i5"]
    assert [e.ind for e in rows[0].enr_hits] == ["i0"]
    # the inner_hits column survives _source projection
    cols = search_body(ix, {"query": q, "_source": ["join_name"],
                            "size": 10})["hits"].columns
    assert "enr_hits" in cols and "join_name" in cols


def test_nested_ignore_unmapped(ix):
    q = {"nested": {"path": "nope", "query": {"match_all": {}},
                    "ignore_unmapped": True}}
    assert search_body(ix, {"query": q})["hits"].count() == 0
    with pytest.raises(ValueError, match="not mapped"):
        search_body(ix, {"query": {"nested": {
            "path": "nope", "query": {"match_all": {}}}}})


def test_parent_id_query(ix):
    body = {"query": {"parent_id": {"type": "answer", "id": "0"}},
            "size": 10}
    got = sorted(r.doc_id for r in
                 search_body(ix, body)["hits"].collect())
    assert got == [0, 1]


def test_nested_agg_and_reverse_nested(ix):
    body = {"query": {"match_all": {}}, "size": 0, "aggs": {
        "enr": {"nested": {"path": "threat.enrichments"}, "aggs": {
            "types": {"terms": {"field": "threat.enrichments.typ"},
                      "aggs": {"parents": {"reverse_nested": {}}}},
        }},
    }}
    res = search_body(ix, body)["aggs"]
    # element-context doc_count: total elements across the corpus
    top = res["enr"].collect()[0]
    n_elems = sum(len(e) for _, _, e, _, _ in ROWS if e)
    assert top.doc_count == n_elems
    by_typ = {r.types: r for r in res["enr>types"].collect()}
    # elements per typ vs python
    exp_elem = {}
    exp_parents = {}
    for i, _, e, _, _ in ROWS:
        for _, typ, _c in (e or []):
            exp_elem[typ] = exp_elem.get(typ, 0) + 1
            exp_parents.setdefault(typ, set()).add(i)
    assert {k: v.doc_count for k, v in by_typ.items()} == exp_elem
    assert {k: v.parents_doc_count for k, v in by_typ.items()} == {
        k: len(v) for k, v in exp_parents.items()}


def test_nested_sort_modes(ix):
    # sum of ip-element conf per doc: d0=.9, d1=.2, d2=1.4 (desc)
    body = {"query": {"ids": {"values": [0, 1, 2]}},
            "sort": [{"threat.enrichments.conf": {
                "order": "desc", "mode": "sum",
                "nested": {"path": "threat.enrichments",
                           "filter": {"term": {
                               "threat.enrichments.typ": "ip"}}}}}],
            "size": 10}
    got = [r.doc_id for r in search_body(ix, body)["hits"].collect()]
    assert got == [2, 0, 1]
    # median over ALL elements (no filter): d0=.55, d1=.55, d2=.7 asc
    body = {"query": {"ids": {"values": [0, 1, 2]}},
            "sort": [{"threat.enrichments.conf": {
                "order": "asc", "mode": "median",
                "nested": {"path": "threat.enrichments"}}}],
            "size": 10}
    got = [r.doc_id for r in search_body(ix, body)["hits"].collect()]
    assert got == [0, 1, 2]   # .55 tie broken by doc_id asc


def test_children_and_parent_aggs(ix):
    # matched parents {2,3}: children of type "answer" -> doc 4 only
    body = {"query": {"ids": {"values": [2, 3]}}, "size": 0,
            "aggs": {"kids": {"children": {"type": "answer"}}}}
    res = search_body(ix, body)["aggs"]
    assert res["kids"].collect()[0].doc_count == 1
    # matched children {0,1,4} reference parents {"0","2"}; of those
    # only doc 2 has join_name == "question"
    body = {"query": {"ids": {"values": [0, 1, 4]}}, "size": 0,
            "aggs": {"par": {"parent": {"parent_type": "question"},
                             "aggs": {"n": {"value_count": {
                                 "field": "doc_id"}}}}}}
    res = search_body(ix, body)["aggs"]
    row = res["par"].collect()[0]
    assert row.doc_count == 1 and row.n == 1


def test_kql_nested_group(ix):
    from siem_on_amazon_opensearch_service_spark.index.kql import (
        parse_kql,
    )

    q = parse_kql("threat.enrichments:{ typ:ip and conf >= 0.5 }")
    assert "nested" in q and q["nested"]["path"] == "threat.enrichments"
    got = sorted(r.doc_id for r in
                 search_body(ix, {"query": q, "size": 10})
                 ["hits"].collect())
    assert got == [0, 2]   # block-join semantics, not flattened AND
    # or-mode group with wildcard + comparison inside the braces
    q = parse_kql("threat.enrichments:{ typ:d* or conf >= 0.9 }")
    got = sorted(r.doc_id for r in
                 search_body(ix, {"query": q, "size": 10})
                 ["hits"].collect())
    # d0: conf .9 matches; d1: (domain, .9) matches; d2: neither
    assert got == [0, 1]
    # nested-in-nested path qualification (pure parse)
    q = parse_kql("a:{ b:{ c:1 } }")
    assert q == {"nested": {"path": "a", "query": {
        "nested": {"path": "a.b",
                   "query": {"term": {"a.b.c": 1}}}}}}


def test_fuzziness_auto_ladder(ix):
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        _fuzzy_edits,
    )

    assert _fuzzy_edits("AUTO", "ab") == 0
    assert _fuzzy_edits("AUTO", "abcde") == 1
    assert _fuzzy_edits("AUTO", "abcdef") == 2
    assert _fuzzy_edits("AUTO:2,4", "ab") == 1
    assert _fuzzy_edits(1, "whatever") == 1
    # end-to-end: AUTO on a 5-char term allows 1 edit ("alpha" from
    # "alpja"), and a match query with AUTO fuzziness finds it too
    got = sorted(r.doc_id for r in search_body(ix, {
        "query": {"fuzzy": {"text": {"value": "alpja",
                                     "fuzziness": "AUTO"}}},
        "size": 10})["hits"].collect())
    assert got == [0]
    got = sorted(r.doc_id for r in search_body(ix, {
        "query": {"match": {"text": {"query": "alpja",
                                     "fuzziness": "AUTO"}}},
        "size": 10})["hits"].collect())
    assert got == [0]


def test_sort_missing_last_default_and_overrides(spark, ix):
    # doc 2 has a NULL join_parent (docs 0/1 carry "0"); upstream
    # sorts missing LAST by default in both directions — Spark's
    # asc() NULLS FIRST default would front-run doc 2
    def run(sort):
        return [r.doc_id for r in search_body(
            ix, {"query": {"ids": {"values": [0, 1, 2]}},
                 "sort": [sort], "size": 10})["hits"].collect()]

    assert run({"join_parent": {"order": "asc"}}) == [0, 1, 2]
    assert run({"join_parent": {"order": "desc"}}) == [0, 1, 2]
    assert run({"join_parent": {"order": "asc",
                                "missing": "_first"}}) == [2, 0, 1]
    # literal missing value slots the doc at its substituted key:
    # "1" sorts after the real "0"s asc, before them desc
    assert run({"join_parent": {"order": "asc",
                                "missing": "1"}}) == [0, 1, 2]
    assert run({"join_parent": {"order": "desc",
                                "missing": "1"}}) == [2, 0, 1]


def test_search_after_reaches_missing_tail(ix):
    # docs 0/1 carry join_parent "0"; doc 2 is NULL (sorts last).
    # the cursor page after ("0", doc 1) must return the missing-tail
    # doc -- NULL comparisons silently dropped it before
    base = {"query": {"ids": {"values": [0, 1, 2]}},
            "sort": [{"join_parent": {"order": "asc"}}]}
    p1 = [r.doc_id for r in search_body(
        ix, dict(base, size=2))["hits"].collect()]
    assert p1 == [0, 1]
    p2 = [r.doc_id for r in search_body(
        ix, dict(base, size=2, search_after=["0", 1]))
        ["hits"].collect()]
    assert p2 == [2]
    # cursor already in the missing band: only later nulls qualify
    p3 = [r.doc_id for r in search_body(
        ix, dict(base, size=2, search_after=[None, 2]))
        ["hits"].collect()]
    assert p3 == []


def test_sort_mode_on_string_elements(ix):
    # min/max preserve the element type: lexical order on keywords
    body = {"query": {"ids": {"values": [0, 1, 2]}},
            "sort": [{"threat.enrichments.ind": {
                "order": "desc", "mode": "max",
                "nested": {"path": "threat.enrichments"}}}],
            "size": 10}
    got = [r.doc_id for r in search_body(ix, body)["hits"].collect()]
    assert got == [2, 1, 0]    # maxes i5 > i3 > i1


def test_nested_aggs_and_totals_route(ix):
    # top-level nested + aggs + track_total_hits exercises the
    # matched_frame path (was compile_query-only, crashing on
    # ignore_unmapped and mis-scoring sum)
    res = search_body(ix, {
        "query": {"nested": {"path": "threat.enrichments",
                             "query": {"term": {
                                 "threat.enrichments.typ": "ip"}},
                             "score_mode": "sum"}},
        "track_total_hits": True, "size": 0,
        "aggs": {"by_join": {"terms": {"field": "join_name"}}}})
    assert res["total"] == {"value": 3, "relation": "eq"}
    buckets = {r.by_join: r.doc_count
               for r in res["aggs"]["by_join"].collect()}
    assert buckets == {"answer": 2, "question": 1}
    # unmapped + ignore_unmapped through the same path: empty, no crash
    res = search_body(ix, {
        "query": {"nested": {"path": "nope",
                             "query": {"match_all": {}},
                             "ignore_unmapped": True}},
        "track_total_hits": True, "size": 0})
    assert res["total"] == {"value": 0, "relation": "eq"}


def test_cumulative_cardinality_pipeline(spark):
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        run_aggs,
    )

    docs = spark.createDataFrame(
        [(0, "d1", "a"), (1, "d1", "b"), (2, "d2", "b"),
         (3, "d2", "c"), (4, "d3", "a"), (5, "d3", "d")],
        "doc_id long, day string, user string")
    res = run_aggs(docs, {"days": {
        "terms": {"field": "day", "size": 10},
        "aggs": {
            "users": {"cardinality": {"field": "user"}},
            "total_users": {"cumulative_cardinality": {
                "buckets_path": "users"}},
        }}})
    rows = {r.days: r for r in res["days"].collect()}
    assert {d: r.users for d, r in rows.items()} == {
        "d1": 2, "d2": 2, "d3": 2}
    # running distinct across the ordered buckets: 2, 3, 4 (HLL is
    # exact at these cardinalities — sparse mode)
    assert {d: r.total_users for d, r in rows.items()} == {
        "d1": 2.0, "d2": 3.0, "d3": 4.0}
    assert "_hll_total_users" not in res["days"].columns
