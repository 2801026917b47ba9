"""query_string parser + executor: each syntax feature must reproduce
the corresponding engine primitive exactly (same docs, scores 1e-9)."""

import math

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex,
    bm25_topk,
    build_index,
)
from siem_on_amazon_opensearch_service_spark.index.boolquery import (
    bool_topk,
    fuzzy_topk,
    multiterm_topk,
)
from siem_on_amazon_opensearch_service_spark.index.querystring import (
    parse_query_string,
    query_string_topk,
)

K = 15


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    pdf = corpus.make_pages_pdf(400, seed=17)
    pdf.insert(0, "doc_id", range(len(pdf)))
    built = build_index(spark, spark.createDataFrame(pdf),
                        id_col="doc_id", salt_threshold=60)
    path = str(tmp_path_factory.mktemp("qs_ix"))
    built.save(spark, path, buckets=4)
    return PostingsIndex.load(spark, path)


@pytest.fixture(scope="module")
def pos_ix(spark, tmp_path_factory):
    from siem_on_amazon_opensearch_service_spark.index.positional import (
        build_positional_index,
    )

    pdf = corpus.make_pages_pdf(400, seed=17)
    pdf.insert(0, "doc_id", range(len(pdf)))
    pix = build_positional_index(spark, spark.createDataFrame(pdf),
                                 id_col="doc_id", salt_threshold=60)
    pix.postings = pix.postings.persist()
    pix.term_stats = pix.term_stats.persist()
    return pix


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def assert_same(a, b):
    assert [d for d, _ in a] == [d for d, _ in b]
    for (_, x), (_, y) in zip(a, b):
        assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)


# -- parser unit tests ------------------------------------------------


def test_parse_shapes():
    s = parse_query_string('+alpha beta^2 -gamma NOT delta lang:en '
                           '-source:src1 pre* fuzz~2 "exact phrase"')
    kinds = [(c.kind, c.text, c.occur, c.boost) for c in s.clauses]
    assert ("term", "alpha", "must", 1.0) in kinds
    assert ("term", "beta", "should", 2.0) in kinds
    assert ("term", "gamma", "must_not", 1.0) in kinds
    assert ("term", "delta", "must_not", 1.0) in kinds
    assert ("prefix", "pre", "should", 1.0) in kinds
    assert ("fuzzy", "fuzz", "should", 1.0) in kinds
    assert ("phrase", "exact phrase", "should", 1.0) in kinds
    assert [c for c in s.clauses if c.kind == "fuzzy"][0].max_edits == 2
    assert s.filters == [("lang", "en")]
    assert s.filter_nots == [("source", "src1")]


def test_parse_and_upgrades_to_must():
    s = parse_query_string("alpha AND beta gamma")
    occ = {c.text: c.occur for c in s.clauses}
    assert occ == {"alpha": "must", "beta": "must", "gamma": "should"}


def test_parse_and_adjacent_to_filter_upgrades_nothing_else():
    """'alpha AND lang:en beta': the AND binds alpha to the filter
    (filters are conjunctive anyway); beta must stay should."""
    s = parse_query_string("alpha AND lang:en beta")
    occ = {c.text: c.occur for c in s.clauses}
    assert occ == {"alpha": "must", "beta": "should"}
    assert s.filters == [("lang", "en")]


def test_duplicate_term_in_should_and_must(ix):
    """'foo +foo': the must gate must not be starved by the should
    duplicate -- docs containing the term qualify, weights add."""
    got = rows(query_string_topk(ix, "w00001 +w00001", k=K))
    assert got, "duplicate should+must term must still match"
    # weights add (2x contribution) but membership == plain must
    want_members = {d for d, _ in rows(
        query_string_topk(ix, "+w00001", k=K)
    )}
    assert {d for d, _ in got} == want_members


def test_negated_prefix_excludes(ix):
    base = {d for d, _ in rows(query_string_topk(ix, "w00001", k=400))}
    got = {d for d, _ in rows(
        query_string_topk(ix, "w00001 -w0005*", k=400)
    )}
    prefixed = {d for d, _ in rows(
        query_string_topk(ix, "w0005*", k=400)
    )}
    assert got == base - prefixed
    assert got != base  # the exclusion actually fired


def test_filter_only_query_returns_filtered_docs(ix):
    out = query_string_topk(ix, "lang:en", k=10_000)
    res = out.join(ix.docs.select("doc_id", "lang"), "doc_id").collect()
    n_en = ix.docs.filter(F.col("lang") == "en").count()
    assert len(res) == n_en > 0
    assert all(r["lang"] == "en" and r["score"] == 1.0 for r in res)


def test_wildcard_filter_value(ix):
    """'lang:e*' matches lang values by prefix (the dashboards'
    eventSource:signin* shape)."""
    out = query_string_topk(ix, "w00001 lang:e*", k=400)
    res = out.join(ix.docs.select("doc_id", "lang"), "doc_id").collect()
    assert res and all(r["lang"].startswith("e") for r in res)


# -- executor equivalences -------------------------------------------


def test_bare_terms_equal_bm25(ix):
    got = rows(query_string_topk(ix, "w00001 w00057", k=K))
    want = rows(bm25_topk(ix, "w00001 w00057", k=K))
    assert_same(got, want)


def test_must_and_not(ix):
    got = rows(query_string_topk(ix, "+w00001 w00057 -w00003", k=K))
    want = rows(bool_topk(ix, must=["w00001"], should=["w00057"],
                          must_not=["w00003"], k=K))
    assert_same(got, want)


def test_and_operator(ix):
    got = rows(query_string_topk(ix, "w00001 AND w00057", k=K))
    want = rows(bool_topk(ix, must=["w00001", "w00057"], k=K))
    assert_same(got, want)


def test_boost(ix):
    got = rows(query_string_topk(ix, "w00001^3 w00057", k=K))
    want = rows(bool_topk(ix, should=["w00001", "w00057"], k=K,
                          boosts={"w00001": 3.0}))
    assert_same(got, want)


def test_prefix_only_matches_constant_score(ix):
    got = rows(query_string_topk(ix, "w0000*", k=400))
    want = rows(multiterm_topk(ix, "w0000%", k=400))
    assert {d for d, _ in got} == {d for d, _ in want}
    assert all(s == 1.0 for _, s in got)


def test_fuzzy_equals_fuzzy_topk(ix):
    got = rows(query_string_topk(ix, "w0001~1", k=K))
    want = rows(fuzzy_topk(ix, "w0001", k=K, max_edits=1))
    assert_same(got, want)


def test_phrase_clause(pos_ix):
    from siem_on_amazon_opensearch_service_spark.index.positional import (
        phrase_topk,
    )

    got = rows(query_string_topk(pos_ix, '"w00001 w00057"', k=K,
                                 positional_ix=pos_ix))
    want = rows(phrase_topk(pos_ix, "w00001 w00057", k=K))
    assert_same(got, want)


def test_field_filter(ix):
    got = query_string_topk(ix, "w00001 lang:en", k=400)
    joined = got.join(ix.docs.select("doc_id", "lang"), "doc_id").collect()
    assert joined and all(r["lang"] == "en" for r in joined)
    # and equals the unfiltered result restricted to lang=en
    unf = (
        bm25_topk(ix, "w00001", k=400)
        .join(ix.docs.filter(F.col("lang") == "en").select("doc_id"),
              "doc_id", "left_semi")
    )
    assert_same(rows(got), rows(
        unf.orderBy(F.desc("score"), F.asc("doc_id"))
    ))


def test_combined_query(ix):
    """The kitchen sink: must + boosted should + exclusion + prefix +
    filter composes without error and respects every gate."""
    out = query_string_topk(
        ix, "+w00001 w00057^2 -w00003 w0009* lang:en", k=K
    )
    res = out.join(ix.docs.select("doc_id", "lang"), "doc_id").collect()
    assert res and all(r["lang"] == "en" for r in res)
    excluded = {
        r["doc_id"]
        for r in bm25_topk(ix, "w00003", k=400).collect()
    }
    assert not ({r["doc_id"] for r in res} & excluded)
