"""Edge-ngram prefix dictionary (the mapping's index_prefixes /
search_as_you_type option): prefix-leaf expansion becomes an EqualTo
lookup on a prefix-sorted dictionary; results stay IDENTICAL to the
un-accelerated vocabulary-first rewrite across every surface that
compiles a prefix leaf."""

import math

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex, build_index,
)
from siem_on_amazon_opensearch_service_spark.index import querystring as qs
from siem_on_amazon_opensearch_service_spark.index.querystring import (
    _prefix_vocab_terms, query_string_topk,
)
from siem_on_amazon_opensearch_service_spark.index.sayt import (
    add_index_prefixes, build_prefix_vocab,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    search_hits,
)

MAX_GRAM = 4  # small so prefixes longer than the gram are exercised


@pytest.fixture(scope="module")
def paths(spark, tmp_path_factory):
    pages = corpus.pages_df(spark, 400, seed=53, partitions=4)
    ix = build_index(spark, pages, salt_threshold=60)
    plain = str(tmp_path_factory.mktemp("ix_plain"))
    ix.save(spark, plain, buckets=4)
    sayt = str(tmp_path_factory.mktemp("ix_sayt"))
    ix.save(spark, sayt, buckets=4)
    add_index_prefixes(spark, sayt, max_gram=MAX_GRAM)
    return plain, sayt


@pytest.fixture(scope="module")
def both(spark, paths):
    plain, sayt = paths
    return (PostingsIndex.load(spark, plain),
            PostingsIndex.load(spark, sayt))


def test_dictionary_matches_python_edge_ngrams(spark, both):
    plain, sayt = both
    vocab = [r["term"] for r in plain.term_stats.select("term").collect()]
    exp = sorted({(t[:i], t) for t in vocab
                  for i in range(1, min(len(t), MAX_GRAM) + 1)})
    got = sorted((r["prefix"], r["term"])
                 for r in sayt.prefix_vocab.collect())
    assert got == exp
    assert sayt.prefix_max_gram == MAX_GRAM


@pytest.mark.parametrize("prefix", ["w000", "w0001", "w00012"])
def test_expansion_equals_vocab_startswith(both, prefix):
    plain, sayt = both
    vocab = [r["term"] for r in plain.term_stats.select("term").collect()]
    got = _prefix_vocab_terms(sayt, prefix)
    assert got is not None
    assert sorted(got) == sorted(t for t in vocab
                                 if t.startswith(prefix))


def test_huge_match_set_overflows_to_none(both):
    # 'w0' matches most of the observed vocabulary — past the literal
    # IN cutoff the dictionary declines and the caller falls back
    plain, sayt = both
    n = len([r for r in plain.term_stats.select("term").collect()
             if r["term"].startswith("w0")])
    assert n > qs.MULTI_TERM_SCAN_CUTOFF
    assert _prefix_vocab_terms(sayt, "w0") is None


def test_plain_index_has_no_dictionary(both):
    plain, _ = both
    assert _prefix_vocab_terms(plain, "w0") is None


def test_query_results_identical_with_and_without(both):
    plain, sayt = both
    for q in ("w0001*", "w0001* AND w00002", "NOT w00499* AND w00002"):
        a = [(r["doc_id"], round(r["score"], 9)) for r in
             query_string_topk(plain, q, k=15).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in
             query_string_topk(sayt, q, k=15).collect()]
        assert a == b and a, q


def test_match_bool_prefix_body_identical(both):
    plain, sayt = both
    body = {"query": {"match_bool_prefix": {"text": "w00002 w0001"}},
            "size": 15}
    a = [(r["doc_id"], round(r["score"], 9)) for r in
         search_hits(plain, body).collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in
         search_hits(sayt, body).collect()]
    assert a == b and a


def test_lookup_plan_is_equality_pushed(both):
    _, sayt = both
    probe = sayt.prefix_vocab.filter(F.col("prefix") == "w00")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(prefix" in plan
    assert "StartsWith" not in plan


def test_overflow_falls_back_to_like_scan(both, monkeypatch):
    plain, sayt = both
    monkeypatch.setattr(qs, "MULTI_TERM_SCAN_CUTOFF", 2)
    assert _prefix_vocab_terms(sayt, "w0") is None  # >2 matches
    a = [(r["doc_id"], round(r["score"], 9)) for r in
         query_string_topk(plain, "w0001*", k=10).collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in
         query_string_topk(sayt, "w0001*", k=10).collect()]
    assert a == b and a


def test_longer_than_gram_uses_residual_refine(both):
    plain, sayt = both
    # 5-char prefix over a 4-gram dictionary: equality on 'w000' plus
    # LIKE refine; must match the plain startswith exactly
    vocab = [r["term"] for r in plain.term_stats.select("term").collect()]
    got = _prefix_vocab_terms(sayt, "w00012")
    assert got is not None and got
    assert sorted(got) == sorted(t for t in vocab
                                 if t.startswith("w00012"))


def test_bad_max_gram_rejected(both):
    plain, _ = both
    with pytest.raises(ValueError, match="max_gram"):
        build_prefix_vocab(plain, max_gram=0)
