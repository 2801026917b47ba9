"""Hybrid BM25 + vector RRF fusion vs a pure-Python RRF oracle built
from the two (already oracle-verified) sub-query rankings."""

import math

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.query import bm25_scores
from siem_on_amazon_opensearch_service_spark.operators.hybrid import (
    RRF_K,
    hybrid_topk,
)
from siem_on_amazon_opensearch_service_spark.operators.similarity import (
    cosine_topk,
)

SF = "/root/testdata/sf0.01"
QUERY = "spark table join"
DEPTH = 40
K = 10


@pytest.fixture(scope="module")
def setup(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    ix = build_index(spark, docs, text_col="text", id_col="doc_id",
                     salt_threshold=200)
    ix.postings = ix.postings.persist()
    ix.term_stats = ix.term_stats.persist()
    qv = list(
        vecs.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0]
    )
    return ix, vecs, qv


def test_hybrid_matches_python_rrf(spark, setup):
    ix, vecs, qv = setup
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in hybrid_topk(ix, vecs, QUERY, qv, k=K, depth=DEPTH).collect()
    }

    lex = sorted(
        ((r["doc_id"], r["score"]) for r in bm25_scores(ix, QUERY).collect()),
        key=lambda t: (-t[1], t[0]),
    )[:DEPTH]
    vec = [
        (r["vec_id"], r["cosine"])
        for r in cosine_topk(vecs, qv, k=DEPTH).collect()
    ]
    want: dict[int, float] = {}
    for lst in (lex, vec):
        for rank, (d, _) in enumerate(lst, start=1):
            want[d] = want.get(d, 0.0) + 1.0 / (RRF_K + rank)
    top = sorted(want.items(), key=lambda t: (-t[1], t[0]))[:K]

    assert list(got) == [d for d, _ in top]
    for d, s in top:
        assert math.isclose(got[d], s, rel_tol=1e-9, abs_tol=1e-9)


def test_doc_in_both_lists_outranks_single_list(setup):
    """A doc present in both rankings accumulates two reciprocal
    terms -- RRF's defining property."""
    ix, vecs, qv = setup
    fused = hybrid_topk(ix, vecs, QUERY, qv, k=DEPTH * 2,
                        depth=DEPTH).collect()
    lex_ids = {
        r["doc_id"]
        for r in bm25_scores(ix, QUERY)
        .orderBy(F.desc("score"), F.asc("doc_id")).limit(DEPTH).collect()
    }
    vec_ids = {r["vec_id"] for r in cosine_topk(vecs, qv, k=DEPTH).collect()}
    both = lex_ids & vec_ids
    single_best = max(
        (r["rrf_score"] for r in fused
         if r["doc_id"] not in both), default=0.0
    )
    if both:
        both_worst = min(
            r["rrf_score"] for r in fused if r["doc_id"] in both
        )
        # a doc ranked first in ONE list scores 1/(60+1); a doc in
        # both lists at worst depth scores 2/(60+DEPTH) -- not always
        # bigger, so just assert the accumulation holds numerically
        assert both_worst > 1.0 / (RRF_K + DEPTH)
    assert single_best <= 1.0 / (RRF_K + 1)


def _cuts_py(ix, vecs, qv):
    lex = sorted(
        ((r["doc_id"], r["score"]) for r in bm25_scores(ix, QUERY).collect()),
        key=lambda t: (-t[1], t[0]),
    )[:DEPTH]
    vec = sorted(
        ((r["vec_id"], r["cosine"]) for r in
         cosine_topk(vecs, qv, k=DEPTH).collect()),
        key=lambda t: (-t[1], t[0]),
    )
    return lex, vec


def _minmax(cut):
    lo = min(s for _, s in cut)
    hi = max(s for _, s in cut)
    return {d: ((s - lo) / (hi - lo) if hi > lo else 1.0)
            for d, s in cut}


@pytest.mark.parametrize("combination,weights", [
    ("arithmetic_mean", None),
    ("arithmetic_mean", [0.7, 0.3]),
    ("geometric_mean", None),
    ("harmonic_mean", None),
])
def test_normalized_fuse_matches_python(spark, setup, combination, weights):
    from siem_on_amazon_opensearch_service_spark.operators.hybrid import (
        normalized_fuse,
    )

    ix, vecs, qv = setup
    lex, vec = _cuts_py(ix, vecs, qv)
    lex_df = spark.createDataFrame(lex, "doc_id long, score double")
    vec_df = spark.createDataFrame(vec, "doc_id long, score double")
    got = normalized_fuse([lex_df, vec_df], k=K,
                          combination=combination,
                          weights=weights).collect()

    w = weights or [1.0, 1.0]
    nl, nv = _minmax(lex), _minmax(vec)
    exp = {}
    for d in set(nl) | set(nv):
        present = [(w[0], nl[d]) if d in nl else None,
                   (w[1], nv[d]) if d in nv else None]
        present = [p for p in present if p is not None]
        pos = [(wi, s) for wi, s in present if s > 0]
        if combination == "arithmetic_mean":
            exp[d] = sum(wi * s for wi, s in present) / sum(w)
        elif combination == "geometric_mean":
            exp[d] = (math.exp(sum(wi * math.log(s) for wi, s in pos)
                               / sum(wi for wi, _ in pos))
                      if pos else 0.0)
        else:  # harmonic
            exp[d] = (sum(wi for wi, _ in pos)
                      / sum(wi / s for wi, s in pos) if pos else 0.0)
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r["score"], s, rel_tol=1e-9), combination


def test_normalized_fuse_l2(spark, setup):
    from siem_on_amazon_opensearch_service_spark.operators.hybrid import (
        normalized_fuse,
    )

    ix, vecs, qv = setup
    lex, vec = _cuts_py(ix, vecs, qv)
    lex_df = spark.createDataFrame(lex, "doc_id long, score double")
    vec_df = spark.createDataFrame(vec, "doc_id long, score double")
    got = normalized_fuse([lex_df, vec_df], k=K,
                          normalization="l2").collect()
    def l2(cut):
        n = math.sqrt(sum(s * s for _, s in cut))
        return {d: (s / n if n else 0.0) for d, s in cut}
    nl, nv = l2(lex), l2(vec)
    exp = {d: (nl.get(d, 0.0) + nv.get(d, 0.0)) / 2.0
           for d in set(nl) | set(nv)}
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r["score"], s, rel_tol=1e-9)


def test_body_hybrid_normalization(spark, setup):
    """The _search body hybrid query with normalization/combination
    blocks routes through normalized_fuse."""
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_hits,
    )
    from siem_on_amazon_opensearch_service_spark.operators.hybrid import (
        normalized_fuse,
    )

    ix, vecs, qv = setup
    body = {"query": {"hybrid": {
        "queries": [
            {"match": {"text": QUERY}},
            {"knn": {"embedding": {"vector": qv, "k": DEPTH}}},
        ],
        "pagination_depth": DEPTH,
        "normalization": {"technique": "min_max"},
        "combination": {"technique": "arithmetic_mean",
                        "parameters": {"weights": [0.6, 0.4]}},
    }}, "size": K}
    got = [(r["doc_id"], r["score"])
           for r in search_hits(ix, body, vecs=vecs)
           .select("doc_id", "score").collect()]

    lex, vec = _cuts_py(ix, vecs, qv)
    lex_df = spark.createDataFrame(lex, "doc_id long, score double")
    vec_df = spark.createDataFrame(vec, "doc_id long, score double")
    want = [(r["doc_id"], r["score"]) for r in normalized_fuse(
        [lex_df, vec_df], k=K, weights=[0.6, 0.4]).collect()]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        # the two lexical paths (tree_scores vs bm25_scores) sum the
        # same terms in different orders -> 1-ulp float differences
        assert math.isclose(a, b, rel_tol=1e-12)
