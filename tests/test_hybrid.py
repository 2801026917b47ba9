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
