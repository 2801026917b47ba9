"""MaxScore pruning == exhaustive scoring (SURVEY.md section 5 item 1:
"WAND pruning == exhaustive scoring (equivalence test)")."""

import math

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.query import bm25_topk
from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex
from siem_on_amazon_opensearch_service_spark.plans.pruning import bm25_topk_pruned


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    from siem_on_amazon_opensearch_service_spark.index import PostingsIndex

    pdf = corpus.make_pages_pdf(500, seed=11)
    pdf.insert(0, "doc_id", range(len(pdf)))
    sdf = spark.createDataFrame(pdf)
    built = build_index(spark, sdf, id_col="doc_id", salt_threshold=40)
    path = str(tmp_path_factory.mktemp("ix_pruning"))
    built.save(spark, path, buckets=4)
    ix = PostingsIndex.load(spark, path)
    oracle = OracleIndex.build({i: t for i, t in enumerate(pdf["text"])})
    return ix, oracle


@pytest.mark.parametrize(
    "query,k",
    [
        ("w00000 w00001 w09211", 10),      # stopwords + rare: prunes hard
        ("w00000", 5),                     # single hot term
        ("w00007 w00003 w00001 w00000", 10),  # all-stopword query
        ("w08000 w07123", 10),             # all-rare (theta=0, no pruning)
        ("zzz_absent w00002", 3),
        ("w00000 w00000 w00555", 10),      # duplicate query term
    ],
)
def test_pruned_equals_exhaustive_and_oracle(setup, query, k):
    ix, oracle = setup
    # min_postings=0 forces the PRUNED plan even on this tiny corpus
    # (the cost-based dispatch would otherwise route to exhaustive).
    pruned = [
        (r["doc_id"], r["score"])
        for r in bm25_topk_pruned(ix, query, k, min_postings=0).collect()
    ]
    full = [(r["doc_id"], r["score"]) for r in bm25_topk(ix, query, k).collect()]
    exp = oracle.search(query, k)
    assert [d for d, _ in pruned] == [d for d, _ in full] == [d for d, _ in exp]
    for (_, a), (_, b), (_, c) in zip(pruned, full, exp):
        assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
        assert math.isclose(a, c, rel_tol=1e-9, abs_tol=1e-9)


def test_block_skipping_fires_and_stays_exact(setup):
    """Single hot term, k=1: θ is the best impact, so every block
    whose max_impact bound falls below it MUST be skipped (the
    block-max-WAND payoff) — and the result must still equal the
    oracle exactly."""
    ix, oracle = setup
    query, k = "w00002", 1
    stats = {}
    got = [(r["doc_id"], r["score"])
           for r in bm25_topk_pruned(ix, query, k, stats_out=stats).collect()]
    exp = oracle.search(query, k)
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    assert stats["theta"] > 0
    # the skip must actually fire: strictly fewer blocks decoded
    assert stats["blocks_scanned"] < stats["blocks_total"], stats


def test_cost_dispatch_small_index_routes_to_exhaustive(setup):
    """Below the posting-volume threshold the pruned entry point must
    return the exhaustive plan's results (identical anyway) without
    running the theta job."""
    ix, oracle = setup
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk_pruned(ix, "w00000 w00001", 5).collect()
    ]
    exp = [(d, round(s, 9)) for d, s in oracle.search("w00000 w00001", 5)]
    assert got == exp
