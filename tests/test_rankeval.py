"""_rank_eval: every metric recomputed by a pure-python twin over the
oracle ranking (precision@k / recall@k / MRR / DCG / NDCG)."""

import math

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.rankeval import rank_eval
from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex

K = 5


@pytest.fixture(scope="module")
def setup(spark):
    pdf = corpus.make_pages_pdf(300, seed=17)
    pdf.insert(0, "doc_id", range(len(pdf)))
    sdf = spark.createDataFrame(pdf)
    ix = build_index(spark, sdf, id_col="doc_id", salt_threshold=100)
    ix.postings = ix.postings.persist()
    oracle = OracleIndex.build({int(r.doc_id): r.text
                                for r in pdf.itertuples()})

    queries = ["w00001 w00011", "w00003 w00031", "w00007"]
    requests, truth = [], {}
    for i, q in enumerate(queries):
        ranked = [d for d, _ in oracle.search(q, K)]
        # grade: best hit 3, next 2, one mid 1, one unrated, one
        # judged-irrelevant 0; plus an unretrieved relevant doc so
        # recall < 1 and idcg != dcg.
        ratings = []
        if len(ranked) >= 4:
            ratings = [(ranked[0], 3), (ranked[1], 2), (ranked[3], 1),
                       (ranked[2], 0)]
        unret = next(d for d in range(300) if d not in ranked)
        ratings.append((unret, 2))
        rid = f"q{i}"
        requests.append({"id": rid,
                         "request": {"query": {"match": {"text": q}}},
                         "ratings": ratings})
        truth[rid] = (ranked, dict(ratings))
    return ix, requests, truth


def _py_metrics(ranked, ratings, k, thr=1):
    rel = [1 if ratings.get(d, 0) >= thr else 0 for d in ranked[:k]]
    retrieved = len(ranked[:k])
    relevant_retrieved = sum(rel)
    total_relevant = sum(1 for g in ratings.values() if g >= thr)
    precision = relevant_retrieved / retrieved if retrieved else 0.0
    recall = (relevant_retrieved / total_relevant
              if total_relevant else 0.0)
    mrr = 0.0
    for i, r in enumerate(rel, start=1):
        if r:
            mrr = 1.0 / i
            break
    dcg = sum((2 ** ratings.get(d, 0) - 1) / math.log2(i + 1)
              for i, d in enumerate(ranked[:k], start=1))
    ideal = sorted(ratings.items(), key=lambda x: (-x[1], x[0]))[:k]
    idcg = sum((2 ** g - 1) / math.log2(i + 1)
               for i, (_, g) in enumerate(ideal, start=1))
    ndcg = dcg / idcg if idcg else 0.0
    return dict(precision=precision, recall=recall,
                mean_reciprocal_rank=mrr, dcg=dcg, ndcg=ndcg)


@pytest.mark.parametrize("mname,params,key", [
    ("precision", {"k": K}, "precision"),
    ("recall", {"k": K}, "recall"),
    ("mean_reciprocal_rank", {"k": K}, "mean_reciprocal_rank"),
    ("dcg", {"k": K}, "dcg"),
    ("dcg", {"k": K, "normalize": True}, "ndcg"),
])
def test_metrics_match_python_twin(spark, setup, mname, params, key):
    ix, requests, truth = setup
    res = rank_eval(ix, requests, {mname: params})
    got = {r["request_id"]: r["metric_score"]
           for r in res["details"].collect()}
    want = {rid: _py_metrics(rk, rt, K)[key]
            for rid, (rk, rt) in truth.items()}
    for rid in want:
        assert got[rid] == pytest.approx(want[rid], abs=1e-6), (rid, key)
    assert res["metric_score"] == pytest.approx(
        sum(want.values()) / len(want), abs=1e-6)


def test_details_counts_and_validation(spark, setup):
    ix, requests, truth = setup
    res = rank_eval(ix, requests, {"recall": {"k": K}})
    rows = {r["request_id"]: r for r in res["details"].collect()}
    for rid, (ranked, ratings) in truth.items():
        m = _py_metrics(ranked, ratings, K)
        r = rows[rid]
        assert r["retrieved"] == len(ranked[:K])
        assert r["total_relevant"] == sum(1 for g in ratings.values()
                                          if g >= 1)
    with pytest.raises(ValueError, match="exactly one"):
        rank_eval(ix, requests, {"recall": {}, "dcg": {}})
    with pytest.raises(ValueError, match="unknown metric"):
        rank_eval(ix, requests, {"f1": {}})
    with pytest.raises(ValueError, match="not rankable"):
        rank_eval(ix, [{"id": "x", "ratings": [],
                        "request": {"query": {"match_all": {}},
                                    "sort": [{"doc_id": "asc"}]}}])


def test_unjudged_request_scores_zero(spark, setup):
    ix, requests, _ = setup
    req = [{"id": "empty", "request":
            {"query": {"match": {"text": "w00001"}}}, "ratings": []}]
    res = rank_eval(ix, req, {"recall": {"k": K}})
    row = res["details"].collect()[0]
    assert row["metric_score"] == 0.0 and row["total_relevant"] == 0
