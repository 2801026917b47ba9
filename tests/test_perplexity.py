"""Bigram-LM log-perplexity quality signal: per-doc scores recomputed
by a pure-python Stupid-Backoff twin sharing the suggester's exact
formula; the filter drops the high-perplexity tail."""

import math

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py
from siem_on_amazon_opensearch_service_spark.index.suggest import (
    build_bigram_model,
)
from siem_on_amazon_opensearch_service_spark.operators.textstats import (
    doc_log_perplexity,
    filter_by_perplexity,
)

DISCOUNT = 0.4


@pytest.fixture(scope="module")
def setup(spark):
    pdf = corpus.make_pages_pdf(120, seed=19)
    pdf.insert(0, "doc_id", range(len(pdf)))
    sdf = spark.createDataFrame(pdf)
    model = build_bigram_model(sdf)
    model.bigrams = model.bigrams.persist()
    return pdf, sdf, model


def _py_logppl(pdf):
    uni, bi = {}, {}
    total = 0
    docs = {int(r.doc_id): tokenize_py(r.text) for r in pdf.itertuples()}
    for ts in docs.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
            total += 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    out = {}
    for d, ts in docs.items():
        if not ts:
            continue
        lp = math.log((uni.get(ts[0], 0) + 1e-9) / total)
        for a, b in zip(ts, ts[1:]):
            if (a, b) in bi and a in uni:
                lp += math.log(bi[(a, b)] / uni[a])
            else:
                lp += math.log(DISCOUNT * (uni.get(b, 0) + 1e-9) / total)
        out[d] = (len(ts), -lp / len(ts))
    return out


def test_logppl_matches_python_twin(spark, setup):
    pdf, sdf, model = setup
    got = {int(r["doc_id"]): (int(r["n_tokens"]), r["logppl"])
           for r in doc_log_perplexity(sdf, model).collect()}
    want = _py_logppl(pdf)
    assert set(got) == set(want)
    for d, (n, lp) in want.items():
        assert got[d][0] == n
        assert got[d][1] == pytest.approx(lp, abs=1e-6), d


def test_gibberish_scores_worse_than_corpus_text(spark, setup):
    pdf, sdf, model = setup
    probe = spark.createDataFrame(
        [(9001, pdf.iloc[0]["text"]),
         (9002, "zzq qxz vvw jkj qqq zxv wvv jjq " * 4)],
        "doc_id long, text string",
    )
    got = {int(r["doc_id"]): r["logppl"]
           for r in doc_log_perplexity(probe, model).collect()}
    assert got[9002] > got[9001]


def test_filter_drops_the_tail(spark, setup):
    pdf, sdf, model = setup
    scores = sorted(
        r["logppl"] for r in doc_log_perplexity(sdf, model).collect())
    cut = scores[len(scores) // 2]  # median threshold
    kept = filter_by_perplexity(sdf, model, cut)
    ids = {int(r["doc_id"]) for r in kept.select("doc_id").collect()}
    want = {int(r["doc_id"])
            for r in doc_log_perplexity(sdf, model).collect()
            if r["logppl"] <= cut}
    assert ids == want and 0 < len(ids) < len(pdf)
