"""Session-10 surface: _mget slot-ordered fetch, k-NN radial search
(min_score / max_distance), completion-suggester category contexts,
and the alerting doc-level monitor's exactly-once findings."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.boolquery import (
    build_completion_contexts, completion_suggest_ctx,
)
from siem_on_amazon_opensearch_service_spark.index.docops import mget
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    search_hits,
)
from siem_on_amazon_opensearch_service_spark.operators.percolate import (
    doc_level_monitor,
)
from siem_on_amazon_opensearch_service_spark.operators.similarity import (
    cosine_radial,
)

N = 150
DIM = 8


@pytest.fixture(scope="module")
def pages_pdf():
    pdf = corpus.make_pages_pdf(N, seed=23)
    pdf.insert(0, "doc_id", range(len(pdf)))
    return pdf


@pytest.fixture(scope="module")
def ix(spark, pages_pdf):
    return build_index(spark, spark.createDataFrame(pages_pdf),
                       id_col="doc_id", salt_threshold=60)


@pytest.fixture(scope="module")
def vecs_pdf():
    rng = np.random.default_rng(11)
    m = rng.normal(size=(N, DIM)).astype("float32")
    return pd.DataFrame({"vec_id": range(N),
                         "embedding": [r.tolist() for r in m]})


@pytest.fixture(scope="module")
def vecs(spark, vecs_pdf):
    return spark.createDataFrame(vecs_pdf).persist()


# ---------------------------------------------------------------------------
# _mget
# ---------------------------------------------------------------------------

def test_mget_slot_order_and_found_flags(ix):
    ids = [7, 99999, 2, 7, 100001]
    rows = mget(ix, ids).collect()
    assert [r["doc_id"] for r in rows] == ids  # request order, dupes kept
    assert [r["found"] for r in rows] == [True, False, True, True,
                                          False]
    assert rows[1]["url"] is None  # missing slot carries nulls


def test_mget_with_source_docs(spark, ix, pages_pdf):
    src = spark.createDataFrame(pages_pdf[["doc_id", "html"]])
    rows = mget(ix, [3, 5], source_docs=src).collect()
    got = {r["doc_id"]: r["html"] for r in rows}
    exp = {i: pages_pdf["html"][i] for i in (3, 5)}
    assert got == exp
    assert all(r["found"] for r in rows)


def test_mget_empty_request(ix):
    assert mget(ix, []).count() == 0


# ---------------------------------------------------------------------------
# k-NN radial search
# ---------------------------------------------------------------------------

def _np_cosine(vecs_pdf, q):
    m = np.array(vecs_pdf["embedding"].tolist())
    q = np.asarray(q)
    sims = (m @ q) / ((m * m).sum(axis=1) ** 0.5 * (q @ q) ** 0.5)
    return {int(i): float(s)
            for i, s in zip(vecs_pdf["vec_id"], sims)}


def test_radial_min_score_exact(vecs, vecs_pdf):
    q = vecs_pdf["embedding"][0]
    got = [(r["vec_id"], r["cosine"]) for r in
           cosine_radial(vecs, q, min_score=0.5).collect()]
    sims = {d: round(s, 4) for d, s in _np_cosine(vecs_pdf, q).items()
            if round(s, 4) >= 0.5}
    exp = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))
    # engine filters on unrounded cosine; compare the id sets via the
    # rounded oracle then exact ordering
    assert dict(got) == dict(exp)
    assert [d for d, _ in got] == [d for d, _ in exp]
    assert 1 <= len(got) < N  # query vec itself always qualifies


def test_radial_max_distance_is_one_minus_score(vecs, vecs_pdf):
    q = vecs_pdf["embedding"][1]
    a = [(r["vec_id"], r["cosine"]) for r in
         cosine_radial(vecs, q, max_distance=0.5).collect()]
    b = [(r["vec_id"], r["cosine"]) for r in
         cosine_radial(vecs, q, min_score=0.5).collect()]
    assert a == b


def test_radial_requires_exactly_one_cutoff(vecs):
    with pytest.raises(ValueError, match="exactly one"):
        cosine_radial(vecs, [1.0] * DIM)
    with pytest.raises(ValueError, match="exactly one"):
        cosine_radial(vecs, [1.0] * DIM, min_score=0.5,
                      max_distance=0.5)


def test_zero_vector_rows_excluded_not_crash(spark, vecs, vecs_pdf):
    """A zero embedding (empty doc / padding) has no direction: its
    cosine is NULL, it silently drops out of radial and top-k results,
    and nothing raises DIVIDE_BY_ZERO under ANSI mode (regression:
    cosine_col used to crash the whole job on one zero row)."""
    from siem_on_amazon_opensearch_service_spark.operators.similarity import (
        cosine_topk,
    )

    zero = spark.createDataFrame(
        pd.DataFrame({"vec_id": [N + 1], "embedding": [[0.0] * DIM]}))
    poisoned = vecs.unionByName(zero)
    q = vecs_pdf["embedding"][0]
    rad = cosine_radial(poisoned, q, min_score=0.5).collect()
    base = cosine_radial(vecs, q, min_score=0.5).collect()
    assert [tuple(r) for r in rad] == [tuple(r) for r in base]
    top = cosine_topk(poisoned, q, k=5).collect()
    assert all(r["vec_id"] != N + 1 for r in top) and len(top) == 5


def test_knn_body_radial(ix, vecs, vecs_pdf):
    q = vecs_pdf["embedding"][2]
    body = {"query": {"knn": {"embedding": {
        "vector": q, "min_score": 0.4}}}, "size": N}
    got = [r["doc_id"] for r in
           search_hits(ix, body, vecs=vecs).collect()]
    sims = {d: s for d, s in _np_cosine(vecs_pdf, q).items()
            if round(s, 4) >= 0.4}
    exp = [d for d, _ in sorted(
        sims.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))]
    assert got == exp and exp


def test_knn_body_radial_prefiltered(ix, vecs, vecs_pdf, pages_pdf):
    q = vecs_pdf["embedding"][4]
    body = {"query": {"knn": {"embedding": {
        "vector": q, "min_score": 0.2,
        "filter": {"term": {"lang": "en"}}}}}, "size": N}
    got = [r["doc_id"] for r in
           search_hits(ix, body, vecs=vecs).collect()]
    langs = dict(zip(pages_pdf["doc_id"], pages_pdf["lang"]))
    sims = {d: s for d, s in _np_cosine(vecs_pdf, q).items()
            if round(s, 4) >= 0.2 and langs[d] == "en"}
    exp = [d for d, _ in sorted(
        sims.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))]
    assert got == exp and exp


def test_knn_body_rejects_k_plus_radial(ix, vecs, vecs_pdf):
    body = {"query": {"knn": {"embedding": {
        "vector": vecs_pdf["embedding"][0], "k": 5,
        "min_score": 0.5}}}}
    with pytest.raises(ValueError, match="not both"):
        search_hits(ix, body, vecs=vecs)


# ---------------------------------------------------------------------------
# completion suggester with category contexts
# ---------------------------------------------------------------------------

def test_completion_contexts_vs_python(spark, pages_pdf):
    docs = spark.createDataFrame(pages_pdf)
    stats = build_completion_contexts(docs, "lang")
    # python twin: df per (ctx, term) over distinct analyzed tokens
    py = Counter()
    for r in pages_pdf.itertuples():
        for t in set(tokenize_py(r.text)):
            py[(r.lang, t)] += 1
    got = {(r["ctx"], r["term"]): r["df"] for r in stats.collect()}
    assert got == dict(py)

    # pick a live prefix that exists in >1 context
    pref = sorted({t[:2] for (_, t) in py})[0]
    boosts = {"en": 2.0, "de": 1.0}
    weights = Counter()
    for (ctx, t), df in py.items():
        if ctx in boosts and t.startswith(pref):
            weights[t] += boosts[ctx] * df
    exp = sorted(((t, round(w, 4)) for t, w in weights.items()),
                 key=lambda kv: (-kv[1], kv[0]))[:5]
    got_s = [(r["suggestion"], r["weight"], r["rank"]) for r in
             completion_suggest_ctx(stats, pref, boosts, size=5)
             .collect()]
    assert [(s, w) for s, w, _ in got_s] == exp and exp
    assert [r[2] for r in got_s] == list(range(1, len(exp) + 1))


def test_completion_contexts_list_and_head(spark, pages_pdf):
    docs = spark.createDataFrame(pages_pdf)
    stats = build_completion_contexts(docs, "lang")
    term = tokenize_py(pages_pdf["text"][0])[0]
    res = completion_suggest_ctx(
        stats, f"hello {term[:3]}", [pages_pdf["lang"][0]], size=3
    ).collect()
    assert res and all(
        r["suggestion"].startswith("hello ") for r in res)
    with pytest.raises(ValueError, match="non-empty"):
        completion_suggest_ctx(stats, "x", {})
    assert completion_suggest_ctx(stats, "", ["en"]).count() == 0


# ---------------------------------------------------------------------------
# doc-level monitor
# ---------------------------------------------------------------------------

def _py_findings(pdf, rules):
    out = set()
    for r in pdf.itertuples():
        toks = set(tokenize_py(r.text))
        for qid, q in rules:
            # rules below are single-term query_strings
            if q in toks:
                out.add((int(r.doc_id), str(qid)))
    return out


def test_doc_level_monitor_exactly_once(spark, pages_pdf,
                                        tmp_path_factory):
    path = str(tmp_path_factory.mktemp("doc_monitor"))
    # two single-term rules guaranteed to hit the zipf head
    head = Counter(t for s in pages_pdf["text"]
                   for t in tokenize_py(s)).most_common(2)
    rules = [("r1", head[0][0]), ("r2", head[1][0])]

    batch1 = pages_pdf.iloc[:100]
    res1 = doc_level_monitor(
        spark.createDataFrame(batch1), rules, path)
    assert res1["new_docs"] == 100
    exp1 = _py_findings(batch1, rules)
    assert res1["findings"] == len(exp1)

    # re-run with the SAME corpus: nothing new fires
    res2 = doc_level_monitor(
        spark.createDataFrame(batch1), rules, path)
    assert res2 == {"new_docs": 0, "findings": 0,
                    "watermark": res1["watermark"]}

    # grow the corpus: only the delta percolates, findings append
    res3 = doc_level_monitor(
        spark.createDataFrame(pages_pdf), rules, path)
    assert res3["new_docs"] == N - 100
    got = {(int(r["doc_id"]), r["query_id"]) for r in
           spark.read.parquet(f"{path}/findings").collect()}
    assert got == _py_findings(pages_pdf, rules)
    assert res3["watermark"] > res1["watermark"]
