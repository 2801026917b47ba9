"""Phrase suggester (bigram Stupid-Backoff LM) and BM25 explain vs
pure-Python recomputation."""

import math
from collections import Counter
from itertools import product

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py
from siem_on_amazon_opensearch_service_spark.bm25 import B, K1, idf
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.query import (
    bm25_explain, bm25_topk,
)
from siem_on_amazon_opensearch_service_spark.index.suggest import (
    build_bigram_model, phrase_suggest,
)

SENTS = (
    ["the quick brown fox jumps over the lazy dog"] * 8
    + ["the quick brown bear sleeps"] * 4
    + ["a slow brown fox naps under the lazy dog"] * 3
    + ["quack brawn fix"] * 1
)


@pytest.fixture(scope="module")
def model(spark):
    sdf = spark.createDataFrame([(s,) for s in SENTS], "text string")
    return build_bigram_model(sdf, "text")


def py_lm():
    uni, bi = Counter(), Counter()
    for s in SENTS:
        ts = tokenize_py(s)
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    return uni, bi, sum(uni.values())


def test_bigram_model_counts(model):
    uni, bi, total = py_lm()
    got_u = {r["w"]: r["n"] for r in model.unigrams.collect()}
    got_b = {(r["w1"], r["w2"]): r["n"] for r in model.bigrams.collect()}
    assert got_u == dict(uni)
    assert got_b == dict(bi)
    assert model.total == total


def sb_score(cand, uni, bi, total, discount=0.4):
    s = 0.0
    for i, w in enumerate(cand):
        if i == 0:
            s += math.log((uni.get(w, 0) + 1e-9) / total)
        elif (cand[i - 1], w) in bi and cand[i - 1] in uni:
            s += math.log(bi[(cand[i - 1], w)] / uni[cand[i - 1]])
        else:
            s += math.log(discount * (uni.get(w, 0) + 1e-9) / total)
    return s


def py_suggest(text, uni, bi, total, size=3, max_edits=1, per_token=4,
               max_errors=2):
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    tokens = tokenize_py(text)
    slots = []
    for t in tokens:
        cand = sorted(
            ((lev(w, t), -n, w) for w, n in uni.items() if lev(w, t) <= max_edits),
        )[:per_token]
        slots.append(list(dict.fromkeys([t] + [c[2] for c in cand])))
    phrases = [
        c for c in product(*slots)
        if sum(a != b for a, b in zip(c, tokens)) <= max_errors
    ]
    scored = sorted(
        ((" ".join(c), sb_score(c, uni, bi, total)) for c in phrases),
        key=lambda t: (-t[1], t[0]),
    )
    return scored[:size]


def test_phrase_suggest_matches_python(model):
    uni, bi, total = py_lm()
    for text in ("the quikc brown fxo", "quack brown fox", "lazy dog"):
        got = phrase_suggest(model, text, size=3).collect()
        exp = py_suggest(text, uni, bi, total, size=3)
        assert [r["suggestion"] for r in got] == [p for p, _ in exp], text
        for r, (_, s) in zip(got, exp):
            assert r["score"] == pytest.approx(round(s, 6), abs=1e-5)


def test_phrase_suggest_corrects_misspelling(model):
    # transposed letters are distance 2 in plain Levenshtein
    got = phrase_suggest(
        model, "the quikc brown fxo", size=1, max_edits=2).collect()
    assert got[0]["suggestion"] == "the quick brown fox"
    uni, bi, total = py_lm()
    exp = py_suggest("the quikc brown fxo", uni, bi, total, size=1,
                     max_edits=2)
    assert got[0]["suggestion"] == exp[0][0]
    assert got[0]["score"] == pytest.approx(round(exp[0][1], 6), abs=1e-5)


def test_phrase_suggest_empty(model):
    assert phrase_suggest(model, "...").count() == 0


# ---------------------------------------------------------------------------
# bm25_explain
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ixdata(spark):
    pdf = corpus.make_pages_pdf(250, seed=23)
    pdf.insert(0, "doc_id", range(len(pdf)))
    sdf = spark.createDataFrame(pdf)
    ix = build_index(spark, sdf, id_col="doc_id", salt_threshold=40)
    ix.postings = ix.postings.persist()
    ix.term_stats = ix.term_stats.persist()
    ix.postings.count()
    return ix, pdf


def test_explain_sums_to_topk_scores(ixdata):
    ix, _ = ixdata
    q = "w00001 w00057 w00003"
    top = bm25_topk(ix, q, k=5).collect()
    exp = bm25_explain(ix, q, k=5).collect()
    by_doc = {}
    for r in exp:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {r["doc_id"] for r in top}
    for t in top:
        rows = by_doc[t["doc_id"]]
        assert sum(r["contribution"] for r in rows) == pytest.approx(
            t["score"], abs=1e-9)
        for r in rows:
            assert r["score"] == pytest.approx(t["score"], abs=1e-9)


def test_explain_components(ixdata):
    ix, pdf = ixdata
    q = "w00001 w00001 w00057"  # repeated term -> qtf 2
    rows = bm25_explain(ix, q, k=3).collect()
    texts = dict(zip(pdf["doc_id"], pdf["text"]))
    dfs = Counter()
    for t in texts.values():
        dfs.update(set(tokenize_py(t)))
    dls = {d: len(tokenize_py(t)) for d, t in texts.items()}
    avgdl = sum(dls.values()) / len(dls)
    for r in rows:
        toks = tokenize_py(texts[r["doc_id"]])
        assert r["tf"] == toks.count(r["term"])
        assert r["dl"] == len(toks)
        assert r["df"] == dfs[r["term"]]
        assert r["idf"] == pytest.approx(
            idf(len(texts), dfs[r["term"]]), abs=1e-12)
        assert r["qtf"] == (2 if r["term"] == "w00001" else 1)
        tfn = r["tf"] / (r["tf"] + K1 * (1 - B + B * r["dl"] / avgdl))
        assert r["contribution"] == pytest.approx(
            r["idf"] * r["qtf"] * tfn, abs=1e-9)


def test_explain_absent_term_only(ixdata):
    ix, _ = ixdata
    assert bm25_explain(ix, "zzznotaterm", k=5).count() == 0


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        ndp = [i]
        for j, cb in enumerate(b, 1):
            ndp.append(min(dp[j] + 1, ndp[-1] + 1,
                           dp[j - 1] + (ca != cb)))
        dp = ndp
    return dp[-1]


def py_term_suggest(text, uni, size=5, max_edits=2, mode="missing"):
    out = {}
    for t in dict.fromkeys(tokenize_py(text)):
        if mode == "missing" and t in uni:
            continue
        cands = []
        for w, n in uni.items():
            if w == t:
                continue
            d = _lev(w, t)
            if d > max_edits:
                continue
            if mode == "popular" and n <= uni.get(t, 0):
                continue
            cands.append((round(1.0 - d / len(t), 6), n, w))
        cands.sort(key=lambda c: (-c[0], -c[1], c[2]))
        out[t] = [(w, s, n) for s, n, w in cands[:size]]
    return out


@pytest.mark.parametrize("mode", ["missing", "popular", "always"])
def test_term_suggest_matches_python(model, mode):
    from siem_on_amazon_opensearch_service_spark.index.suggest import (
        term_suggest,
    )

    uni, _, _ = py_lm()
    text = "quick brawn fux dog"
    got = term_suggest(model, text, size=5, max_edits=2,
                       suggest_mode=mode).collect()
    by_tok = {}
    for r in got:
        by_tok.setdefault(r["token"], []).append(
            (r["suggestion"], r["score"], r["freq"]))
        assert r["rank"] == len(by_tok[r["token"]])
    exp = {t: v for t, v in
           py_term_suggest(text, uni, mode=mode).items() if v}
    assert by_tok == exp
    if mode == "missing":
        # in-vocabulary tokens produce no suggestions
        assert "quick" not in by_tok and "dog" not in by_tok


def test_term_suggest_empty_and_bad_mode(model):
    from siem_on_amazon_opensearch_service_spark.index.suggest import (
        term_suggest,
    )

    assert term_suggest(model, "").count() == 0
    # every token well-spelled in missing mode -> empty
    assert term_suggest(model, "quick brown fox").count() == 0
    with pytest.raises(ValueError):
        term_suggest(model, "x", suggest_mode="sometimes")


# ---------------------------------------------------------------------------
# explain_doc (_explain/{id})
# ---------------------------------------------------------------------------


def test_explain_doc_matches_topk_breakdown(ixdata):
    from siem_on_amazon_opensearch_service_spark.index.query import (
        explain_doc,
    )

    ix, _ = ixdata
    q = "w00001 w00057 w00003"
    top = bm25_explain(ix, q, k=3).collect()
    did = top[0]["doc_id"]
    got = explain_doc(ix, q, did)
    assert got["matched"] and got["_id"] == did
    assert got["score"] == pytest.approx(top[0]["score"], rel=1e-9)
    exp_terms = {(r["term"], r["tf"], r["df"]) for r in top
                 if r["doc_id"] == did}
    assert {(d["term"], d["tf"], d["df"])
            for d in got["details"]} == exp_terms
    for d in got["details"]:
        twin = [r for r in top if r["doc_id"] == did
                and r["term"] == d["term"]][0]
        assert d["contribution"] == pytest.approx(
            twin["contribution"], rel=1e-9)
    assert got["score"] == pytest.approx(
        sum(d["contribution"] for d in got["details"]), rel=1e-12)


def test_explain_doc_non_matching_and_absent(ixdata):
    from siem_on_amazon_opensearch_service_spark.index.query import (
        explain_doc,
    )

    ix, pdf = ixdata
    # a doc that contains none of the query terms
    toks = pdf["text"].str.split()
    missing = next(i for i, ts in enumerate(toks)
                   if "w00001" not in ts and "w00057" not in ts)
    got = explain_doc(ix, "w00001 w00057", missing)
    assert got == {"_id": missing, "matched": False, "score": 0.0,
                   "details": []}
    assert not explain_doc(ix, "zzznotaterm", 0)["matched"]
    assert not explain_doc(ix, "...", 0)["matched"]
