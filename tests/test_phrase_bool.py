"""Phrase (positional) and boolean queries vs a pure-Python brute
force over the same corpus."""

import math
import re

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.bm25 import B, K1, idf
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.boolquery import (
    bool_topk, search_facets,
)
from siem_on_amazon_opensearch_service_spark.index.positional import (
    build_positional_index, phrase_topk,
)

N = 300


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


@pytest.fixture(scope="module")
def data(spark):
    pdf = corpus.make_pages_pdf(N, seed=13)
    pdf.insert(0, "doc_id", range(len(pdf)))
    sdf = spark.createDataFrame(pdf)
    return pdf, sdf


@pytest.fixture(scope="module")
def pix(spark, data):
    _, sdf = data
    ix = build_positional_index(spark, sdf, id_col="doc_id",
                                salt_threshold=40)
    ix.postings = ix.postings.persist()
    ix.postings.count()
    return ix


@pytest.fixture(scope="module")
def fix(spark, data):
    _, sdf = data
    ix = build_index(spark, sdf, id_col="doc_id", salt_threshold=40)
    ix.postings = ix.postings.persist()
    ix.term_stats = ix.term_stats.persist()
    ix.postings.count()
    return ix


def _find_phrase(pdf):
    """An adjacent token pair occurring in several docs."""
    from collections import Counter

    c = Counter()
    for text in pdf["text"]:
        tk = _toks(text)
        for a, b in set(zip(tk, tk[1:])):
            c[(a, b)] += 1
    (a, b), n = c.most_common(1)[0]
    assert n >= 3
    return f"{a} {b}"


def _py_phrase_scores(pdf, phrase, k):
    terms = phrase.split()
    docs = {r.doc_id: _toks(r.text) for r in pdf.itertuples()}
    n_docs = len(docs)
    dls = {d: len(t) for d, t in docs.items()}
    avgdl = sum(dls.values()) / n_docs
    dfs = {
        t: sum(1 for tk in docs.values() if t in tk) for t in set(terms)
    }
    idf_sum = sum(idf(n_docs, dfs[t]) for t in terms)
    out = []
    for d, tk in docs.items():
        ptf = sum(
            1 for i in range(len(tk) - len(terms) + 1)
            if tk[i:i + len(terms)] == terms
        )
        if ptf:
            s = idf_sum * ptf / (
                ptf + K1 * (1 - B + B * dls[d] / avgdl)
            )
            out.append((d, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def test_phrase_topk_matches_python(data, pix):
    pdf, _ = data
    phrase = _find_phrase(pdf)
    got = [(r["doc_id"], r["score"]) for r in phrase_topk(pix, phrase, k=10).collect()]
    exp = _py_phrase_scores(pdf, phrase, 10)
    assert [d for d, _ in got] == [d for d, _ in exp], phrase
    for (_, a), (_, b) in zip(got, exp):
        assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)


def _py_phrase_prefix_scores(pdf, exact, prefix, k):
    docs = {r.doc_id: _toks(r.text) for r in pdf.itertuples()}
    n_docs = len(docs)
    dls = {d: len(t) for d, t in docs.items()}
    avgdl = sum(dls.values()) / n_docs
    dfs = {t: sum(1 for tk in docs.values() if t in tk) for t in set(exact)}
    union_df = sum(
        1 for tk in docs.values() if any(t.startswith(prefix) for t in tk)
    )
    if union_df == 0:
        return []
    idf_sum = sum(idf(n_docs, dfs[t]) for t in exact) + idf(n_docs, union_df)
    n = len(exact) + 1
    out = []
    for d, tk in docs.items():
        ptf = sum(
            1 for i in range(len(tk) - n + 1)
            if tk[i:i + n - 1] == exact and tk[i + n - 1].startswith(prefix)
        )
        if ptf:
            s = idf_sum * ptf / (ptf + K1 * (1 - B + B * dls[d] / avgdl))
            out.append((d, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def test_phrase_prefix_matches_python(data, pix):
    from siem_on_amazon_opensearch_service_spark.index.positional import (
        phrase_prefix_topk,
    )

    pdf, _ = data
    a, b = _find_phrase(pdf).split()
    exact, prefix = [a], b[:3]  # "a bxx*": widen the last slot
    got = [(r["doc_id"], r["score"]) for r in
           phrase_prefix_topk(pix, f"{a} {prefix}", k=10).collect()]
    exp = _py_phrase_prefix_scores(pdf, exact, prefix, 10)
    assert [d for d, _ in got] == [d for d, _ in exp], (a, prefix)
    for (_, x), (_, y) in zip(got, exp):
        assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)


def test_phrase_prefix_no_expansion(data, pix):
    from siem_on_amazon_opensearch_service_spark.index.positional import (
        phrase_prefix_topk,
    )

    assert phrase_prefix_topk(pix, "w00000 zzzzz", k=5).count() == 0


def test_phrase_absent_and_single(data, pix):
    pdf, _ = data
    assert phrase_topk(pix, "zzz yyy", k=5).count() == 0
    # single-word "phrase" == that word's postings
    got = phrase_topk(pix, "w00000", k=5).collect()
    assert len(got) == 5


def test_bool_topk_matches_python(data, fix):
    pdf, _ = data
    must, should, must_not = ["w00001", "w00002"], ["w00010"], ["w00000"]
    docs = {r.doc_id: _toks(r.text) for r in pdf.itertuples()}
    n_docs = len(docs)
    dls = {d: len(t) for d, t in docs.items()}
    avgdl = sum(dls.values()) / n_docs
    scoring = must + should
    dfs = {t: sum(1 for tk in docs.values() if t in tk) for t in scoring}
    exp = []
    for d, tk in docs.items():
        s = set(tk)
        if not all(m in s for m in must):
            continue
        if any(x in s for x in must_not):
            continue
        score = sum(
            idf(n_docs, dfs[t]) * tk.count(t)
            / (tk.count(t) + K1 * (1 - B + B * dls[d] / avgdl))
            for t in scoring if t in s
        )
        exp.append((d, score))
    exp.sort(key=lambda x: (-x[1], x[0]))
    exp = exp[:10]

    got = [
        (r["doc_id"], r["score"])
        for r in bool_topk(fix, must=must, should=should,
                           must_not=must_not, k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)


def test_facets_match_python(data, fix):
    pdf, _ = data
    q = "w00000 w00005"
    out = search_facets(fix, q, ["lang"], k=5)
    hits = out["hits"].collect()
    assert 0 < len(hits) <= 5
    got = {(r["lang"], r["n"]) for r in out["facet:lang"].collect()}
    qt = set(q.split())
    from collections import Counter

    c = Counter(
        r.lang for r in pdf.itertuples() if qt & set(_toks(r.text))
    )
    assert got == {(lang, n) for lang, n in c.most_common(10)}


# ---------------------------------------------------------------------------
# proximity (sloppy phrase)
# ---------------------------------------------------------------------------


def _brute_proximity(pdf, phrase, slop):
    """Reference: ordered position tuples, total gap <= slop, weight
    1/(1+gap), BM25 over the summed sloppy frequency."""
    terms = _toks(phrase)
    n = len(terms)
    toks = {r.doc_id: _toks(r.text) for r in pdf.itertuples()}
    dls = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dls.values()) / len(toks)
    dfs = {t: sum(1 for tk in toks.values() if t in tk)
           for t in set(terms)}
    if any(dfs[t] == 0 for t in terms):
        return {}
    idf_sum = sum(idf(len(toks), dfs[t]) for t in terms)
    out = {}
    for d, tk in toks.items():
        pos = {t: [i for i, x in enumerate(tk) if x == t]
               for t in set(terms)}
        ptf = 0.0

        def rec(i, prev, p0):
            nonlocal ptf
            if i == n:
                ptf += 1.0 / (1.0 + (prev - p0) - (n - 1))
                return
            for p in pos[terms[i]]:
                if prev < p <= p0 + (n - 1) + slop:
                    rec(i + 1, p, p0)

        for p in pos[terms[0]]:
            rec(1, p, p)
        if ptf > 0:
            dl = dls[d]
            out[d] = idf_sum * ptf / (
                ptf + K1 * (1 - B + B * dl / avgdl))
    return out


def test_proximity_matches_python(data, pix):
    from siem_on_amazon_opensearch_service_spark.index.positional import (
        proximity_scores,
    )

    pdf, _ = data
    t1, t2 = _find_phrase(pdf).split()
    for phrase, slop in [(f"{t1} {t2}", 3), (f"{t2} {t1}", 5),
                         (f"{t1} {t2} {t1}", 6), (f"{t1} {t1}", 2)]:
        got = {r["doc_id"]: r["score"]
               for r in proximity_scores(pix, phrase, slop).collect()}
        want = _brute_proximity(pdf, phrase, slop)
        assert set(got) == set(want), (phrase, slop)
        for d in got:
            assert got[d] == pytest.approx(want[d], abs=1e-9)


def test_proximity_slop0_is_exact_phrase(data, pix):
    from siem_on_amazon_opensearch_service_spark.index.positional import (
        phrase_scores, proximity_scores,
    )

    pdf, _ = data
    t1, t2 = _find_phrase(pdf).split()
    a = {r["doc_id"]: r["score"]
         for r in proximity_scores(pix, f"{t1} {t2}", 0).collect()}
    b = {r["doc_id"]: r["score"]
         for r in phrase_scores(pix, f"{t1} {t2}").collect()}
    assert set(a) == set(b) and len(a) > 0
    for d in a:
        assert a[d] == pytest.approx(b[d], abs=1e-9)


def test_querystring_phrase_slop(data, pix, fix):
    """'"a b"~N' routes through proximity_scores with the slop (and a
    boost suffix still applies)."""
    from siem_on_amazon_opensearch_service_spark.index.positional import (
        proximity_scores,
    )
    from siem_on_amazon_opensearch_service_spark.index.querystring import (
        parse_query_string, query_string_topk,
    )

    pdf, _ = data
    t1, t2 = _find_phrase(pdf).split()
    g = parse_query_string(f'"{t1} {t2}"~4^2')
    (occ, leaf), = g.clauses
    assert leaf.kind == "phrase" and leaf.slop == 4 and leaf.boost == 2.0
    got = query_string_topk(fix, f'"{t1} {t2}"~4^2', k=15,
                            positional_ix=pix).collect()
    want = sorted(
        ((d, 2.0 * s)
         for d, s in _brute_proximity(pdf, f"{t1} {t2}", 4).items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:15]
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-9)


def test_dl_distance_matches_duckdb():
    import duckdb

    from siem_on_amazon_opensearch_service_spark.index.boolquery import (
        dl_distance,
    )

    pairs = [("ab", "ba"), ("table", "tbale"), ("ca", "abc"),
             ("kitten", "sitting"), ("", "abc"), ("same", "same"),
             ("transpose", "transpsoe"), ("w0001", "w0010")]
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute(
            "SELECT damerau_levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert dl_distance(a, b) == want, (a, b)


def test_fuzzy_matches_transposition(spark):
    """'tbale'~1 must match docs containing 'table' (one transposition
    = one edit, the Lucene transpositions:true default) — plain
    Levenshtein would need 2 edits and miss it."""
    from siem_on_amazon_opensearch_service_spark.index import build_index
    from siem_on_amazon_opensearch_service_spark.index.boolquery import (
        fuzzy_topk,
    )

    df = spark.createDataFrame(
        [(0, "the table is set"), (1, "a chair and nothing else"),
         (2, "tables everywhere")],
        "doc_id long, text string")
    ix = build_index(spark, df, id_col="doc_id")
    got = {r["doc_id"] for r in fuzzy_topk(ix, "tbale", k=10,
                                           max_edits=1).collect()}
    assert 0 in got        # 'table' via transposition (DL=1)
    assert 1 not in got
