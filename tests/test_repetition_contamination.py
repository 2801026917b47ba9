"""Gopher repetition features and n-gram decontamination vs
pure-Python brute force."""

from collections import Counter

import pytest

from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py
from siem_on_amazon_opensearch_service_spark.operators.contamination import (
    ngram_contamination,
)
from siem_on_amazon_opensearch_service_spark.operators.textstats import (
    repetition_features,
)

DOCS = [
    (0, "alpha beta gamma\nalpha beta gamma\ndelta epsilon\n"),
    (1, "spam spam spam spam spam spam"),
    (2, "one two three four five six seven eight nine ten"),
    (3, "x\n\n  \nx\ny z\n"),
    (4, ""),
    (5, "ab ab cd ab ab cd ab ab"),
]

BENCH = [
    ("one two three four five plus trailing stuff",),
    ("delta epsilon does not matter here",),
]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "text string")
    return docs, bench


def py_repetition(text):
    lines = [s for s in text.split("\n") if s.strip() != ""]
    n_lines = len(lines)
    dist = list(dict.fromkeys(lines))
    lc = sum(len(s) for s in lines)
    dc = sum(len(s) for s in dist)
    dup_line_frac = (n_lines - len(dist)) / n_lines if n_lines else 0.0
    dup_char_frac = (lc - dc) / lc if lc else 0.0
    toks = tokenize_py(text)
    tc = sum(len(t) for t in toks)

    def top_frac(n):
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        if not grams or tc == 0:
            return 0.0
        cnt = Counter(grams)
        # (count, token-chars, gram) max — the struct-max tie-break
        best = max((c, len(g) - (n - 1), g) for g, c in cnt.items())
        return best[0] * best[1] / tc

    return (n_lines, round(dup_line_frac, 6), round(dup_char_frac, 6),
            round(top_frac(2), 6), round(top_frac(3), 6))


def test_repetition_features_match_python(frames):
    docs, _ = frames
    got = {
        r["doc_id"]: (r["n_lines"], r["dup_line_frac"],
                      r["dup_line_char_frac"], r["top_2gram_char_frac"],
                      r["top_3gram_char_frac"])
        for r in repetition_features(docs).collect()
    }
    assert set(got) == {d for d, _ in DOCS}
    for did, text in DOCS:
        assert got[did] == pytest.approx(py_repetition(text), abs=1e-9), did


def test_repetition_flags_spam(frames):
    docs, _ = frames
    got = {r["doc_id"]: r for r in repetition_features(docs).collect()}
    assert got[1]["top_2gram_char_frac"] > 0.8       # 'spam spam' covers
    assert got[0]["dup_line_frac"] == pytest.approx(1 / 3)
    assert got[2]["top_2gram_char_frac"] < 0.3       # no repetition
    assert got[4]["n_lines"] == 0


def py_contamination(n=3):
    bgrams = set()
    for (t,) in BENCH:
        toks = tokenize_py(t)
        bgrams |= {" ".join(toks[i:i + n])
                   for i in range(len(toks) - n + 1)}
    out = {}
    for did, t in DOCS:
        toks = tokenize_py(t)
        grams = {" ".join(toks[i:i + n])
                 for i in range(len(toks) - n + 1)}
        if not grams:
            continue
        hit = len(grams & bgrams)
        out[did] = (len(grams), hit, round(hit / len(grams), 6))
    return out


def test_contamination_matches_python(frames):
    docs, bench = frames
    got = {
        r["doc_id"]: (r["n_grams"], r["n_contaminated"],
                      r["contamination_frac"])
        for r in ngram_contamination(docs, bench, n=3).collect()
    }
    assert got == py_contamination(3)
    # doc 2 shares 'one two three'/'two three four'/'three four five'
    assert got[2][1] == 3
    # doc 1 has grams but zero overlap -> present with 0
    assert got[1][1] == 0
