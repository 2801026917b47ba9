"""Percolator and significant_text vs pure-Python brute force."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py
from siem_on_amazon_opensearch_service_spark.operators.aggs import (
    significant_text,
)
from siem_on_amazon_opensearch_service_spark.operators.percolate import (
    percolate,
)

DOCS = [
    (0, "error timeout connecting to database primary"),
    (1, "user login success from console"),
    (2, "error disk full on data node"),
    (3, "login failure invalid password for admin user"),
    (4, "scheduled backup completed without error"),
    (5, "database replica lag warning"),
    (6, "admin password reset requested"),
    (7, "timeout error error timeout retry"),
]

RULES = [
    ("r_db_err", "database error", "and", 0),
    ("r_login", "login failure success", "or", 1),
    ("r_admin", "admin password", "and", 0),
    ("r_two_of", "error timeout disk", "or", 2),
    ("r_nomatch", "kubernetes pod evicted", "and", 0),
]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rules = spark.createDataFrame(
        RULES, "query_id string, query string, operator string, msm int")
    return docs, rules


def py_percolate():
    out = set()
    for did, text in DOCS:
        toks = set(tokenize_py(text))
        for qid, q, op, msm in RULES:
            qt = set(tokenize_py(q))
            hit = len(toks & qt)
            if (op == "and" and hit == len(qt)) or (
                    op == "or" and hit >= msm):
                out.add((did, qid, hit, len(qt)))
    return out


def test_percolate_matches_python(frames):
    docs, rules = frames
    got = {
        (r["doc_id"], r["query_id"], r["n_matched"], r["n_terms"])
        for r in percolate(docs, rules).collect()
    }
    assert got == py_percolate()
    # sanity on the fixture: every rule type actually fires somewhere
    fired = {q for _, q, _, _ in got}
    assert "r_db_err" in fired and "r_two_of" in fired
    assert "r_nomatch" not in fired


def test_percolate_and_requires_all(frames):
    docs, rules = frames
    got = {(r["doc_id"], r["query_id"])
           for r in percolate(docs, rules).collect()}
    # doc 5 has 'database' but not 'error' -> r_db_err must NOT fire
    assert (5, "r_db_err") not in got
    assert (0, "r_db_err") in got


def test_percolate_repeated_terms_count_once(frames):
    docs, rules = frames
    got = {(r["doc_id"], r["query_id"]): r["n_matched"]
           for r in percolate(docs, rules).collect()}
    # doc 7 repeats error/timeout; distinct matching terms == 2
    assert got[(7, "r_two_of")] == 2


def test_significant_text_vs_python(frames):
    docs, _ = frames
    fg = F.col("text").contains("error")
    got = significant_text(docs, "text", fg, size=5).collect()

    fg_docs = [t for _, t in DOCS if "error" in t]
    fg_total, bg_total = len(fg_docs), len(DOCS)
    fgc, bgc = Counter(), Counter()
    for _, t in DOCS:
        for w in set(tokenize_py(t)):
            bgc[w] += 1
            if "error" in t:
                fgc[w] += 1
    exp = []
    for w, bg in bgc.items():
        fgp = fgc[w] / fg_total
        bgp = bg / bg_total
        if fgc[w] >= 1 and fgp > bgp:
            exp.append((w, fgc[w], bg, (fgp - bgp) * (fgp / bgp)))
    exp.sort(key=lambda t: (-t[3], t[0]))
    assert [(r["term"], r["fg_count"], r["bg_count"]) for r in got] == [
        (w, f, b) for w, f, b, _ in exp[:5]]
    for r, (_, _, _, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, abs=1e-12)
    # 'error' itself is maximally significant
    assert got[0]["term"] == "error"


def test_percolate_query_strings(spark):
    """Full query_string rules against a doc batch: one projection,
    results match a per-doc python evaluation."""
    from siem_on_amazon_opensearch_service_spark.operators.percolate import (
        percolate_query_strings,
    )

    rows = [
        (0, "error timeout in the backend service", "prod"),
        (1, "all good here nothing to see", "prod"),
        (2, "error but only in staging tests", "staging"),
        (3, "unauthorized operation denied access", "prod"),
        (4, "the quick brown fox", "dev"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "env string")
    rules = [
        ("r1", "error AND NOT env:staging"),
        ("r2", "unauthor* OR denied"),
        ("r3", 'env:(prod OR dev) AND "quick brown"'),
        ("r4", "env:* AND NOT error"),
    ]
    got = sorted((r["doc_id"], r["query_id"])
                 for r in percolate_query_strings(docs, rules).collect())
    want = sorted([
        (0, "r1"),
        (3, "r2"),
        (4, "r3"),
        (1, "r4"), (3, "r4"), (4, "r4"),
    ])
    assert got == want

    # plan shape: no join, one projection
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        percolate_query_strings(docs, rules).explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan and "Exchange" not in plan
