"""Exact-substring dedup removal: duplicate_spans interval merge and
strip_duplicate_spans vs a pure-Python twin (window hashing, merge,
cut), including overlap/adjacency merging, cross-doc duplicates, and
short-doc/no-dup edges."""

import pytest

from siem_on_amazon_opensearch_service_spark.operators.dedup import (
    duplicate_spans, strip_duplicate_spans,
)

L = 4

SHARED = "alpha bravo charlie delta echo foxtrot"      # 6 tokens
DOCS = [
    # doc 0/1 share a 6-token run -> three L=4 windows each, merging
    # into one [s, s+6) span per doc
    (0, f"intro words {SHARED} tail zero"),
    (1, f"{SHARED} other closing words here"),
    # doc 2: internal repetition (same 4-token window twice)
    (2, "one two three four filler one two three four end"),
    # doc 3: too short for a window
    (3, "tiny doc"),
    # doc 4: no duplicated content
    (4, "unique tokens q w e r t y u i o p"),
]


def _tok(t):
    import re
    return [w for w in re.findall(r"[a-z0-9]+", t.lower()) if w]


def _py_spans(docs, L):
    from collections import Counter
    wins = []
    for i, t in docs:
        ts = _tok(t)
        for p in range(1, len(ts) - L + 2):
            wins.append((i, p, " ".join(ts[p - 1:p - 1 + L])))
    cnt = Counter(w for _, _, w in wins)
    spans = {}
    for i, p, w in wins:
        if cnt[w] >= 2:
            spans.setdefault(i, []).append(p)
    out = {}
    for i, ps in spans.items():
        ivs = []
        for p in sorted(ps):
            if ivs and p <= ivs[-1][1]:
                ivs[-1][1] = max(ivs[-1][1], p + L)
            else:
                ivs.append([p, p + L])
        out[i] = [tuple(v) for v in ivs]
    return out


def _py_strip(docs, L):
    spans = _py_spans(docs, L)
    out = {}
    for i, t in docs:
        ts = _tok(t)
        ivs = spans.get(i, [])
        kept = [w for p, w in enumerate(ts, 1)
                if not any(s <= p < e for s, e in ivs)]
        out[i] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_spans_match_python_twin(docs_df):
    got = {}
    for r in duplicate_spans(docs_df, window=L).collect():
        got.setdefault(r["id"], []).append((r["s"], r["e"]))
    got = {k: sorted(v) for k, v in got.items()}
    assert got == _py_spans(DOCS, L)
    # the shared 6-token run merged into ONE span of 6 tokens per doc
    assert all(len(v) == 1 and v[0][1] - v[0][0] == 6
               for k, v in got.items() if k in (0, 1))
    # internal repetition in doc 2 produced two 4-token spans
    assert [e - s for s, e in got[2]] == [4, 4]


def test_strip_matches_python_twin(docs_df):
    got = {r["id"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
           for r in strip_duplicate_spans(docs_df, window=L).collect()}
    assert got == _py_strip(DOCS, L)
    # untouched docs keep all tokens
    assert got[3][2] == 0 and got[4][2] == 0
    # the shared run is gone from BOTH docs (remove-all policy)
    for i in (0, 1):
        for w in ("alpha", "foxtrot"):
            assert w not in got[i][0].split()


def test_min_count_three_spares_pairs(docs_df):
    spans = duplicate_spans(docs_df, window=L, min_count=3).collect()
    # every duplicated window in the fixture occurs exactly twice
    assert spans == []
