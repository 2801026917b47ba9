"""Property tests: duplicate_spans / strip_duplicate_spans and
chunk_documents invariants on randomized corpora (small alphabet so
cross-doc duplicate runs are common)."""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from siem_on_amazon_opensearch_service_spark.operators.dedup import (
    duplicate_spans, strip_duplicate_spans,
)
from siem_on_amazon_opensearch_service_spark.operators.packing import (
    chunk_documents,
)

L = 3
WORDS = ["aa", "bb", "cc", "dd"]

corpus_st = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=2, max_size=8)


def _tok(t):
    return [w for w in re.findall(r"[a-z0-9]+", t.lower()) if w]


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(corpus_st)
def test_span_and_strip_invariants(spark, docs_tokens):
    docs = [(i, " ".join(ts)) for i, ts in enumerate(docs_tokens)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    spans = {}
    for r in duplicate_spans(df, window=L).collect():
        spans.setdefault(r["id"], []).append((r["s"], r["e"]))

    # corpus-wide window counts (the ground truth)
    from collections import Counter
    wins = Counter()
    per_doc = {}
    for i, ts in enumerate(docs_tokens):
        ws = [tuple(ts[p:p + L]) for p in range(len(ts) - L + 1)]
        per_doc[i] = ws
        wins.update(ws)

    for i, ivs in spans.items():
        ivs = sorted(ivs)
        n = len(docs_tokens[i])
        for (s, e), nxt in zip(ivs, ivs[1:] + [None]):
            assert 1 <= s < e <= n + 1 and e - s >= L
            if nxt is not None:
                assert nxt[0] > e   # merged: disjoint, non-adjacent
    # completeness + tightness: position p is inside a span IFF it is
    # covered by some duplicated window
    for i, ws in per_doc.items():
        covered = set()
        for p, w in enumerate(ws, 1):
            if wins[w] >= 2:
                covered.update(range(p, p + L))
        in_spans = set()
        for s, e in spans.get(i, []):
            in_spans.update(range(s, e))
        assert in_spans == covered, (i, docs_tokens[i])

    # strip consistency: removed == covered, kept text re-joins the
    # surviving tokens in order
    got = {r["id"]: r for r in strip_duplicate_spans(df, window=L)
           .collect()}
    for i, ts in enumerate(docs_tokens):
        covered = set()
        for s, e in spans.get(i, []):
            covered.update(range(s, e))
        r = got[i]
        assert r["n_tokens"] == len(ts)
        assert r["n_removed"] == len(covered)
        want = " ".join(t for p, t in enumerate(ts, 1)
                        if p not in covered)
        assert r["text_clean"] == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(corpus_st, st.integers(2, 5), st.integers(0, 3))
def test_chunk_invariants(spark, docs_tokens, chunk, overlap):
    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    docs = [(i, " ".join(ts)) for i, ts in enumerate(docs_tokens)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = chunk_documents(df, chunk, overlap).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    for i, ts in enumerate(docs_tokens):
        got = sorted(by_doc.get(i, []), key=lambda r: r["start"])
        if not ts:
            assert not got
            continue
        # starts advance by stride from 1, capped at max(1, n-overlap):
        # a window starting later is a strict subset of its
        # predecessor (the round-4 contained-tail fix)
        last = max(1, len(ts) - overlap)
        assert [r["start"] for r in got] == [
            s for s in range(1, len(ts) + 1, stride) if s <= last]
        seen = []
        for r in got:
            piece = ts[r["start"] - 1:r["start"] - 1 + chunk]
            assert r["text_chunk"] == " ".join(piece)
            assert r["n_tokens"] == len(piece)
            seen.extend(range(r["start"], r["start"] + len(piece)))
        assert set(seen) == set(range(1, len(ts) + 1))
        # consecutive chunks share exactly `overlap` positions (except
        # a short tail)
        for a, b in zip(got, got[1:]):
            shared = (a["start"] + a["n_tokens"]) - b["start"]
            assert shared == min(overlap, a["n_tokens"] - stride) \
                or a["n_tokens"] < chunk
