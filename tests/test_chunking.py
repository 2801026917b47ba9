"""Sliding-window document chunking vs a pure-Python twin."""

import re

import pytest

from siem_on_amazon_opensearch_service_spark.operators.packing import (
    chunk_documents,
)

DOCS = [
    (0, " ".join(f"t{i}" for i in range(10))),   # 10 tokens
    (1, "one two three"),                        # shorter than a chunk
    (2, ""),                                     # no tokens -> no chunks
    (3, "Mixed, CASE; tokens! " * 4),            # analyzer normalization
]


def _tok(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _py(docs, chunk, overlap):
    stride = chunk - overlap
    out = []
    for i, t in docs:
        ts = _tok(t)
        # cap: a window starting past len - overlap is a strict subset
        # of its predecessor (which already reaches the end)
        last = max(1, len(ts) - overlap)
        s = 1
        while s <= last and len(ts):
            piece = ts[s - 1:s - 1 + chunk]
            out.append((i, (s - 1) // stride, s, len(piece),
                        " ".join(piece)))
            s += stride
    return sorted(out)


@pytest.mark.parametrize("chunk,overlap", [(4, 0), (4, 2), (6, 5)])
def test_chunks_match_python(spark, chunk, overlap):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        (r["id"], r["chunk_id"], r["start"], r["n_tokens"],
         r["text_chunk"])
        for r in chunk_documents(df, chunk, overlap).collect())
    assert got == _py(DOCS, chunk, overlap)
    assert not any(r[0] == 2 for r in got)  # empty doc emits nothing


def test_bad_overlap_rejected(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, 4, 4)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, 4, -1)


def test_no_chunk_is_contained_in_its_predecessor(spark):
    # the round-4 fix: overlap > 0 used to emit a tail chunk fully
    # covered by the previous window (duplicate training content)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = sorted(
        (r["id"], r["start"], r["n_tokens"])
        for r in chunk_documents(df, 4, 2).collect())
    by_doc = {}
    for i, start, n in rows:
        by_doc.setdefault(i, []).append((start, start + n - 1))
    for spans in by_doc.values():
        for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
            assert e1 > e0, (spans, "contained tail chunk")
