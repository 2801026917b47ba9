"""_termvectors: re-analyzed per-doc term stats vs a pure-python
recompute with the same shared tokenizer."""

from collections import Counter

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.termvectors import (
    field_statistics, mterm_vectors, term_vectors,
)

N = 120


@pytest.fixture(scope="module")
def frames(spark):
    pdf = corpus.make_pages_pdf(N, seed=11)
    pdf.insert(0, "doc_id", range(len(pdf)))
    docs = spark.createDataFrame(pdf)
    ix = build_index(spark, docs, id_col="doc_id", salt_threshold=60)
    return docs, ix, pdf


def test_term_vectors_vs_python(frames):
    docs, ix, pdf = frames
    ids = [3, 17, 50]
    got = {(r["doc_id"], r["term"]): r
           for r in term_vectors(docs, ids, ix).collect()}
    # python twin: same tokenizer, 1-based positions, df via scan
    all_toks = {d: tokenize_py(t)
                for d, t in zip(pdf["doc_id"], pdf["text"])}
    df_py = Counter()
    for toks in all_toks.values():
        df_py.update(set(toks))
    want_keys = set()
    for d in ids:
        toks = all_toks[d]
        for term, tf in Counter(toks).items():
            want_keys.add((d, term))
            r = got[(d, term)]
            assert r["tf"] == tf
            assert r["positions"] == [i + 1 for i, t in enumerate(toks)
                                      if t == term]
            assert r["df"] == df_py[term]
    assert set(got) == want_keys


def test_field_statistics(frames):
    docs, ix, pdf = frames
    row = field_statistics(ix).collect()[0]
    all_toks = [tokenize_py(t) for t in pdf["text"]]
    assert row["doc_count"] == N
    assert row["sum_ttf"] == sum(len(t) for t in all_toks)
    df_py = Counter()
    for toks in all_toks:
        df_py.update(set(toks))
    assert row["sum_doc_freq"] == sum(df_py.values())


def test_mterm_alias_and_no_stats(frames):
    docs, ix, _ = frames
    a = sorted(map(tuple, term_vectors(docs, [7], ix).collect()))
    b = sorted(map(tuple, mterm_vectors(docs, [7], ix).collect()))
    assert a == b
    bare = term_vectors(docs, [7]).columns
    assert "df" not in bare
