"""Golden end-to-end: build index on a deterministic corpus, run a
query set, compare rank-identically vs the pure-Python oracle
(SURVEY.md section 5 item 2)."""

import math

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.query import (
    bm25_topk,
    bm25_topk_batch,
)
from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex

N_DOCS = 800


@pytest.fixture(scope="module")
def pages_pdf():
    return corpus.make_pages_pdf(N_DOCS, seed=42)


@pytest.fixture(scope="module")
def oracle(pages_pdf):
    docs = {i: t for i, t in enumerate(pages_pdf["text"])}
    return OracleIndex.build(docs)


@pytest.fixture(scope="module")
def ix(spark, pages_pdf, tmp_path_factory):
    from siem_on_amazon_opensearch_service_spark.index import PostingsIndex

    pdf = pages_pdf.copy()
    pdf.insert(0, "doc_id", range(len(pdf)))
    sdf = spark.createDataFrame(pdf)
    # low salt threshold so salting is exercised at this tiny scale
    built = build_index(spark, sdf, id_col="doc_id", salt_threshold=50)
    # materialize once; every test then reads parquet instead of
    # re-running the build DAG
    path = str(tmp_path_factory.mktemp("ix"))
    built.save(spark, path, buckets=4)
    return PostingsIndex.load(spark, path)


def _assert_rank_identical(got, expected):
    assert len(got) == len(expected), (got, expected)
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gd == ed, (got, expected)
        assert math.isclose(gs, es, rel_tol=1e-9, abs_tol=1e-9)


def test_stats_match_oracle(ix, oracle):
    assert ix.n_docs == oracle.n_docs
    assert math.isclose(ix.avgdl, oracle.avgdl, rel_tol=1e-12)


def test_doclen_match_oracle(ix, oracle):
    got = {r["doc_id"]: r["doclen"] for r in ix.docs.collect()}
    assert got == oracle.doclen


def test_df_match_oracle(ix, oracle):
    got = {r["term"]: r["df"] for r in ix.term_stats.collect()}
    exp = {t: len(p) for t, p in oracle.postings.items()}
    assert got == exp


def test_salting_happened(ix):
    assert ix.postings.filter("salt > 0").count() > 0


def test_postings_sorted_and_complete(ix, oracle):
    """Union over salts == oracle posting list; ids strictly increasing
    per (term, salt) block chain."""
    import numpy as np

    from siem_on_amazon_opensearch_service_spark.codec import (
        delta_decode,
        vb_decode,
    )

    rows = ix.postings.filter("term in ('w00000', 'w00042')").collect()
    by_key = {}
    for r in sorted(rows, key=lambda r: (r["term"], r["salt"], r["block_id"])):
        key = (r["term"], r["salt"])
        ids = delta_decode(vb_decode(r["doc_ids_vb"])).astype(int)
        tfs = vb_decode(r["tfs_vb"]).astype(int)
        assert np.all(np.diff(ids) > 0)
        prev = by_key.setdefault(key, [])
        if prev:
            assert ids[0] > prev[-1][0]
        prev.extend(zip(ids.tolist(), tfs.tolist()))
    for term in ("w00000", "w00042"):
        got = {}
        for (t, _s), pl in by_key.items():
            if t == term:
                got.update(dict(pl))
        assert got == oracle.postings.get(term, {})


@pytest.mark.parametrize(
    "query,k",
    [
        ("w00000", 10),
        ("w00001 w00057", 10),
        ("w00002 w04567 w09999", 5),
        ("W00003 SALT17", 10),          # analyzer must lowercase
        ("zzz_absent_term", 10),         # no hits
        ("w00000 w00000 w00099", 10),    # duplicate query term
    ],
)
def test_single_query_vs_oracle(ix, oracle, query, k):
    got = [(r["doc_id"], r["score"]) for r in bm25_topk(ix, query, k).collect()]
    _assert_rank_identical(got, oracle.search(query, k))


def test_batch_queries_vs_oracle(spark, ix, oracle):
    qpdf = corpus.queries_pdf(n_queries=40, seed=7)
    queries = spark.createDataFrame(qpdf)
    res = bm25_topk_batch(ix, queries).collect()
    by_qid = {}
    for r in res:
        by_qid.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    for _, row in qpdf.iterrows():
        exp = oracle.search(row["query"], int(row["k"]))
        got = sorted(by_qid.get(int(row["qid"]), []))
        assert len(got) == len(exp), row["query"]
        for (rank, gd, gs), (ed, es) in zip(got, exp):
            assert gd == ed, (row["query"], got, exp)
            assert math.isclose(gs, es, rel_tol=1e-9, abs_tol=1e-9)


def test_extract_text_invariant(spark, pages_pdf):
    """input_hint invariant: text extracted from html is byte-identical
    to the text column, via the single shared extraction function."""
    sdf = spark.createDataFrame(pages_pdf)
    bad = sdf.filter(
        corpus.extract_text_col(sdf["html"]) != sdf["text"]
    ).count()
    assert bad == 0
    # python twin agrees
    row = pages_pdf.iloc[0]
    assert corpus.extract_text_py(row["html"]) == row["text"]
