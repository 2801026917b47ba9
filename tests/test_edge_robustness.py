"""Degenerate-input robustness: empty corpus, empty docs, one giant
document, all-identical corpus."""

from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.index import build_index, bm25_topk


def test_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, url string, text string")
    ix = build_index(spark, empty, id_col="doc_id")
    assert ix.n_docs == 0 and ix.avgdl == 0.0
    assert ix.postings.count() == 0
    assert bm25_topk(ix, "anything", k=5).count() == 0


def test_docs_with_no_tokens(spark):
    rows = [(0, "u0", "real words here"), (1, "u1", "...!!!"), (2, "u2", "")]
    ix = build_index(spark, spark.createDataFrame(
        rows, "doc_id long, url string, text string"), id_col="doc_id")
    assert ix.n_docs == 3                       # empty docs still count
    assert ix.avgdl == 1.0                      # 3 tokens / 3 docs
    doclens = {r["doc_id"]: r["doclen"] for r in ix.docs.collect()}
    assert doclens == {0: 3, 1: 0, 2: 0}        # left join fills zero
    got = bm25_topk(ix, "words", k=5).collect()
    assert [r["doc_id"] for r in got] == [0]


def test_one_giant_document(spark):
    # 200k tokens in one doc among small ones: the encoder must stream
    # it (no whole-group materialization beyond the salt-bounded tf
    # rows), tf counts and scores stay exact.
    giant = " ".join(["common"] * 100_000 + ["needle"] + ["filler"] * 100_000)
    rows = [(0, "u0", giant), (1, "u1", "common words"), (2, "u2", "needle in text")]
    ix = build_index(spark, spark.createDataFrame(
        rows, "doc_id long, url string, text string"), id_col="doc_id")
    ts = {r["term"]: (r["df"], r["max_tf"]) for r in ix.term_stats.collect()}
    assert ts["common"] == (2, 100_000)
    assert ts["needle"] == (2, 1)
    got = [r["doc_id"] for r in bm25_topk(ix, "needle", k=2).collect()]
    # the giant doc's huge doclen crushes its per-term score
    assert got == [2, 0]


def test_all_identical_docs(spark):
    rows = [(i, f"u{i}", "same exact words") for i in range(50)]
    ix = build_index(spark, spark.createDataFrame(
        rows, "doc_id long, url string, text string"), id_col="doc_id")
    got = bm25_topk(ix, "exact", k=10).collect()
    # perfect ties -> doc_id ascending, identical scores
    assert [r["doc_id"] for r in got] == list(range(10))
    assert len({round(r["score"], 12) for r in got}) == 1
