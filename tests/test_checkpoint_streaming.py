"""Resumable checkpointed builds (lineage + metrics) and streaming
incremental maintenance: results must equal the one-shot batch build."""

import math

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index.query import bm25_topk
from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex
from siem_on_amazon_opensearch_service_spark.plans import checkpoint
from siem_on_amazon_opensearch_service_spark.streaming import (
    IncrementalIndexer, load_incremental, stream_build,
)

N = 300
QUERIES = ["w00000 w00042", "w00001", "w00002 w00003 w07777"]


@pytest.fixture(scope="module")
def pages_pdf():
    return corpus.make_pages_pdf(N, seed=5)


@pytest.fixture(scope="module")
def oracle_by_url(pages_pdf):
    docs = {row.url: row.text for row in pages_pdf.itertuples()}
    keys = sorted(docs)
    ora = OracleIndex.build({i: docs[u] for i, u in enumerate(keys)})
    return ora, keys


def _topk_urls(ix, query, k=10):
    rows = bm25_topk(ix, query, k=k, with_url=True).collect()
    return [(r["url"], round(r["score"], 6)) for r in rows]


def _oracle_topk_urls(oracle_by_url, query, k=10):
    ora, keys = oracle_by_url
    return [(keys[d], round(s, 6)) for d, s in ora.search(query, k)]


def test_checkpointed_build_and_resume(spark, pages_pdf, oracle_by_url, tmp_path):
    path = str(tmp_path / "ckpt")
    sdf = spark.createDataFrame(pages_pdf)
    m1 = checkpoint.checkpointed_build(spark, sdf, path, num_parts=4,
                                       salt_threshold=50)
    assert len(m1["partitions"]) == 4
    assert all(e["status"] == "ok" for e in m1["partitions"].values())
    assert sum(e["n_docs"] for e in m1["partitions"].values()) == N

    # resume: identical source -> every partition is a lineage hit
    m2 = checkpoint.checkpointed_build(spark, sdf, path, num_parts=4,
                                       salt_threshold=50)
    for p in m1["partitions"]:
        assert m2["partitions"][p]["seconds"] == m1["partitions"][p]["seconds"]

    ix = checkpoint.merge(spark, path, salt_threshold=50)
    assert ix.n_docs == N
    for q in QUERIES:
        got = _topk_urls(ix, q)
        exp = _oracle_topk_urls(oracle_by_url, q)
        assert [u for u, _ in got] == [u for u, _ in exp], q
        for (_, a), (_, b) in zip(got, exp):
            assert math.isclose(a, b, abs_tol=1e-6)

    metrics = checkpoint.build_metrics(spark, path).collect()
    assert len(metrics) == 4
    assert all(r["docs_per_sec"] > 0 for r in metrics)
    assert sum(r["n_postings"] for r in metrics) > 0


def test_streaming_incremental_equals_batch(spark, pages_pdf, oracle_by_url,
                                            tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    # two "arriving files" (url + text is all the indexer consumes)
    cols = ["url", "text"]
    pages_pdf.iloc[:150][cols].to_parquet(inp / "a.parquet", index=False)
    pages_pdf.iloc[150:][cols].to_parquet(inp / "b.parquet", index=False)

    ixp = str(tmp_path / "ix")
    schema = "url string, text string"
    q = stream_build(spark, str(inp), ixp, str(tmp_path / "ckpt"),
                     schema, salt_threshold=50)
    q.awaitTermination(120)

    live = load_incremental(spark, ixp)
    assert live.n_docs == N
    for qq in QUERIES:
        got = _topk_urls(live, qq)
        exp = _oracle_topk_urls(oracle_by_url, qq)
        assert [u for u, _ in got] == [u for u, _ in exp], qq
        for (_, a), (_, b) in zip(got, exp):
            assert math.isclose(a, b, abs_tol=1e-6)

    # compaction preserves results exactly
    compacted = IncrementalIndexer(ixp, salt_threshold=50).compact(spark)
    assert compacted.n_docs == N
    for qq in QUERIES:
        assert _topk_urls(compacted, qq) == _topk_urls(live, qq)


def test_batch_idempotent_redelivery(spark, pages_pdf, tmp_path):
    ixp = str(tmp_path / "ix2")
    indexer = IncrementalIndexer(ixp, salt_threshold=50)
    sdf = spark.createDataFrame(pages_pdf.iloc[:50])
    indexer.process_batch(sdf, 0)
    first = load_incremental(spark, ixp)
    # materialize BEFORE redelivery: the overwrite replaces the files
    # the lazy DataFrames point at.
    n1, avg1, np1 = first.n_docs, first.avgdl, first.postings.count()
    indexer.process_batch(sdf, 0)  # redelivery of the same batch id
    again = load_incremental(spark, ixp)
    assert again.n_docs == n1 and again.avgdl == avg1
    assert again.postings.count() == np1
