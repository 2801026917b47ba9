"""Round-5 regression pins for the advisor findings: upsert crash
ordering (index-first, tombstone-second), in-place compact crash
recovery via the fixed `.old` suffix, function_score score_mode=avg
with all-zero weights, and mixture_rates with falsy/mixed stratum
keys."""

import os

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex,
    bm25_topk,
    build_index,
)


def _pages(spark, n, tag=""):
    rows = [(f"https://h/{tag}{i}",
             f"alpha beta doc{tag}{i} " + "gamma " * (i % 3))
            for i in range(n)]
    return spark.createDataFrame(rows, "url string, text string")


def test_upsert_crash_after_batch_keeps_a_live_version(
        spark, tmp_path, monkeypatch):
    """A crash BETWEEN the new delta landing and the tombstone append
    must degrade to duplicate visible versions (at-least-once), never
    to a url with no live version — the old tombstone-first order lost
    the url entirely when process_batch died."""
    from siem_on_amazon_opensearch_service_spark import storage
    from siem_on_amazon_opensearch_service_spark.index.tombstones import (
        live_topk, upsert_docs)
    from siem_on_amazon_opensearch_service_spark.streaming.incremental import (
        IncrementalIndexer, load_incremental)

    path = str(tmp_path / "ups")
    IncrementalIndexer(path, salt_threshold=1000).process_batch(
        _pages(spark, 6), 0)
    new = spark.createDataFrame(
        [("https://h/2", "alpha freshmarker content")],
        "url string, text string")

    real_append = storage.ParquetStore.append

    def crashing_append(self, df, table):
        if table == "tombstones":
            raise RuntimeError("injected crash before tombstone append")
        return real_append(self, df, table)

    monkeypatch.setattr(storage.ParquetStore, "append", crashing_append)
    with pytest.raises(RuntimeError, match="injected crash"):
        upsert_docs(spark, path, new, salt_threshold=1000)
    monkeypatch.setattr(storage.ParquetStore, "append", real_append)

    ix = load_incremental(spark, path)
    # the OLD version survived the crash (no silent loss) ...
    assert len(live_topk(ix, spark, path, "doc2", k=5).collect()) == 1
    # ... and the new version is already indexed (duplicate visible)
    assert len(live_topk(ix, spark, path, "freshmarker", k=5).collect()) == 1
    # the retry heals to exactly-one-live: it tombstones BOTH stale
    # versions (the re-run re-indexes, then masks every prior id)
    res = upsert_docs(spark, path, new, salt_threshold=1000)
    assert res["tombstoned"] == 2
    ix2 = load_incremental(spark, path)
    assert live_topk(ix2, spark, path, "doc2", k=5).collect() == []
    assert len(live_topk(ix2, spark, path, "freshmarker", k=5)
               .collect()) == 1


def test_compact_inplace_recovers_from_crash_window(spark, tmp_path):
    """Simulate a crash between the two swap renames: path is gone and
    the only copy sits under the FIXED '.old' suffix. The next
    compact() must restore it and complete normally."""
    from siem_on_amazon_opensearch_service_spark.index.tombstones import (
        compact, delete_docs, load_tombstones)

    pdf = corpus.make_pages_pdf(120, seed=31)
    pdf.insert(0, "doc_id", range(len(pdf)))
    path = str(tmp_path / "ix")
    build_index(spark, spark.createDataFrame(pdf), id_col="doc_id",
                salt_threshold=50).save(spark, path, buckets=2)
    delete_docs(spark, path, [0, 1])

    # crash state: first rename done, second not
    os.rename(path, path + ".old")
    assert not os.path.exists(path)

    cix = compact(spark, path, path, salt_threshold=50)
    assert os.path.isdir(path) and not os.path.isdir(path + ".old")
    assert load_tombstones(spark, path).count() == 0
    survivors = {int(r["doc_id"])
                 for r in cix.docs.select("doc_id").collect()}
    assert survivors == set(range(2, 120))


def test_compact_inplace_drops_stale_old_dir_when_path_intact(
        spark, tmp_path):
    """Crash AFTER the second rename but before the rmtree leaves both
    path and '.old'; the next compact treats '.old' as debris."""
    from siem_on_amazon_opensearch_service_spark.index.tombstones import (
        compact)

    pdf = corpus.make_pages_pdf(60, seed=33)
    pdf.insert(0, "doc_id", range(len(pdf)))
    path = str(tmp_path / "ix")
    build_index(spark, spark.createDataFrame(pdf), id_col="doc_id",
                salt_threshold=50).save(spark, path, buckets=2)
    os.makedirs(path + ".old/docs")  # stale debris from a done compact
    cix = compact(spark, path, path, salt_threshold=50)
    assert not os.path.isdir(path + ".old")
    assert cix.docs.count() == 60


def test_function_score_avg_all_zero_weights_scores_zero(spark):
    """score_mode=avg with every applicable weight 0 is a legitimate
    neutralize-everything configuration: OpenSearch yields factor 0,
    not NULL (or DIVIDE_BY_ZERO under ANSI)."""
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_hits)

    rows = [(i, f"u{i}", "alpha beta " + ("gamma " * (i % 4)),
             "en" if i % 2 == 0 else "de")
            for i in range(20)]
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, text string, lang string")
    ix = build_index(spark, docs, id_col="doc_id", salt_threshold=50)
    body = {"query": {"function_score": {
        "query": {"match": {"text": "gamma"}},
        "functions": [
            {"filter": {"term": {"lang": "en"}}, "weight": 0.0},
            {"filter": {"term": {"lang": "de"}}, "weight": 0.0},
        ],
        "score_mode": "avg",
        "boost_mode": "multiply",
    }}, "size": 50}
    got = search_hits(ix, body).select("doc_id", "score").collect()
    assert got, "sanity: the base query matches"
    for r in got:
        assert r["score"] == 0.0  # factor 0, never NULL


def test_mixture_rates_accepts_falsy_and_mixed_keys():
    from siem_on_amazon_opensearch_service_spark.operators.packing import (
        mixture_rates)

    # integer keys including falsy 0 (the old `k or ""` remap made
    # this compare "" against ints and raised TypeError)
    rates = mixture_rates({0: 40, 1: 40, 2: 20}, budget=50)
    assert set(rates) == {0, 1, 2} and all(0 < v <= 1 for v in rates.values())
    # mixed str/None keys still deterministic
    r2 = mixture_rates({None: 10, "en": 80, "de": 10}, budget=50)
    assert set(r2) == {None, "en", "de"}
