"""_async_search over a rotated index: shard-at-a-time execution with
a global dfs phase. Pinned properties: (1) the completed search is
rank- and score-identical to one query over the full period union;
(2) a partial response already carries FINAL scores — any final
top-k doc whose period is done appears in the partial with the same
score; (3) step/run/get/delete/expiry lifecycle contracts."""

import math
import time

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import bm25_topk
from siem_on_amazon_opensearch_service_spark.index.asyncsearch import (
    async_delete,
    async_get,
    async_run,
    async_step,
    async_submit,
    list_async,
)
from siem_on_amazon_opensearch_service_spark.index.rotation import (
    build_rotated,
    load_rotated,
)

QUERY = "w00000 w00042 w00007"
K = 10


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    pages = corpus.pages_df(spark, 500, seed=37, partitions=4)
    pages = pages.withColumn(
        "warc_ts",
        F.to_timestamp(
            F.add_months("warc_ts", F.pmod(F.xxhash64("url"), F.lit(3)))
        ),
    )
    pages.persist().count()
    path = str(tmp_path_factory.mktemp("ix_async"))
    periods = build_rotated(spark, pages, path, period="month",
                            salt_threshold=50)
    repo = str(tmp_path_factory.mktemp("async_repo"))
    return path, periods, repo


def _final_expected(spark, path):
    ix = load_rotated(spark, path)
    return bm25_topk(ix, QUERY, k=K).collect()


def test_final_equals_full_range_query(spark, setup):
    path, periods, repo = setup
    sid = async_submit(spark, path, QUERY, repo, k=K)
    status = async_run(spark, repo, sid)
    assert not status["is_running"]
    meta, hits = async_get(spark, repo, sid)
    assert meta["is_partial"] is False and meta["is_running"] is False
    assert meta["shards_done"] == meta["shards_total"] == len(periods)
    got = hits.collect()
    exp = _final_expected(spark, path)
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in exp]
    for g, e in zip(got, exp):
        assert math.isclose(g["score"], e["score"],
                            rel_tol=1e-9, abs_tol=1e-9)


def test_partial_scores_are_final(spark, setup):
    path, periods, repo = setup
    sid = async_submit(spark, path, QUERY, repo, k=K)
    status = async_step(spark, repo, sid)  # exactly one shard
    assert status["is_running"] and len(status["done"]) == 1
    meta, hits = async_get(spark, repo, sid)
    assert meta["is_partial"] and meta["shards_done"] == 1
    partial = {r["doc_id"]: r["score"] for r in hits.collect()}
    done_labels = {p for i, p in status["periods"]
                   if i in set(status["done"])}
    # every FINAL top-k doc living in a done period must already be in
    # the partial with its final score (global dfs stats == no re-rank)
    exp = _final_expected(spark, path)
    from siem_on_amazon_opensearch_service_spark.streaming.incremental import (
        BATCH_SHIFT,
    )

    final_periods = {
        r["doc_id"]: p for r in exp
        for i, p in status["periods"]
        if r["doc_id"] >> BATCH_SHIFT == i
    }
    checked = 0
    for r in exp:
        if final_periods.get(r["doc_id"]) in done_labels:
            assert r["doc_id"] in partial
            assert math.isclose(partial[r["doc_id"]], r["score"],
                                rel_tol=1e-9, abs_tol=1e-9)
            checked += 1
    assert checked > 0  # the invariant actually exercised something
    async_delete(repo, sid)


def test_step_until_done_then_noop(spark, setup):
    path, periods, repo = setup
    sid = async_submit(spark, path, QUERY, repo, k=K)
    for _ in periods:
        async_step(spark, repo, sid)
    status = async_step(spark, repo, sid)  # extra step: no-op
    assert not status["is_running"]
    assert sorted(status["done"]) == sorted(i for i, _ in status["periods"])
    async_delete(repo, sid)


def test_background_thread_completes(spark, setup):
    path, periods, repo = setup
    sid = async_submit(spark, path, QUERY, repo, k=K, background=True)
    deadline = time.time() + 120
    while time.time() < deadline:
        meta, hits = async_get(spark, repo, sid)
        if not meta["is_running"]:
            break
        time.sleep(0.5)
    assert not meta["is_running"], "background runner never finished"
    got = hits.collect()
    exp = _final_expected(spark, path)
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in exp]
    async_delete(repo, sid)


def test_expiry_and_extension(spark, setup):
    path, _, repo = setup
    sid = async_submit(spark, path, QUERY, repo, k=K, keep_alive=10.0,
                       now=100.0)
    async_step(spark, repo, sid)
    # extend from now=105 by 50 -> expires at 155
    async_get(spark, repo, sid, now=105.0, keep_alive=50.0)
    meta, _ = async_get(spark, repo, sid, now=150.0)
    assert meta["expires_at"] == 155.0
    with pytest.raises(ValueError, match="expired"):
        async_get(spark, repo, sid, now=156.0)
    async_delete(repo, sid)


def test_delete_and_list(spark, setup):
    path, _, repo = setup
    sid = async_submit(spark, path, QUERY, repo, k=K)
    assert any(s["id"] == sid for s in list_async(repo))
    async_delete(repo, sid)
    assert all(s["id"] != sid for s in list_async(repo))
    with pytest.raises(KeyError):
        async_get(spark, repo, sid)


def test_absent_term_completes_empty(spark, setup):
    path, _, repo = setup
    sid = async_submit(spark, path, "zzzznotaterm", repo, k=K)
    async_run(spark, repo, sid)
    meta, hits = async_get(spark, repo, sid)
    assert not meta["is_running"]
    assert hits.count() == 0
    async_delete(repo, sid)
