"""Round-4 durability review pins: torn-write detection, upfront
manifest parameters, stale-sidecar hygiene, and the upsert entry
point the tombstones module documents."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F


def _pages(spark, n, tag=""):
    rows = [(f"https://h/{tag}{i}", f"alpha beta doc{tag}{i} " + "gamma " * (i % 3))
            for i in range(n)]
    return spark.createDataFrame(rows, "url string, text string")


def test_incomplete_delta_batch_is_skipped(spark, tmp_path):
    from siem_on_amazon_opensearch_service_spark.streaming.incremental import (
        IncrementalIndexer, complete_batch_dirs, load_incremental)

    path = str(tmp_path / "inc")
    idx = IncrementalIndexer(path, salt_threshold=1000)
    idx.process_batch(_pages(spark, 6, "a"), 0)
    idx.process_batch(_pages(spark, 4, "b"), 1)
    # simulate a crash between the docs and stats writes of batch 1
    shutil.rmtree(os.path.join(path, "delta", "batch=1", "stats"))
    assert len(complete_batch_dirs(path)) == 1
    ix = load_incremental(spark, path)
    # the torn batch's docs must NOT score against understated stats
    assert ix.n_docs == 6
    assert ix.docs.count() == 6


def test_manifest_num_parts_written_before_builds(spark, tmp_path):
    from siem_on_amazon_opensearch_service_spark.plans.checkpoint import (
        checkpointed_build, read_manifest)

    path = str(tmp_path / "ckpt")
    checkpointed_build(spark, _pages(spark, 8), path, num_parts=4)
    m = read_manifest(path)
    assert m["num_parts"] == 4
    # resume with a different partitioning refuses even if we fake an
    # interrupted run by dropping the partition entries (num_parts
    # must have been persisted BEFORE any build dispatched)
    m2 = read_manifest(path)
    m2["partitions"] = {}
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(m2, f)
    with pytest.raises(ValueError, match="num_parts=4"):
        checkpointed_build(spark, _pages(spark, 8), path, num_parts=2)


def test_merge_from_decoded_clears_stale_sidecars(spark, tmp_path):
    from siem_on_amazon_opensearch_service_spark.index import build_index
    from siem_on_amazon_opensearch_service_spark.index.tombstones import (
        compact, delete_docs, load_tombstones)

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    build_index(spark, _pages(spark, 10), salt_threshold=1000) \
        .save(spark, src)
    # dst previously hosted ANOTHER index that had deletes
    build_index(spark, _pages(spark, 5, "old"), salt_threshold=1000) \
        .save(spark, dst)
    delete_docs(spark, dst, [0, 1])
    assert load_tombstones(spark, dst).count() == 2
    # out-of-place compact of src into dst must not inherit them
    out = compact(spark, src, dst, salt_threshold=1000)
    assert load_tombstones(spark, dst).count() == 0
    assert out.n_docs == 10


def test_upsert_docs_masks_old_and_indexes_new(spark, tmp_path):
    from siem_on_amazon_opensearch_service_spark.index.tombstones import (
        live_topk, upsert_docs)
    from siem_on_amazon_opensearch_service_spark.streaming.incremental import (
        IncrementalIndexer, load_incremental)

    path = str(tmp_path / "ups")
    IncrementalIndexer(path, salt_threshold=1000).process_batch(
        _pages(spark, 6), 0)
    # re-ingest url 2 with new content carrying a unique marker token
    new = spark.createDataFrame(
        [("https://h/2", "alpha freshmarker content")],
        "url string, text string")
    res = upsert_docs(spark, path, new, salt_threshold=1000)
    assert res["tombstoned"] == 1 and res["batch_id"] == 1
    ix = load_incremental(spark, path)
    hits = live_topk(ix, spark, path, "freshmarker", k=5).collect()
    assert len(hits) == 1  # the new version matches
    # the OLD version of url 2 (doc2 token) is masked out
    old_hits = live_topk(ix, spark, path, "doc2", k=5).collect()
    assert old_hits == []


def test_load_rotated_detects_torn_rebuild(spark, tmp_path):
    from siem_on_amazon_opensearch_service_spark.index.rotation import (
        build_rotated, load_rotated)

    path = str(tmp_path / "rot")
    rows = [(f"https://h/{i}", f"w{i} text", f"2024-0{1 + i % 2}-15")
            for i in range(8)]
    df = spark.createDataFrame(rows, "url string, text string, ts string") \
        .withColumn("warc_ts", F.to_timestamp("ts")).drop("ts")
    build_rotated(spark, df, path, period="month")
    assert load_rotated(spark, path).n_docs == 8
    # simulate the torn state: batch 0's dir now holds another period
    with open(os.path.join(path, "delta/batch=0", "period.json"), "w") as f:
        json.dump({"label": "2023-12", "period": "month"}, f)
    with pytest.raises(RuntimeError, match="torn"):
        load_rotated(spark, path)
