"""Index snapshot/restore (_snapshot repository semantics): restored
state == pre-snapshot state even after destructive live mutations
(delete_by_query + in-place compaction) on the source."""

import os

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex,
    build_index,
)
from siem_on_amazon_opensearch_service_spark.index.docops import (
    delete_by_query,
)
from siem_on_amazon_opensearch_service_spark.index.query import bm25_topk
from siem_on_amazon_opensearch_service_spark.index.tombstones import compact
from siem_on_amazon_opensearch_service_spark.storage import (
    delete_snapshot,
    list_snapshots,
    restore_index,
    snapshot_index,
)

QUERY = "w00001 w00012"


def _topk(spark, path, k=10):
    ix = PostingsIndex.load(spark, path)
    return [(int(r["doc_id"]), round(r["score"], 6))
            for r in bm25_topk(ix, QUERY, k=k).collect()]


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    pdf = corpus.make_pages_pdf(250, seed=31)
    pdf.insert(0, "doc_id", range(len(pdf)))
    path = str(tmp_path_factory.mktemp("snap_src"))
    build_index(spark, spark.createDataFrame(pdf), id_col="doc_id",
                salt_threshold=100).save(spark, path, buckets=4)
    repo = str(tmp_path_factory.mktemp("snap_repo"))
    return path, repo


def test_snapshot_survives_destructive_mutation(spark, setup, tmp_path):
    path, repo = setup
    before = _topk(spark, path)

    man = snapshot_index(path, repo, "gen1")
    assert man["files"] > 0 and "postings" in man["tables"]
    with pytest.raises(ValueError, match="already exists"):
        snapshot_index(path, repo, "gen1")

    # destructive live mutations: tombstone the top hit's docs, then
    # PHYSICALLY drop them via in-place compaction (directory swaps)
    n = delete_by_query(
        spark, path, {"query": {"match": {"text": "w00012"}}})
    assert n > 0
    compact(spark, path, path, salt_threshold=100)
    after = _topk(spark, path)
    assert after != before  # the live index really changed

    # restore into a fresh root: pre-mutation results exactly
    dest = str(tmp_path / "restored")
    man2 = restore_index(repo, "gen1", dest)
    assert man2["snapshot"] == "gen1"
    assert _topk(spark, dest) == before


def test_restore_overwrite_guard_and_listing(spark, setup, tmp_path):
    path, repo = setup
    snapshot_index(path, repo, "gen2")
    snaps = [m["snapshot"] for m in list_snapshots(repo)]
    assert "gen1" in snaps and "gen2" in snaps

    dest = str(tmp_path / "occupied")
    os.makedirs(dest)
    with pytest.raises(ValueError, match="exists"):
        restore_index(repo, "gen2", dest)
    restore_index(repo, "gen2", dest, overwrite=True)
    assert os.path.isdir(os.path.join(dest, "postings"))

    delete_snapshot(repo, "gen2")
    assert "gen2" not in [m["snapshot"] for m in list_snapshots(repo)]
    with pytest.raises(ValueError, match="no snapshot"):
        restore_index(repo, "gen2", str(tmp_path / "x"))
    with pytest.raises(ValueError, match="no snapshot"):
        delete_snapshot(repo, "gen2")
