"""Point-in-time search contexts: a PIT search sees the index exactly
as it was at open time — deletes and physical compaction on the live
index after open do not change PIT results — with keep-alive expiry,
renewal, close, and reaper semantics."""

import os

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.docops import (
    delete_by_query,
)
from siem_on_amazon_opensearch_service_spark.index.pit import (
    close_pit,
    expire_pits,
    list_pits,
    open_pit,
    pit_search,
    pit_topk,
)
from siem_on_amazon_opensearch_service_spark.index.tombstones import (
    compact,
    live_topk,
)
from siem_on_amazon_opensearch_service_spark.index.build import PostingsIndex

QUERY = "w00001 w00012"
T0 = 1000.0


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    pdf = corpus.make_pages_pdf(250, seed=47)
    pdf.insert(0, "doc_id", range(len(pdf)))
    path = str(tmp_path_factory.mktemp("pit_src"))
    build_index(spark, spark.createDataFrame(pdf), id_col="doc_id",
                salt_threshold=100).save(spark, path, buckets=4)
    repo = str(tmp_path_factory.mktemp("pit_repo"))
    return path, repo


def _rows(df):
    return [(int(r["doc_id"]), round(r["score"], 6)) for r in df.collect()]


def test_pit_pins_view_across_destructive_mutation(
        spark, setup, tmp_path_factory):
    src, repo = setup
    # destructive test: own copy, so the module fixture stays pristine
    import shutil
    path = str(tmp_path_factory.mktemp("pit_mut")) + "/ix"
    shutil.copytree(src, path)
    ix0 = PostingsIndex.load(spark, path)
    before = _rows(live_topk(ix0, spark, path, QUERY, k=10))

    pid = open_pit(path, repo, now=T0, keep_alive_s=60.0)
    assert pid.startswith("pit-")

    # live mutations after open: tombstone + PHYSICAL rewrite
    n = delete_by_query(
        spark, path, {"query": {"match": {"text": "w00012"}}})
    assert n > 0
    compact(spark, path, path, salt_threshold=100)

    live_after = _rows(live_topk(PostingsIndex.load(spark, path),
                                 spark, path, QUERY, k=10))
    assert live_after != before

    # the PIT still answers with the open-time view
    assert _rows(pit_topk(spark, repo, pid, QUERY, now=T0 + 30, k=10)) \
        == before

    # full _search bodies route through the same frozen handle
    res = pit_search(spark, repo, pid,
                     {"query": {"match": {"text": "w00012"}},
                      "size": 5}, now=T0 + 30)
    assert res["hits"].count() == 5
    close_pit(repo, pid)


def test_keep_alive_expiry_renewal_and_reaper(spark, setup):
    path, repo = setup
    pid = open_pit(path, repo, now=T0, keep_alive_s=10.0)

    # expired → error
    with pytest.raises(ValueError, match="expired"):
        pit_topk(spark, repo, pid, QUERY, now=T0 + 11)

    # a search that passes keep_alive renews the lease
    pid2 = open_pit(path, repo, now=T0 + 1, keep_alive_s=10.0)
    assert pid2 != pid
    pit_topk(spark, repo, pid2, QUERY, now=T0 + 9, keep_alive_s=10.0)
    _rows(pit_topk(spark, repo, pid2, QUERY, now=T0 + 15))  # renewed

    metas = {m["pit_id"]: m for m in list_pits(repo)}
    assert metas[pid2]["expires"] == T0 + 19

    # reaper closes only lapsed contexts
    closed = expire_pits(repo, now=T0 + 12)
    assert pid in closed and pid2 not in closed
    assert not os.path.isdir(os.path.join(repo, pid))
    with pytest.raises(ValueError, match="no PIT"):
        pit_topk(spark, repo, pid, QUERY, now=T0 + 12)
    close_pit(repo, pid2)
    assert list_pits(repo) == []


def test_pit_search_after_pagination_stable_under_mutation(
        spark, setup, tmp_path_factory):
    """The canonical OpenSearch deep-pagination pattern: PIT +
    search_after.  Pages concatenate to the full ranked list with no
    gaps or repeats, even when docs are deleted MID-pagination."""
    path, _ = setup
    # fresh copy so this test's delete doesn't disturb module peers
    import shutil
    work = str(tmp_path_factory.mktemp("pit_page")) + "/ix"
    shutil.copytree(path, work)
    repo = str(tmp_path_factory.mktemp("pit_page_repo"))

    pid = open_pit(work, repo, now=T0, keep_alive_s=600.0)
    full = _rows(pit_topk(spark, repo, pid, QUERY, now=T0 + 1, k=10_000))

    pages, cursor, n = [], None, 0
    body = {"query": {"match": {"text": QUERY}}, "size": 7}
    while True:
        b = dict(body) if cursor is None else dict(body,
                                                   search_after=cursor)
        rows = pit_search(spark, repo, pid, b, now=T0 + 2 + n,
                          keep_alive_s=600.0)["hits"].collect()
        if not rows:
            break
        pages.extend((int(r["doc_id"]), round(float(r["score"]), 6))
                     for r in rows)
        cursor = [rows[-1]["score"], rows[-1]["doc_id"]]
        n += 1
        if n == 2:   # delete a doc on the LIVE index mid-pagination
            deleted = delete_by_query(
                spark, work, {"query": {"match": {"text": "w00012"}}})
            assert deleted > 0
    assert pages == full
    assert n >= 3  # really paginated
    close_pit(repo, pid)
