"""Classic _scroll contexts: pages concatenate to the full ranked
list, survive live-index mutation (PIT-pinned), renew/expire, and
close cleanly."""

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.docops import (
    delete_by_query,
)
from siem_on_amazon_opensearch_service_spark.index.pit import list_pits
from siem_on_amazon_opensearch_service_spark.index.scroll import (
    close_scroll,
    open_scroll,
    scroll_next,
)
from siem_on_amazon_opensearch_service_spark.index.tombstones import (
    live_topk,
)
from siem_on_amazon_opensearch_service_spark.index.build import PostingsIndex

QUERY = "w00001 w00012"
T0 = 5000.0
BODY = {"query": {"match": {"text": QUERY}}}


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    pdf = corpus.make_pages_pdf(250, seed=11)
    pdf.insert(0, "doc_id", range(len(pdf)))
    path = str(tmp_path_factory.mktemp("scr_src"))
    build_index(spark, spark.createDataFrame(pdf), id_col="doc_id",
                salt_threshold=100).save(spark, path, buckets=4)
    repo = str(tmp_path_factory.mktemp("scr_repo"))
    return path, repo


def _rows(df):
    return [(int(r["doc_id"]), round(float(r["score"]), 6))
            for r in df.collect()]


def test_scroll_pages_concat_to_full_list(spark, setup, tmp_path_factory):
    path, repo = setup
    ix = PostingsIndex.load(spark, path)
    full = _rows(live_topk(ix, spark, path, QUERY, k=10_000))
    assert len(full) > 15  # non-vacuous

    sid, first = open_scroll(spark, path, repo, BODY, now=T0, size=7,
                             scroll_s=600.0)
    pages = _rows(first)
    n = 1
    while True:
        page = scroll_next(spark, repo, sid, now=T0 + n,
                           scroll_s=600.0)
        rows = _rows(page)
        if not rows:
            break
        pages.extend(rows)
        n += 1
        if n == 3:
            # mutate the LIVE index mid-scroll: the context is pinned
            work = str(tmp_path_factory.mktemp("scr_mut")) + "/ix"
            import shutil
            shutil.copytree(path, work)
            assert delete_by_query(
                spark, work,
                {"query": {"match": {"text": "w00012"}}}) > 0
    assert pages == full
    close_scroll(repo, sid)
    assert list_pits(repo) == []


def test_scroll_expiry_and_close(spark, setup):
    path, repo = setup
    sid, _ = open_scroll(spark, path, repo, BODY, now=T0, size=5,
                         scroll_s=10.0)
    with pytest.raises(ValueError, match="expired"):
        scroll_next(spark, repo, sid, now=T0 + 11)
    # a renewing call inside the window extends the lease
    sid2, _ = open_scroll(spark, path, repo, BODY, now=T0 + 1, size=5,
                          scroll_s=10.0)
    scroll_next(spark, repo, sid2, now=T0 + 9, scroll_s=10.0)
    scroll_next(spark, repo, sid2, now=T0 + 15)  # renewed at +9
    close_scroll(repo, sid2)
    with pytest.raises(ValueError, match="no scroll"):
        scroll_next(spark, repo, sid2, now=T0 + 16)


def test_scroll_rejects_pagination_keys(spark, setup):
    path, repo = setup
    with pytest.raises(ValueError, match="must not carry"):
        open_scroll(spark, path, repo,
                    {"query": {"match_all": {}}, "from": 3}, now=T0)
