"""_msearch batch executor: every response must equal the per-body
search_body result exactly, while the whole batch shares ONE postings
scan + ONE shuffle (plan-pinned)."""

import io
from contextlib import redirect_stdout

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex,
    build_index,
    msearch,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    search_body,
)

N = 300


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    pdf = corpus.make_pages_pdf(N, seed=23)
    pdf.insert(0, "doc_id", range(len(pdf)))
    built = build_index(spark, spark.createDataFrame(pdf),
                        id_col="doc_id", salt_threshold=60)
    path = str(tmp_path_factory.mktemp("ms_ix"))
    built.save(spark, path, buckets=4)
    return PostingsIndex.load(spark, path)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# a dashboard-shaped batch: scoring panels, filter panels, an aggs
# panel, a match_all panel, pagination -- all over one index.
BODIES = [
    {"query": {"match": {"text": "w00001 w00057"}}, "size": 10},
    {"query": {"bool": {
        "must": [{"match": {"text": "w00003"}}],
        "filter": [{"term": {"lang": "en"}}],
    }}, "size": 8},
    {"query": {"query_string": {"query": "w00034 AND lang:en"}},
     "size": 10},
    {"query": {"term": {"lang": "de"}},
     "sort": [{"doclen": {"order": "desc"}}], "size": 5},
    {"size": 3},  # match_all
    {"query": {"match": {"text": "w00002"}},
     "aggs": {"by_lang": {"terms": {"field": "lang", "size": 10}},
              "avg_len": {"avg": {"field": "doclen"}}},
     "size": 5},
]


def test_msearch_matches_per_body_search(ix):
    resp = msearch(ix, BODIES)
    try:
        assert len(resp) == len(BODIES)
        for body, got in zip(BODIES, resp):
            want = search_body(ix, body)
            grows = [tuple(r) for r in got["hits"].collect()]
            wrows = [tuple(r) for r in want["hits"].collect()]
            assert grows == wrows, body
            for path, wdf in want.get("aggs", {}).items():
                gdf = got["aggs"][path]
                assert sorted(map(tuple, gdf.collect())) == \
                    sorted(map(tuple, wdf.collect())), (body, path)
    finally:
        resp.release()
    assert resp.shared is None  # release() idempotent handle drop


def test_msearch_single_shared_scan(ix):
    """The shared frame reads postings ONCE for the whole term-only
    batch (one 'In(term,...)'-pushed scan) and every per-body plan
    reuses it from the persisted cache instead of rescanning."""
    bodies = [
        {"query": {"match": {"text": "w00001"}}, "size": 5},
        {"query": {"match": {"text": "w00057 w00003"}}, "size": 5},
        {"query": {"match": {"text": "w00002"}}, "size": 5},
    ]
    resp = msearch(ix, bodies)
    try:
        shared_plan = _plan(resp.shared)
        # exactly two file scans feed the shared frame: docs + ONE
        # postings scan carrying the union of all three bodies' terms
        # (each scan appears once as a "Location:" detail line)
        locs = [ln for ln in shared_plan.splitlines() if "Location" in ln]
        assert len(locs) == 2
        assert sum("/postings" in ln for ln in locs) == 1
        assert "In(term" in shared_plan
        for r in resp:
            # every per-body plan reads the persisted shared frame
            # (the parquet text below InMemoryRelation is only the
            # cache's lineage, not a re-scan)
            p = _plan(r["hits"])
            assert "InMemoryTableScan" in p
            r["hits"].collect()
    finally:
        resp.release()


def test_msearch_empty_and_vector_free_fallbacks(ix):
    # empty batch
    resp = msearch(ix, [])
    assert len(resp) == 0
    resp.release()
    # match_all-only batch (no posting leaves anywhere)
    resp = msearch(ix, [{"size": 4}])
    try:
        assert resp[0]["hits"].count() == 4
    finally:
        resp.release()
