"""more_like_this inside the _search body: like-text form must rank
identically to the standalone MLT query primitive, _id likes resolve
text from the corpus table and exclude themselves, and MLT composes
under bool like any other node."""

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex,
    build_index,
)
from siem_on_amazon_opensearch_service_spark.index.boolquery import (
    more_like_this,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    search_hits,
)

N = 300


@pytest.fixture(scope="module")
def pages_pdf():
    return corpus.make_pages_pdf(N, seed=29)


@pytest.fixture(scope="module")
def ix(spark, pages_pdf, tmp_path_factory):
    pdf = pages_pdf.copy()
    pdf.insert(0, "doc_id", range(len(pdf)))
    built = build_index(spark, spark.createDataFrame(pdf),
                        id_col="doc_id", salt_threshold=60)
    path = str(tmp_path_factory.mktemp("mlt_ix"))
    built.save(spark, path, buckets=4)
    return PostingsIndex.load(spark, path)


@pytest.fixture(scope="module")
def source_docs(spark, pages_pdf):
    pdf = pages_pdf.copy()
    pdf.insert(0, "doc_id", range(len(pdf)))
    return spark.createDataFrame(pdf[["doc_id", "text"]])


def _rows(df, k=None):
    rows = [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in df.collect()]
    return rows[:k] if k else rows


def test_body_mlt_matches_primitive(spark, ix, pages_pdf):
    like = pages_pdf["text"][7]
    body = {"query": {"more_like_this": {
        "like": like, "min_term_freq": 2, "min_doc_freq": 2,
        "max_query_terms": 10}}, "size": 15}
    got = _rows(search_hits(ix, body))
    want = _rows(more_like_this(ix, like, max_query_terms=10,
                                min_term_freq=2, min_doc_freq=2, k=15))
    assert got == want and got


def test_id_likes_resolve_and_exclude(spark, ix, source_docs, pages_pdf):
    body = {"query": {"more_like_this": {
        "like": [{"_id": 7}], "min_term_freq": 2, "min_doc_freq": 2,
        "max_query_terms": 10}}, "size": 15}
    got = _rows(search_hits(ix, body, source_docs=source_docs))
    want = _rows(more_like_this(ix, pages_pdf["text"][7],
                                max_query_terms=10, min_term_freq=2,
                                min_doc_freq=2, exclude_doc_ids=[7], k=15))
    assert got == want
    assert 7 not in [d for d, _ in got]

    # include=True keeps the seed doc (it should rank first: it
    # contains every selected term at full tf)
    body["query"]["more_like_this"]["include"] = True
    got_inc = _rows(search_hits(ix, body, source_docs=source_docs))
    assert got_inc[0][0] == 7

    # _id likes without a corpus table are an explicit error
    with pytest.raises(ValueError, match="source_docs"):
        search_hits(ix, body)


def test_mlt_composes_under_bool(spark, ix, pages_pdf):
    like = pages_pdf["text"][7]
    langs = {i: lg for i, lg in enumerate(pages_pdf["lang"])}
    body = {"query": {"bool": {
        "must": {"more_like_this": {
            "like": like, "min_term_freq": 2, "min_doc_freq": 2,
            "max_query_terms": 10}},
        "filter": {"term": {"lang": {"value": "en"}}},
    }}, "size": 30}
    got = [d for d, _ in _rows(search_hits(ix, body))]
    base = [d for d, _ in
            _rows(more_like_this(ix, like, max_query_terms=10,
                                 min_term_freq=2, min_doc_freq=2, k=N))
            if langs[d] == "en"][:30]
    assert got == base and got


def test_minimum_should_match_forms(spark, ix, pages_pdf):
    like = pages_pdf["text"][7]
    mlt = {"like": like, "min_term_freq": 2, "min_doc_freq": 2,
           "max_query_terms": 10, "minimum_should_match": "60%"}
    pct = _rows(search_hits(ix, {"query": {"more_like_this": mlt},
                                 "size": N}))
    mlt_abs = dict(mlt, minimum_should_match=2)
    absolute = _rows(search_hits(
        ix, {"query": {"more_like_this": mlt_abs}, "size": N}))
    # 60% of <=10 terms is a stricter gate than 2-of-n
    assert set(d for d, _ in pct) <= set(d for d, _ in absolute)
    assert len(pct) < len(absolute)
