"""Search pipelines (request/response processor chains) vs direct
search_body twins."""

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    search_body,
)
from siem_on_amazon_opensearch_service_spark.index.searchpipeline import (
    SearchPipeline,
    search_with_pipeline,
)

TEXTS = [
    (0, "spark table join stream", "en"),
    (1, "spark spark table", "en"),
    (2, "table join join join", "de"),
    (3, "stream processing spark", "de"),
    (4, "spark stream stream", "en"),
    (5, "unrelated words entirely", "fr"),
]


@pytest.fixture(scope="module")
def ix(spark):
    docs = spark.createDataFrame(
        TEXTS, "doc_id long, text string, lang string")
    return build_index(spark, docs, text_col="text", id_col="doc_id")


def test_filter_query_equals_rewritten_body(ix):
    pipe = SearchPipeline(request_processors=[
        {"filter_query": {"query": {"term": {"lang": "en"}}}}])
    body = {"query": {"match": {"text": "spark stream"}}, "size": 10}
    got = search_with_pipeline(ix, body, pipe)["hits"].collect()
    twin = search_body(ix, {
        "query": {"bool": {"must": [body["query"]],
                           "filter": [{"term": {"lang": "en"}}]}},
        "size": 10})["hits"].collect()
    assert [(r.doc_id, r.score) for r in got] == \
           [(r.doc_id, r.score) for r in twin]
    assert got and all(r.lang == "en" for r in got)


def test_oversample_collapse_truncate_recipe(ix):
    # the documented recipe: oversample -> collapse by field ->
    # truncate back to the original size
    pipe = SearchPipeline(
        request_processors=[{"oversample": {"sample_factor": 3}}],
        response_processors=[{"collapse": {"field": "lang"}},
                             {"truncate_hits": {}}])
    body = {"query": {"match": {"text": "spark stream join"}}, "size": 2}
    got = search_with_pipeline(ix, body, pipe)["hits"].collect()
    assert len(got) == 2
    assert len({r.lang for r in got}) == 2  # collapsed: one per lang
    # each surviving hit is its language's best-scoring hit
    full = search_body(ix, {**body, "size": 6})["hits"].collect()
    best = {}
    for r in full:
        best.setdefault(r.lang, r.doc_id)
    assert {r.doc_id for r in got} <= set(best.values())


def test_rename_sort_and_errors(ix):
    pipe = SearchPipeline(response_processors=[
        {"rename_field": {"field": "lang", "target_field": "language"}},
        {"sort": {"field": "doc_id", "order": "desc"}}])
    body = {"query": {"match": {"text": "spark"}}, "size": 10}
    got = search_with_pipeline(ix, body, pipe)["hits"]
    assert "language" in got.columns and "lang" not in got.columns
    ids = [r.doc_id for r in got.collect()]
    assert ids == sorted(ids, reverse=True)

    with pytest.raises(ValueError):
        search_with_pipeline(ix, body, SearchPipeline(
            response_processors=[{"rename_field": {
                "field": "nope", "target_field": "x"}}]))
    # ignore_failure skips the broken processor
    ok = search_with_pipeline(ix, body, SearchPipeline(
        response_processors=[{"rename_field": {
            "field": "nope", "target_field": "x"},
            "ignore_failure": True}]))["hits"]
    assert "lang" in ok.columns

    with pytest.raises(ValueError):
        search_with_pipeline(ix, body, SearchPipeline(
            request_processors=[{"made_up": {}}]))
    with pytest.raises(ValueError):
        search_with_pipeline(ix, body, SearchPipeline(
            response_processors=[{"truncate_hits": {}}]))


def test_from_body_and_phase_results_accepted(ix):
    pipe = SearchPipeline.from_body({
        "request_processors": [{"oversample": {"sample_factor": 2}}],
        "response_processors": [{"truncate_hits": {}}],
        "phase_results_processors": [{"normalization-processor": {
            "normalization": {"technique": "min_max"}}}],
    })
    body = {"query": {"match": {"text": "spark"}}, "size": 2}
    got = search_with_pipeline(ix, body, pipe)["hits"].collect()
    twin = search_body(ix, body)["hits"].collect()
    assert [(r.doc_id, r.score) for r in got] == \
           [(r.doc_id, r.score) for r in twin]
    with pytest.raises(ValueError):
        search_with_pipeline(ix, body, SearchPipeline(
            phase_results_processors=[{"other": {}}]))


def test_rerank_processor(spark):
    # rerank reads the document text off the page, so the index must
    # keep the text column (the _source-enabled mapping analog)
    docs = spark.createDataFrame(
        TEXTS, "doc_id long, text string, lang string")
    ix = build_index(spark, docs, text_col="text", id_col="doc_id",
                     keep_cols=["text"])

    # deterministic fake cross-encoder: score = overlap of query and
    # doc token sets (a real model would be the same seam)
    def fake_ce(qtext, texts):
        q = set(qtext.split())
        return [float(len(q & set(t.split()))) for t in texts]

    pipe = SearchPipeline(
        request_processors=[{"oversample": {"sample_factor": 3}}],
        response_processors=[
            {"rerank": {"score_fn": fake_ce, "document_field": "text"}},
            {"truncate_hits": {}}])
    body = {"query": {"match": {"text": "spark stream join"}}, "size": 2}
    got = search_with_pipeline(ix, body, pipe)["hits"].collect()
    assert len(got) == 2
    # doc 0 ("spark table join stream") overlaps 3 query tokens — the
    # rerank must put it first regardless of BM25 order
    assert got[0].doc_id == 0 and got[0].score == 3.0
    assert got[0].score >= got[1].score
    with pytest.raises(ValueError):
        search_with_pipeline(ix, body, SearchPipeline(
            response_processors=[{"rerank": {}}]))
