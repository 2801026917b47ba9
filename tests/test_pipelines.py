"""Search pipelines (request/response processors) and search
templates: pipeline execution == manually rewritten body + page ops;
templates render with JSON-aware typing and conditional sections."""

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.pipelines import (
    apply_request_processors,
    render_template,
    search_with_pipeline,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    search_body,
)


@pytest.fixture(scope="module")
def ix(spark):
    pdf = corpus.make_pages_pdf(300, seed=13)
    pdf.insert(0, "doc_id", range(len(pdf)))
    out = build_index(spark, spark.createDataFrame(pdf), id_col="doc_id",
                      salt_threshold=100)
    out.postings = out.postings.persist()
    return out


BODY = {"query": {"match": {"text": "w00001 w00011"}}, "size": 10,
        "aggs": {"langs": {"terms": {"field": "lang", "size": 5}}}}

PIPE = {
    "request_processors": [
        {"filter_query": {"query": {"term": {"lang": "en"}}}},
        {"script": {"source": {"size": 6}}},
    ],
    "response_processors": [
        {"rename_field": {"field": "score", "target_field": "_score"}},
    ],
}


def test_pipeline_equals_manual_rewrite(spark, ix):
    res = search_with_pipeline(ix, BODY, PIPE)
    hits = res["hits"].collect()
    assert len(hits) == 6 and "_score" in res["hits"].columns

    manual_body = {
        "query": {"bool": {"must": [BODY["query"]],
                           "filter": [{"term": {"lang": "en"}}]}},
        "size": 6, "aggs": BODY["aggs"],
    }
    manual = search_body(ix, manual_body)
    want = [(int(r["doc_id"]), round(r["score"], 9))
            for r in manual["hits"].collect()]
    got = [(int(r["doc_id"]), round(r["_score"], 9)) for r in hits]
    assert got == want

    # the enforced filter reaches the AGGS too (security contract):
    # every bucket key must be 'en'
    keys = [r[0] for r in res["aggs"]["langs"].collect()]
    assert keys == ["en"]


def test_oversample_truncate_roundtrip(spark, ix):
    pipe = {
        "request_processors": [{"oversample": {"sample_factor": 3}}],
        "response_processors": [{"truncate_hits": {"target_size": 4}}],
    }
    res = search_with_pipeline(ix, {"query": BODY["query"], "size": 4}, pipe)
    plain = search_body(ix, {"query": BODY["query"], "size": 4})
    assert [int(r["doc_id"]) for r in res["hits"].collect()] == \
        [int(r["doc_id"]) for r in plain["hits"].collect()]


def test_response_sort_and_collapse(spark, ix):
    pipe = {"response_processors": [
        {"collapse": {"field": "lang"}},
        {"sort": {"field": "doc_id", "order": "desc"}},
    ]}
    res = search_with_pipeline(
        ix, {"query": BODY["query"], "size": 20,
             "_source": ["lang"]}, pipe)
    rows = res["hits"].collect()
    langs = [r["lang"] for r in rows]
    assert len(langs) == len(set(langs))  # one hit per lang
    ids = [int(r["doc_id"]) for r in rows]
    assert ids == sorted(ids, reverse=True)


def test_unknown_processors_raise(spark, ix):
    with pytest.raises(ValueError, match="unknown request"):
        apply_request_processors({}, [{"frobnicate": {}}])
    with pytest.raises(ValueError, match="unknown response"):
        search_with_pipeline(ix, BODY, {"response_processors":
                                        [{"nope": {}}]})


def test_template_rendering():
    src = {
        "query": {"bool": {
            "must": [{"match": {"text": "{{q}}"}}],
            "{{#use_filter}}": {"filter": [{"term": {"lang": "{{lang}}"}}]},
        }},
        "size": "{{k}}",
    }
    on = render_template(src, {"q": "a b", "k": 5, "use_filter": True,
                               "lang": "en"})
    assert on["size"] == 5  # JSON-aware typing, not "5"
    assert on["query"]["bool"]["filter"] == [{"term": {"lang": "en"}}]
    off = render_template(src, {"q": "a b", "k": 5, "use_filter": False})
    assert "filter" not in off["query"]["bool"]
    with pytest.raises(KeyError, match="missing template param"):
        render_template({"size": "{{k}}"}, {})
    # embedded (non-full-match) substitution stays a string
    s = render_template({"q": "prefix {{x}} suffix"}, {"x": 7})
    assert s["q"] == "prefix 7 suffix"
