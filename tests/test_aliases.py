"""Filtered aliases: the alias filter joins the query in filter
context (scores unchanged), multi-index aliases union hits."""

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.aliases import (
    AliasRegistry, alias_search, filtered_body,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    search_body,
)

N = 150


@pytest.fixture(scope="module")
def ix(spark):
    pdf = corpus.make_pages_pdf(N, seed=13)
    pdf.insert(0, "doc_id", range(len(pdf)))
    return build_index(spark, spark.createDataFrame(pdf),
                       id_col="doc_id", salt_threshold=60)


BODY = {"query": {"match": {"text": "w00001 w00057"}}, "size": 30}


def test_filtered_alias_equals_bool_rewrite(ix):
    reg = AliasRegistry()
    reg.add("tenant_en", ix, filter={"term": {"lang": "en"}})
    got = alias_search(reg, "tenant_en", BODY)["hits"].collect()
    want = search_body(ix, {"query": {"bool": {
        "must": [BODY["query"]],
        "filter": [{"term": {"lang": "en"}}],
    }}, "size": 30})["hits"].collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got  # non-vacuous
    # filter context: scores must equal the unfiltered query's scores
    # for the docs that survive
    unfiltered = {r["doc_id"]: r["score"] for r in search_body(
        ix, {"query": BODY["query"], "size": N})["hits"].collect()}
    for r in got:
        assert r["score"] == pytest.approx(unfiltered[r["doc_id"]])


def test_unfiltered_alias_passthrough(ix):
    reg = AliasRegistry()
    reg.add("plain", ix)
    got = alias_search(reg, "plain", BODY)["hits"].collect()
    want = search_body(ix, BODY)["hits"].collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_multi_index_alias_merges_with_page_cut(ix):
    """Coordinator contract: per-index top-(from+size) pages merge by
    score and the request's size applies to the MERGED result (the
    old union returned n_indices * size rows for a size-row body)."""
    reg = AliasRegistry()
    reg.add("split", ix, filter={"term": {"lang": "en"}})
    reg.add("split", ix, filter={"term": {"lang": "de"}})
    got = [(r["doc_id"], r["score"]) for r in
           alias_search(reg, "split", BODY)["hits"].collect()]
    per_index = []
    for lang in ("en", "de"):
        per_index += [
            (r["doc_id"], r["score"])
            for r in search_body(ix, filtered_body(
                BODY, {"term": {"lang": lang}}))["hits"].collect()]
    want = sorted(per_index, key=lambda t: (-t[1], t[0]))[:BODY["size"]]
    assert got == want and len(got) == BODY["size"]
    with pytest.raises(ValueError, match="alias aggregations"):
        alias_search(reg, "split", {**BODY, "aggs": {
            "l": {"terms": {"field": "lang"}}}})
    with pytest.raises(ValueError, match="custom sort"):
        alias_search(reg, "split", {**BODY, "sort": [
            {"doclen": {"order": "desc"}}]})


def test_unknown_alias_raises(ix):
    with pytest.raises(KeyError):
        alias_search(AliasRegistry(), "nope", BODY)
