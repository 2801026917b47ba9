"""Search-time runtime fields (``runtime_mappings``): derived doc
columns must behave exactly like mapped fields in query nodes, sort,
and aggregations — checked against pandas-recomputed twins."""

import re

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex,
    build_index,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    search_body,
    search_hits,
    with_runtime_mappings,
)
from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex

N = 300


@pytest.fixture(scope="module")
def pages_pdf():
    return corpus.make_pages_pdf(N, seed=23)


@pytest.fixture(scope="module")
def ix(spark, pages_pdf, tmp_path_factory):
    pdf = pages_pdf.copy()
    pdf.insert(0, "doc_id", range(len(pdf)))
    built = build_index(spark, spark.createDataFrame(pdf),
                        id_col="doc_id", salt_threshold=60)
    path = str(tmp_path_factory.mktemp("rt_ix"))
    built.save(spark, path, buckets=4)
    return PostingsIndex.load(spark, path)


@pytest.fixture(scope="module")
def oracle(pages_pdf):
    return OracleIndex.build(
        {i: t for i, t in enumerate(pages_pdf["text"])})


def _host(url):
    return re.search(r"https://([^/]+)/", url).group(1)


def test_sql_source_field_in_query_and_sort(spark, ix, pages_pdf, oracle):
    hosts = [_host(u) for u in pages_pdf["url"]]
    target = hosts[0]
    body = {
        "runtime_mappings": {
            "host": {"type": "keyword", "script": {
                "source": "regexp_extract(url, 'https://([^/]+)/', 1)"}},
        },
        "query": {"bool": {
            "must": {"match": {"text": "w00003"}},
            "filter": {"term": {"host": {"value": target}}},
        }},
        "sort": [{"host": {"order": "asc"}}, "_score"],
        "size": 50,
    }
    got = [int(r["doc_id"]) for r in search_hits(ix, body).collect()]
    scored = dict(oracle.search("w00003", k=N))
    want = sorted(
        (i for i in scored if hosts[i] == target),
        key=lambda i: (hosts[i], -scored[i], i))[:50]
    assert got == want
    assert got  # non-vacuous


def test_numeric_runtime_field_range_and_agg(spark, ix, oracle):
    body = {
        "runtime_mappings": {
            "dl2": {"type": "long", "script": {"source": "doclen * 2"}},
        },
        "query": {"range": {"dl2": {"gte": "100"}}},
        "size": N,
        "aggs": {"by_lang": {"terms": {"field": "lang", "size": 10},
                 "aggs": {"max_dl2": {"max": {"field": "dl2"}}}}},
    }
    res = search_body(ix, body)
    got_ids = {int(r["doc_id"]) for r in res["hits"].collect()}
    want_ids = {i for i, dl in oracle.doclen.items() if dl * 2 >= 100}
    assert got_ids == want_ids and got_ids
    agg = {r["by_lang"]: int(r["max_dl2"])
           for r in res["aggs"]["by_lang"].collect()}
    docs = ix.docs.toPandas().set_index("doc_id")
    want_agg = {}
    for i in want_ids:
        lg = docs.loc[i, "lang"]
        want_agg[lg] = max(want_agg.get(lg, 0), oracle.doclen[i] * 2)
    assert agg == want_agg


def test_declarative_ops_shadow_and_malformed(spark, ix, pages_pdf):
    rt = with_runtime_mappings(ix, {
        # declarative-ops form: copy + regex_replace onto the new name
        "site": {"type": "keyword", "script": [
            {"copy": {"site": "url"}},
            {"regex_replace": {"field": "site",
                               "pattern": r"https://|/p/\d+", "replacement": ""}},
        ]},
        # shadow form: same-named stored column under a declared type
        "lang": {"type": "keyword"},
        # malformed cast -> NULL, not an error
        "url_num": {"type": "long", "script": {"source": "url"}},
    })
    rows = rt.docs.orderBy("doc_id").limit(5).collect()
    for r in rows:
        assert r["site"] == _host(r["url"])
        assert r["url_num"] is None
    assert rt.docs.filter("lang is not null").count() == N
    # the original handle is untouched
    assert "site" not in ix.docs.columns
