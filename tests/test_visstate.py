"""visState panel replay + execution semantics.

Replay corpus: the 245 distinct (canonicalized) visState agg lists
from all 315 visualizations in the reference dashboards'
``source/saved_objects/each-dashboard/*.ndjson``, stored gzipped at
``tests/fixtures/visstates.json.gz`` (ids/types/schemas/params kept,
cosmetic params stripped). Every one must translate to a search-body
aggs spec; a sample panel executes end-to-end through search_body
and matches hand-computed buckets."""

import datetime
import gzip
import json
import os

import pytest

from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    search_body,
)
from siem_on_amazon_opensearch_service_spark.index.visstate import (
    VisStateError, visstate_to_aggs, visstate_to_body,
)

_FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                    "visstates.json.gz")
VISSTATES = [{"aggs": json.loads(s)}
             for s in json.loads(gzip.open(_FIX).read())]
NOW = datetime.datetime(2024, 6, 1)


def test_every_reference_panel_translates():
    ok, skipped = 0, []
    for vs in VISSTATES:
        try:
            spec = visstate_to_aggs(vs, now=NOW)
        except VisStateError as e:
            skipped.append(str(e))
            continue
        assert isinstance(spec, dict)
        ok += 1
    # the corpus uses only the translated agg families -- nothing in
    # the reference dashboards may fall through
    assert not skipped, skipped
    assert ok == len(VISSTATES) == 245


@pytest.fixture(scope="module")
def ix(spark):
    rows = [
        (0, "alpha one", "web", "us", "2024-01-03", 10.0),
        (1, "alpha two", "web", "eu", "2024-01-04", 20.0),
        (2, "beta three", "db", "us", "2024-02-05", 30.0),
        (3, "beta four", "db", "us", "2024-02-06", 40.0),
        (4, "gamma five", "web", "eu", "2024-02-07", 50.0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, svc string, region string, "
        "day string, bytes double").selectExpr(
            "doc_id", "text", "svc", "region",
            "cast(day as timestamp) as ts", "bytes")
    return build_index(spark, docs, text_col="text", id_col="doc_id",
                       keep_cols=["svc", "region", "ts", "bytes"])


def test_panel_executes_like_the_dashboard(ix):
    vis = {"aggs": [
        {"id": "1", "enabled": True, "type": "count", "schema": "metric",
         "params": {}},
        {"id": "2", "enabled": True, "type": "sum", "schema": "metric",
         "params": {"field": "bytes", "customLabel": "Bytes"}},
        {"id": "3", "enabled": True, "type": "terms", "schema": "segment",
         "params": {"field": "svc", "size": 5, "orderBy": "1",
                    "order": "desc", "otherBucket": False}},
    ]}
    body = visstate_to_body(
        vis, query=("region: us", "kuery"),
        filters=[{"meta": {"type": "phrase", "key": "svc",
                           "negate": True,
                           "params": {"query": "cache"}}}])
    assert body["size"] == 0
    res = search_body(ix, body)
    rows = {r["3"]: (r["doc_count"], r["2"])
            for r in res["aggs"]["3"].collect()}
    # region=us docs: 0 (web, 10), 2+3 (db, 30+40)
    assert rows == {"db": (2, pytest.approx(70.0)),
                    "web": (1, pytest.approx(10.0))}


def test_filters_bucket_with_kuery_arms(ix):
    vis = {"aggs": [
        {"id": "1", "enabled": True, "type": "count", "schema": "metric",
         "params": {}},
        {"id": "2", "enabled": True, "type": "filters", "schema": "group",
         "params": {"filters": [
             {"input": {"query": "svc: web and region: eu",
                        "language": "kuery"}, "label": "web-eu"},
             {"input": {"query": "svc:db", "language": "lucene"},
              "label": "db"}]}},
    ]}
    res = search_body(ix, visstate_to_body(vis))
    arms = {r["2"]: r["doc_count"] for r in res["aggs"]["2"].collect()}
    assert arms == {"web-eu": 2, "db": 2}


def test_sibling_pipeline_with_custom_bucket(ix):
    vis = {"aggs": [
        {"id": "1", "enabled": True, "type": "max_bucket",
         "schema": "metric",
         "params": {"customBucket": {
             "id": "1-bucket", "type": "terms", "schema": "bucket",
             "params": {"field": "svc", "size": 10, "orderBy": "_key",
                        "order": "desc"}}}},
    ]}
    spec = visstate_to_aggs(vis)
    assert spec["1"] == {"max_bucket":
                         {"buckets_path": "1-bucket>doc_count"}}
    res = search_body(ix, {"query": {"match_all": {}}, "size": 0,
                           "aggs": spec})
    # max per-svc doc_count: web has 3 docs
    [row] = res["aggs"]["1"].collect()
    assert row["1"] == 3


def test_auto_interval_becomes_auto_date_histogram():
    vis = {"aggs": [
        {"id": "2", "enabled": True, "type": "date_histogram",
         "schema": "segment",
         "params": {"field": "ts", "interval": "auto",
                    "timeRange": {"from": "now-7d", "to": "now"}}}]}
    spec = visstate_to_aggs(vis)
    assert spec == {"2": {"auto_date_histogram":
                          {"field": "ts", "buckets": 30}}}


def test_real_cloudtrail_panel_over_nested_ecs_structs(spark):
    """The reference's flagship saved search (cloudtrail.ndjson: Root
    user activity) executed end-to-end: KQL with dotted ECS paths over
    nested struct columns, field:* existence negation, terms panel."""
    rows = [(0, "ev one", ("Root", None), "ConsoleLogin"),
            (1, "ev two", ("IAMUser", "svc"), "ConsoleLogin"),
            (2, "ev three", ("Root", None), "CreateVpc"),
            (3, "ev four", ("Root", "aws"), "DeleteVpc")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, "
        "userIdentity struct<type:string,invokedBy:string>, "
        "eventName string")
    ix2 = build_index(spark, docs, text_col="text", id_col="doc_id",
                      keep_cols=["userIdentity", "eventName"])
    vis = {"aggs": [
        {"id": "1", "enabled": True, "type": "count", "schema": "metric",
         "params": {}},
        {"id": "2", "enabled": True, "type": "terms", "schema": "segment",
         "params": {"field": "eventName", "size": 10, "orderBy": "1",
                    "order": "desc"}}]}
    body = visstate_to_body(
        vis, query=("userIdentity.type:Root AND NOT "
                    "userIdentity.invokedBy:*", "kuery"))
    res = search_body(ix2, body)
    got = {r["2"]: r["doc_count"] for r in res["aggs"]["2"].collect()}
    # docs 0 and 2: Root with NO invokedBy; doc 3 has invokedBy set
    assert got == {"ConsoleLogin": 1, "CreateVpc": 1}
