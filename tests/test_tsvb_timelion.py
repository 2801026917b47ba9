"""TSVB and timelion panel translation: the reference's 5 TSVB
("metrics") panels and 2 timelion expressions — the only data panels
outside the classic agg pipeline — translate to runnable bodies, and
a TSVB-shaped body executes through search_body."""

import json as _json

import pytest

from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    search_body,
)
from siem_on_amazon_opensearch_service_spark.index.visstate import (
    timelion_to_bodies, tsvb_to_bodies,
)

PANELS = _json.loads(r'''
{
 "tsvb": [
  {
   "time_field": "@timestamp",
   "interval": "",
   "filter": {
    "query": "",
    "language": "kuery"
   },
   "series": [
    {
     "id": "61ca57f1-469d-11e7-af02-69e470af7417",
     "label": "SELECT",
     "split_mode": "filter",
     "terms_field": null,
     "terms_size": null,
     "terms_order_by": null,
     "metrics": [
      {
       "id": "61ca57f2-469d-11e7-af02-69e470af7417",
       "type": "count"
      }
     ],
     "filter": {
      "query": "rds.query:SELECT and ( log.level:LOG or event.module: slowquery )",
      "language": "kuery"
     }
    },
    {
     "id": "368f4b50-6ea2-11eb-ab8a-8934526ecab9",
     "label": "INSERT",
     "split_mode": "filter",
     "terms_field": null,
     "terms_size": null,
     "terms_order_by": null,
     "metrics": [
      {
       "id": "368f4b51-6ea2-11eb-ab8a-8934526ecab9",
       "type": "count"
      }
     ],
     "filter": {
      "query": "rds.query:INSERT and ( log.level:LOG or event.module: slowquery )",
      "language": "kuery"
     }
    },
    {
     "id": "8972c6d0-6ea2-11eb-ab8a-8934526ecab9",
     "label": "UPDATE",
     "split_mode": "filter",
     "terms_field": null,
     "terms_size": null,
     "terms_order_by": null,
     "metrics": [
      {
       "id": "8972c6d1-6ea2-11eb-ab8a-8934526ecab9",
       "type": "count"
      }
     ],
     "filter": {
      "query": "rds.query:UPDATE and ( log.level:LOG or event.module: slowquery )",
      "language": "kuery"
     }
    },
    {
     "id": "c3b79dc0-6ea2-11eb-ab8a-8934526ecab9",
     "label": "DELETE",
     "split_mode": "filter",
     "terms_field": null,
     "terms_size": null,
     "terms_order_by": null,
     "metrics": [
      {
       "id": "c3b79dc1-6ea2-11eb-ab8a-8934526ecab9",
       "type": "count"
      }
     ],
     "filter": {
      "query": "rds.query:DELETE and ( log.level:LOG or event.module: slowquery )",
      "language": "kuery"
     }
    }
   ]
  },
  {
   "time_field": "@timestamp",
   "interval": ">=60m",
   "filter": null,
   "series": [
    {
     "id": "61ca57f1-469d-11e7-af02-69e470af7417",
     "label": " ",
     "split_mode": "everything",
     "terms_field": null,
     "terms_size": null,
     "terms_order_by": null,
     "metrics": [
      {
       "size": 1,
       "agg_with": "concat",
       "order": "desc",
       "id": "61ca57f2-469d-11e7-af02-69e470af7417",
       "type": "cardinality",
       "field": "@timestamp"
      },
      {
       "id": "d375a470-a6d5-11ec-a4d6-ab6d6b418454",
       "type": "sum",
       "field": "opensearch.index.primaries.docs.count"
      },
      {
       "id": "debaed40-a6d5-11ec-a4d6-ab6d6b418454",
       "type": "math",
       "variables": [
        {
         "id": "e1b8c3f0-a6d5-11ec-a4d6-ab6d6b418454",
         "name": "docs_count",
         "field": "d375a470-a6d5-11ec-a4d6-ab6d6b418454"
        },
        {
         "id": "ed895cd0-a6d5-11ec-a4d6-ab6d6b418454",
         "name": "unique_count",
         "field": "61ca57f2-469d-11e7-af02-69e470af7417"
        }
       ],
       "script": "params.docs_count / params.unique_count"
      }
     ],
     "filter": null
    }
   ]
  },
  {
   "time_field": "@timestamp",
   "interval": ">=60m",
   "filter": {
    "query": "metricset.name:shard",
    "language": "kuery"
   },
   "series": [
    {
     "id": "61ca57f1-469d-11e7-af02-69e470af7417",
     "label": "Shards/Node",
     "split_mode": "terms",
     "terms_field": "opensearch.index.storage_tier",
     "terms_size": null,
     "terms_order_by": "_key",
     "metrics": [
      {
       "id": "61ca57f2-469d-11e7-af02-69e470af7417",
       "type": "cardinality",
       "field": "opensearch.node.id"
      },
      {
       "id": "931c93d0-a73d-11ec-9756-43e33200129f",
       "type": "count"
      },
      {
       "id": "06409b30-a712-11ec-99d8-4beef1ab6fd7",
       "type": "cardinality",
       "field": "@timestamp"
      },
      {
       "id": "22c8fd10-a712-11ec-99d8-4beef1ab6fd7",
       "type": "math",
       "variables": [
        {
         "id": "2aa3f1c0-a712-11ec-99d8-4beef1ab6fd7",
         "name": "node_count",
         "field": "61ca57f2-469d-11e7-af02-69e470af7417"
        },
        {
         "id": "34d70740-a712-11ec-99d8-4beef1ab6fd7",
         "name": "shard_count",
         "field": "931c93d0-a73d-11ec-9756-43e33200129f"
        },
        {
         "id": "a49fc320-a73d-11ec-9756-43e33200129f",
         "name": "timestamp_count",
         "field": "06409b30-a712-11ec-99d8-4beef1ab6fd7"
        }
       ],
       "script": "params.shard_count / params.timestamp_count / params.node_count"
      }
     ],
     "filter": null
    }
   ]
  },
  {
   "time_field": "@timestamp",
   "interval": ">=60m",
   "filter": {
    "query": "metricset.name:shard",
    "language": "kuery"
   },
   "series": [
    {
     "id": "61ca57f1-469d-11e7-af02-69e470af7417",
     "label": "Shards/Node",
     "split_mode": "terms",
     "terms_field": "opensearch.index.storage_tier",
     "terms_size": null,
     "terms_order_by": "_key",
     "metrics": [
      {
       "id": "61ca57f2-469d-11e7-af02-69e470af7417",
       "type": "cardinality",
       "field": "opensearch.node.id"
      },
      {
       "id": "931c93d0-a73d-11ec-9756-43e33200129f",
       "type": "count"
      },
      {
       "id": "06409b30-a712-11ec-99d8-4beef1ab6fd7",
       "type": "cardinality",
       "field": "@timestamp"
      },
      {
       "id": "22c8fd10-a712-11ec-99d8-4beef1ab6fd7",
       "type": "math",
       "variables": [
        {
         "id": "2aa3f1c0-a712-11ec-99d8-4beef1ab6fd7",
         "name": "node_count",
         "field": "61ca57f2-469d-11e7-af02-69e470af7417"
        },
        {
         "id": "34d70740-a712-11ec-99d8-4beef1ab6fd7",
         "name": "shard_count",
         "field": "931c93d0-a73d-11ec-9756-43e33200129f"
        },
        {
         "id": "a49fc320-a73d-11ec-9756-43e33200129f",
         "name": "timestamp_count",
         "field": "06409b30-a712-11ec-99d8-4beef1ab6fd7"
        }
       ],
       "script": "params.shard_count / params.timestamp_count / params.node_count"
      }
     ],
     "filter": null
    }
   ]
  },
  {
   "time_field": "@timestamp",
   "interval": ">=60m",
   "filter": {
    "query": "(@timestamp > \"now-7d\") and metricset.name:shard and opensearch.shard.primary:true",
    "language": "kuery"
   },
   "series": [
    {
     "id": "61ca57f1-469d-11e7-af02-69e470af7417",
     "label": " ",
     "split_mode": "terms",
     "terms_field": "opensearch.index.name",
     "terms_size": "10",
     "terms_order_by": "d4dd11c0-a6d7-11ec-a4d6-ab6d6b418454",
     "metrics": [
      {
       "field": "opensearch.shard.store.size_in_bytes",
       "id": "d4dd11c0-a6d7-11ec-a4d6-ab6d6b418454",
       "sigma": "",
       "type": "max"
      }
     ],
     "filter": {
      "query": "",
      "language": "kuery"
     }
    }
   ]
  }
 ],
 "timelion": [
  ".es(index=\"log-aws-waf-*\",q='action:ALLOW').label(\"Allowed Requests\").color(#009933), .es(index=\"log-aws-waf-*\",q='action:BLOCK').label(\"Blocked Requests\").color(#cc0000)",
  ".es(index=\"log-aws-waf-*\").label(\"Requests Count\").color(#AA9933)"
 ]
}
''')


def test_all_reference_tsvb_panels_translate():
    for par in PANELS["tsvb"]:
        bodies = tsvb_to_bodies(par)
        assert bodies and all("aggs" in b and b["size"] == 0
                              for b in bodies.values())
        for b in bodies.values():
            top = next(iter(b["aggs"].values()))
            kind = next(iter(top))
            assert kind in ("terms", "date_histogram",
                            "auto_date_histogram")


def test_all_reference_timelion_panels_translate():
    for expr in PANELS["timelion"]:
        bodies = timelion_to_bodies(expr)
        assert bodies
    two = timelion_to_bodies(PANELS["timelion"][0])
    assert set(two) == {"Allowed Requests", "Blocked Requests"}
    assert two["Allowed Requests"]["query"] == {
        "query_string": {"query": "action:ALLOW"}}


def test_tsvb_body_executes(spark):
    rows = [(0, "a b", "SELECT", "2024-01-01 00:10:00", 4.0),
            (1, "a c", "SELECT", "2024-01-01 01:10:00", 6.0),
            (2, "b c", "INSERT", "2024-01-01 01:20:00", 2.0)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, q string, ts_s string, "
        "t double").selectExpr(
            "doc_id", "text", "q", "cast(ts_s as timestamp) as ts", "t")
    ix = build_index(spark, docs, text_col="text", id_col="doc_id",
                     keep_cols=["q", "ts", "t"])
    par = {"time_field": "ts", "interval": ">=60m",
           "series": [{"id": "s1", "label": "selects",
                       "split_mode": "everything",
                       "filter": {"query": "q:SELECT",
                                  "language": "kuery"},
                       "metrics": [
                           {"id": "m1", "type": "count"},
                           {"id": "m2", "type": "max", "field": "t"},
                           {"id": "m3", "type": "math",
                            "variables": [{"id": "v", "name": "mx",
                                           "field": "m2"}],
                            "script": "params.mx / 2"}]}]}
    [body] = tsvb_to_bodies(par).values()
    res = search_body(ix, body)
    rows_out = sorted(
        (str(r["timeseries"]), r["doc_count"], r["m2"], r["m3"])
        for r in res["aggs"]["timeseries"].collect())
    assert rows_out == [
        ("2024-01-01 00:00:00", 1, 4.0, 2.0),
        ("2024-01-01 01:00:00", 1, 6.0, 3.0)]


def test_saved_objects_export_loader():
    from siem_on_amazon_opensearch_service_spark.index.visstate import (
        saved_objects_bodies,
    )

    vis_line = _json.dumps({
        "type": "visualization", "id": "v1",
        "attributes": {
            "title": "Top services",
            "visState": _json.dumps({"type": "pie", "aggs": [
                {"id": "1", "enabled": True, "type": "count",
                 "schema": "metric", "params": {}},
                {"id": "2", "enabled": True, "type": "terms",
                 "schema": "segment",
                 "params": {"field": "svc", "size": 5,
                            "orderBy": "1", "order": "desc"}}]}),
            "kibanaSavedObjectMeta": {"searchSourceJSON": _json.dumps({
                "query": {"query": "region: us", "language": "kuery"},
                "filter": [{"meta": {"type": "phrase", "key": "svc",
                                     "negate": True,
                                     "params": {"query": "cache"}}}],
            })}}})
    md_line = _json.dumps({
        "type": "visualization", "id": "v2",
        "attributes": {"title": "Notes", "visState": _json.dumps(
            {"type": "markdown", "params": {"markdown": "hi"}})}})
    tl_line = _json.dumps({
        "type": "visualization", "id": "v3",
        "attributes": {"title": "Requests", "visState": _json.dumps(
            {"type": "timelion", "params": {
                "expression": ".es(q='action:BLOCK').label(\"b\")"}})}})
    dash_line = _json.dumps({"type": "dashboard", "id": "d1",
                             "attributes": {"title": "D"}})

    bodies = saved_objects_bodies([vis_line, md_line, tl_line,
                                   dash_line])
    assert set(bodies) == {"Top services", "Requests"}
    top = bodies["Top services"]
    assert top["size"] == 0 and "2" in top["aggs"]
    b = top["query"]["bool"]
    assert b["must"] == [{"term": {"region": "us"}}]
    assert b["must_not"] == [{"term": {"svc": "cache"}}]
    assert bodies["Requests"]["b"]["query"] == {
        "query_string": {"query": "action:BLOCK"}}


def test_saved_objects_discover_search(spark):
    from siem_on_amazon_opensearch_service_spark.index import build_index
    from siem_on_amazon_opensearch_service_spark.index.visstate import (
        saved_objects_bodies,
    )

    line = _json.dumps({
        "type": "search", "id": "s1",
        "attributes": {
            "title": "Recent errors",
            "columns": ["level", "msg"],
            "sort": [["ts", "desc"]],
            "kibanaSavedObjectMeta": {"searchSourceJSON": _json.dumps({
                "query": {"query": "level: ERROR", "language": "kuery"},
                "filter": []})}}})
    [body] = saved_objects_bodies([line]).values()
    assert body["size"] == 500
    assert body["_source"] == ["level", "msg"]
    assert body["sort"] == [{"ts": {"order": "desc"}}]

    rows = [(0, "boom", "ERROR", "a", "2024-01-02"),
            (1, "fine", "INFO", "b", "2024-01-03"),
            (2, "bang", "ERROR", "c", "2024-01-04")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, level string, msg string, "
        "ts_s string").selectExpr(
            "doc_id", "text", "level", "msg",
            "cast(ts_s as timestamp) as ts")
    ix = build_index(spark, docs, text_col="text", id_col="doc_id",
                     keep_cols=["level", "msg", "ts"])
    page = search_body(ix, body)["hits"].collect()
    assert [r["doc_id"] for r in page] == [2, 0]   # ts desc
    assert sorted(page[0].asDict()) == ["doc_id", "level", "msg",
                                        "score"]
