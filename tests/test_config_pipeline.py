"""Declarative source-config compiler (config.py): stage ordering,
format dispatch, exclusion semantics, user.ini-style layering."""

import datetime as dt

from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.config import (
    compile_pipeline,
    merge_configs,
)

LINES = [
    (1, '10.0.0.1 - alice [02/Jan/2024:03:04:05] "GET /a HTTP/1.1" 200 12'),
    (2, '10.0.0.2 - bob [02/Jan/2024:04:00:00] "GET /b HTTP/1.1" 503 0'),
    (3, "not a log line"),
]

CFG = {
    "format": "regex",
    "pattern": (
        r"^(\S+) \S+ (\S+) \[([^\]]+)\] \"(\S+) (\S+) ([^\"]+)\" "
        r"(\d{3}) (\d+|-)"
    ),
    "groups": [
        "client_ip", "user", "ts_raw", "method", "request",
        "http_version", "status", "bytes",
    ],
    "exclusions": [{"field": "status", "pattern": "^5"}],
    "renames": {"request": "url_path"},
    "static_fields": {"log_type": "apache_access"},
    "ecs": {"source_ip": ["client_ip"]},
    "timestamp": {
        "field": "ts_raw",
        "formats": [("dd/MMM/yyyy:HH:mm:ss", "%d/%b/%Y:%H:%M:%S")],
        "tz_offset_hours": 2.0,
        "out": "ts_utc",
    },
    "select": ["event_id", "source_ip", "url_path", "status", "ts_utc",
               "log_type"],
}


def test_regex_pipeline_end_to_end(spark):
    df = spark.createDataFrame(LINES, "event_id int, line string")
    out = compile_pipeline(CFG)(df).collect()
    # unmatched line dropped, 5xx excluded -> only event 1 survives
    assert len(out) == 1
    r = out[0]
    assert r["event_id"] == 1
    assert r["source_ip"] == "10.0.0.1"
    assert r["url_path"] == "/a"
    assert r["log_type"] == "apache_access"
    assert r["ts_utc"] == dt.datetime(2024, 1, 2, 1, 4, 5)  # -2h shift


def test_op_exclusion_and_prune(spark):
    cfg = {
        "format": "none",
        "exclusions": [{"field": "v", "op": ">=", "value": 10}],
        "prune_empty": ["s"],
    }
    df = spark.createDataFrame(
        [(1, 3, "-"), (2, 12, "x"), (3, 5, "ok")], "id int, v int, s string"
    )
    rows = {r["id"]: r for r in compile_pipeline(cfg)(df).collect()}
    assert set(rows) == {1, 3}
    assert rows[1]["s"] is None and rows[3]["s"] == "ok"


def test_csv_format_and_prefix(spark):
    cfg = {
        "format": "csv",
        "header": "id,kind,user-ref",
        "field_prefix": "raw",
    }
    df = spark.createDataFrame([("7,click,u1",)], "line string")
    r = compile_pipeline(cfg)(df).collect()[0]
    assert r["kind"] == "click" and r["user_ref"] == "u1"
    assert r["raw"]["kind"] == "click"  # namespaced struct copy


def test_merge_configs_layering():
    base = {"format": "regex", "renames": {"a": "b"},
            "static_fields": {"x": 1}}
    override = {"renames": {"c": "d"}, "static_fields": {"x": 2}}
    m = merge_configs(base, override)
    assert m["format"] == "regex"
    assert m["renames"] == {"a": "b", "c": "d"}
    assert m["static_fields"] == {"x": 2}
