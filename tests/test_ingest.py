"""OpenSearch ingest-pipeline compiler: every processor checked
against a pure-Python twin applying the documented semantics."""

import json
import re

import pytest

from siem_on_amazon_opensearch_service_spark.ingest import (
    GROK_PATTERNS,
    IngestError,
    compile_ingest_pipeline,
    dissect_to_regex,
    grok_to_regex,
    simulate,
)

LINES = [
    '10.0.0.1 - alice [12/Mar/2024:08:15:00] "GET /p/42 HTTP/1.1" 200 512',
    '192.168.1.9 - bob [12/Mar/2024:09:30:11] "POST /login HTTP/1.1" 403 99',
    'bad line with no structure',
    '10.0.0.7 - carol [13/Mar/2024:10:00:00] "GET /p/7 HTTP/1.1" 500 -',
]

GROK = ("%{IP:client} %{NOTSPACE} %{USERNAME:user} \\[%{HTTPDATE:ts_raw}\\] "
        "\"%{WORD:method} %{NOTSPACE:path} %{DATA:proto}\" "
        "%{INT:status} %{NOTSPACE:bytes}")


def test_grok_to_regex_roundtrip():
    rx, names = grok_to_regex(GROK)
    assert names == ["client", "user", "ts_raw", "method", "path",
                     "proto", "status", "bytes"]
    m = re.match(rx, LINES[0])
    assert m and m.group(1) == "10.0.0.1" and m.group(7) == "200"
    assert re.match(rx, LINES[2]) is None


def test_grok_custom_definitions_and_unknown():
    rx, names = grok_to_regex("%{HEX:h}", {"HEX": "[0-9a-f]+"})
    assert re.fullmatch(rx, "deadbeef")
    with pytest.raises(IngestError):
        grok_to_regex("%{NOPE:x}")


def test_dissect_to_regex():
    rx, names = dissect_to_regex('%{client} - %{user} [%{ts}] "%{req}"')
    assert names == ["client", "user", "ts", "req"]
    m = re.match(rx, LINES[0])
    assert m.group(1) == "10.0.0.1"
    assert m.group(3) == "12/Mar/2024:08:15:00"
    # %{req} has a trailing literal '"' -> non-greedy up to it
    assert m.group(4) == "GET /p/42 HTTP/1.1"
    # a true final key takes the rest of the line
    rx2, names2 = dissect_to_regex("%{client} - %{rest}")
    m2 = re.match(rx2, LINES[0])
    assert m2.group(2) == LINES[0].split(" - ", 1)[1]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, l) for i, l in enumerate(LINES)], "id long, line string")


def test_full_chain_vs_python(spark, docs):
    pipeline = {"processors": [
        {"grok": {"field": "line", "patterns": [GROK]}},
        {"convert": {"field": "status", "type": "integer"}},
        {"drop": {"if": "status >= 500"}},
        {"set": {"field": "log_type", "value": "apache_access"}},
        {"gsub": {"field": "path", "pattern": "^/p/",
                  "replacement": "", "target_field": "page"}},
        {"rename": {"field": "client", "target_field": "source_ip"}},
        {"lowercase": {"field": "method"}},
        {"date": {"field": "ts_raw",
                  "formats": ["dd/MMM/yyyy:HH:mm:ss"],
                  "target_field": "ts", "timezone": "UTC"}},
        {"script": {"source": "status >= 400",
                    "target_field": "is_error"}},
        {"remove": {"field": ["line", "proto", "bytes"],
                    "ignore_missing": True}},
    ]}
    out = {r.id: r.asDict() for r in
           simulate(pipeline, docs).collect()}

    rx, names = grok_to_regex(GROK)
    import datetime
    want = {}
    for i, l in enumerate(LINES):
        m = re.match(rx, l)
        g = dict(zip(names, m.groups())) if m else {n: "" for n in names}
        status = int(g["status"]) if g["status"] else None
        if status is not None and status >= 500:
            continue
        want[i] = {
            "source_ip": g["client"], "user": g["user"],
            "method": g["method"].lower(),
            "page": re.sub("^/p/", "", g["path"]),
            "status": status, "log_type": "apache_access",
            "is_error": None if status is None else status >= 400,
            "ts": (datetime.datetime.strptime(
                g["ts_raw"], "%d/%b/%Y:%H:%M:%S") if g["ts_raw"] else None),
        }
    assert set(out) == set(want)
    for i, w in want.items():
        for k, v in w.items():
            got = out[i][k]
            if k == "ts" and got is not None:
                got = got.replace(tzinfo=None)
            assert got == v, (i, k, got, v)


def test_if_condition_per_doc(spark, docs):
    pipeline = {"processors": [
        {"set": {"field": "tag", "value": "long",
                 "if": "length(line) > 40"}},
    ]}
    out = {r.id: r.tag for r in simulate(pipeline, docs).collect()}
    for i, l in enumerate(LINES):
        assert out[i] == ("long" if len(l) > 40 else None)


def test_kv_csv_json_split_join(spark):
    df = spark.createDataFrame(
        [(1, "a=1&b=2&c=x", "p,q,r", '{"k": "v", "n": "2"}')],
        "id long, qs string, row string, js string")
    pipeline = {"processors": [
        {"kv": {"field": "qs", "field_split": "&", "value_split": "=",
                "target_field": "params"}},
        {"csv": {"field": "row", "target_fields": ["c1", "c2", "c3"]}},
        {"json": {"field": "js", "target_field": "obj"}},
        {"split": {"field": "row", "separator": ",",
                   "target_field": "parts"}},
        {"join": {"field": "parts", "separator": "|",
                  "target_field": "joined"}},
    ]}
    r = simulate(pipeline, df).collect()[0]
    assert r.params == {"a": "1", "b": "2", "c": "x"}
    assert (r.c1, r.c2, r.c3) == ("p", "q", "r")
    assert r.obj == {"k": "v", "n": "2"}
    assert r.joined == "p|q|r"


def test_append_set_copy_from_override(spark):
    df = spark.createDataFrame([(1, "x", None), (2, None, "keep")],
                               "id long, a string, b string")
    pipeline = {"processors": [
        {"set": {"field": "b", "copy_from": "a", "override": False}},
        {"append": {"field": "tags", "value": ["t1"]}},
        {"append": {"field": "tags", "value": "t2"}},
    ]}
    out = {r.id: r for r in simulate(pipeline, df).collect()}
    assert out[1].b == "x"          # null filled from a
    assert out[2].b == "keep"       # override=False keeps existing
    assert out[1].tags == ["t1", "t2"]


def test_user_agent_processor(spark):
    df = spark.createDataFrame(
        [(1, "Mozilla/5.0 ... Chrome/120.0.0.0 Safari/537.36"),
         (2, "curl/8.5.0")],
        "id long, ua string")
    out = {r.id: r.user_agent for r in simulate(
        {"processors": [{"user_agent": {"field": "ua"}}]}, df).collect()}
    assert out[1]["ua_family"] == "Chrome"
    assert out[2]["ua_family"] == "curl"


def test_pipeline_processor_and_registry(spark, docs):
    registry = {
        "tagger": {"processors": [
            {"set": {"field": "via", "value": "inner"}}]},
    }
    out = simulate(
        {"processors": [{"pipeline": {"name": "tagger"}}]},
        docs, registry).collect()
    assert all(r.via == "inner" for r in out)
    with pytest.raises(IngestError):
        compile_ingest_pipeline(
            {"processors": [{"pipeline": {"name": "missing"}}]}, registry)


def test_fail_tags_not_drops(spark, docs):
    out = simulate(
        {"processors": [
            {"fail": {"if": "line LIKE 'bad%'", "message": "bad doc"}}]},
        docs).collect()
    flags = {r.id: r._ingest_failed for r in out}
    assert flags[2] == "bad doc"
    assert flags[0] is None and len(out) == len(LINES)


def test_rename_and_remove_missing(spark, docs):
    with pytest.raises(IngestError):
        simulate({"processors": [
            {"rename": {"field": "nope", "target_field": "x"}}]}, docs)
    ok = simulate({"processors": [
        {"rename": {"field": "nope", "target_field": "x",
                    "ignore_missing": True}},
        {"remove": {"field": "nope", "ignore_missing": True}},
    ]}, docs)
    assert ok.columns == docs.columns


def test_date_unix_formats(spark):
    df = spark.createDataFrame(
        [(1, "1700000000"), (2, "not a ts")], "id long, t string")
    out = {r.id: r for r in simulate(
        {"processors": [
            {"date": {"field": "t", "formats": ["UNIX"],
                      "target_field": "ts"}}]}, df).collect()}
    assert out[1].ts.year == 2023
    assert out[2].ts is None


def test_whole_chain_is_one_projection(spark, docs):
    """Scale check: a chain of column processors must not introduce
    shuffles — the plan is scan + project/filter only."""
    pipeline = {"processors": [
        {"grok": {"field": "line", "patterns": [GROK]}},
        {"convert": {"field": "status", "type": "integer"}},
        {"set": {"field": "lt", "value": "x"}},
        {"gsub": {"field": "path", "pattern": "/", "replacement": "_"}},
        {"drop": {"if": "status >= 500"}},
    ]}
    out = simulate(pipeline, docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_grok_nested_named_refs_bind_in_group_order():
    """A named ref INSIDE a custom pattern definition must bind after
    its enclosing group (regex groups number by paren-opening order);
    the old post-expansion append reversed outer/inner."""
    from siem_on_amazon_opensearch_service_spark.ingest import grok_to_regex

    rx, names = grok_to_regex(
        "%{PAIR:whole}",
        defs={"PAIR": r"%{NUMBER:left}-%{NUMBER:right}"})
    assert names == ["whole", "left", "right"]
    import re as _re
    m = _re.match(rx, "12-34")
    assert m and dict(zip(names, m.groups())) == {
        "whole": "12-34", "left": "12", "right": "34"}


def test_grok_and_csv_honor_if_condition(spark):
    """grok/dissect/csv apply only where the `if` predicate holds —
    every ingest processor supports the per-doc condition."""
    from siem_on_amazon_opensearch_service_spark.ingest import simulate

    df = spark.createDataFrame(
        [(1, "a=1", "x,y"), (2, "b=2", "p,q")],
        "id long, msg string, line string")
    out = simulate({"processors": [
        {"grok": {"field": "msg", "patterns": ["%{WORD:k}=%{NUMBER:v}"],
                  "if": "id = 1"}},
        {"csv": {"field": "line", "target_fields": ["c1", "c2"],
                 "if": "id = 2"}},
    ]}, df).orderBy("id").collect()
    assert (out[0]["k"], out[0]["v"]) == ("a", "1")
    assert out[1]["k"] is None and out[1]["v"] is None
    assert (out[1]["c1"], out[1]["c2"]) == ("p", "q")
    assert out[0]["c1"] is None and out[0]["c2"] is None
