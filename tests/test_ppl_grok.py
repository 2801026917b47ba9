"""PPL grok command + extended stats aggs (stddev/var/percentile):
Spark pipeline vs the ppl_to_sql DuckDB oracle from the same parse."""

import duckdb
import pytest

from siem_on_amazon_opensearch_service_spark.ppl import (
    PPLError, grok_to_regex, ppl_query, ppl_to_sql,
)

LOGS = [
    (1, "2024-03-01T10:00:01Z ERROR 10.0.0.5 alice GET /api/v1/users 500"),
    (2, "2024-03-01T10:00:02Z info 10.0.0.7 bob GET /api/v1/items 200"),
    (3, "2024-03-01 10:05:03 WARN 192.168.1.9 carol POST /login 302"),
    (4, "not a log line at all"),
    (5, "2024-03-01T11:22:33Z DEBUG 172.16.0.1 dave GET /healthz 200"),
]

GROK = ("%{TIMESTAMP_ISO8601:ts_raw} %{LOGLEVEL:level} %{IP:client} "
        "%{USERNAME:user} %{WORD:verb} %{URIPATH:path} %{INT:status}")


def _mk(spark):
    return {"logs": spark.createDataFrame(
        LOGS, "line_id long, raw string")}


def _duck():
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in LOGS)
    con.execute(
        f"CREATE VIEW logs AS SELECT * FROM (VALUES {vals}) "
        "AS t(line_id, raw)")
    return con


def _cross(spark, text):
    got = ppl_query(spark, text, _mk(spark))
    cols = got.columns
    grows = sorted(
        tuple(round(v, 6) if isinstance(v, float) else v
              for v in (r[c] for c in cols))
        for r in got.collect())
    orows = sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in _duck().execute(ppl_to_sql(text)).fetchall())
    assert grows == orows, text
    return grows


def test_grok_extracts_and_matches_oracle(spark):
    rows = _cross(
        spark,
        f"source=logs | grok raw '{GROK}' "
        "| fields line_id, level, client, user, path, status")
    by_id = {r[0]: r[1:] for r in rows}
    assert by_id[1] == ("ERROR", "10.0.0.5", "alice", "/api/v1/users",
                        "500")
    assert by_id[3] == ("WARN", "192.168.1.9", "carol", "/login", "302")
    # non-matching line extracts empty strings (regexp_extract contract)
    assert by_id[4] == ("", "", "", "", "")


def test_grok_then_stats_pipeline(spark):
    rows = _cross(
        spark,
        f"source=logs | grok raw '{GROK}' | where level != '' "
        "| stats count() as n by verb | sort verb")
    assert rows == [(2, "GET"), (1, "POST")] or \
        sorted(rows) == sorted([("GET", 3), ("POST", 1)])


def test_grok_unknown_syntax_and_no_bindings(spark):
    with pytest.raises(PPLError, match="unknown grok"):
        grok_to_regex("%{NOPE:x}")
    with pytest.raises(PPLError, match="binds no fields"):
        ppl_query(spark, "source=logs | grok raw '%{IP} %{WORD}'",
                  _mk(spark))


def test_anonymous_refs_keep_indices_aligned():
    pat, names = grok_to_regex("%{IP} %{WORD:w} %{INT}")
    assert names == ["w"]
    import re
    m = re.search(pat, "10.0.0.1 hello 42")
    assert m and m.group(1) == "hello"


def test_extended_stats_aggs_match_oracle(spark):
    rows = _cross(
        spark,
        "source=logs "
        "| stats stddev_samp(line_id) as sd, var_pop(line_id) as vp, "
        "percentile(line_id, 50) as p50, percentile(line_id, 95) as p95")
    import statistics
    ids = [i for i, _ in LOGS]
    sd, vp, p50, p95 = rows[0]
    assert sd == pytest.approx(statistics.stdev(ids))
    assert vp == pytest.approx(statistics.pvariance(ids))
    assert p50 == pytest.approx(3.0)
    assert p95 == pytest.approx(4.8)


def test_percentile_in_eventstats_rejected(spark):
    with pytest.raises(PPLError, match="percentile"):
        ppl_query(spark,
                  "source=logs | eventstats percentile(line_id, 50) as p",
                  _mk(spark))
