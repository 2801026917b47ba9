"""Sigma detection rules + finding correlation: Spark vs DuckDB on
the same frames, plus plan-shape pins (one projection for a rule
pack; banded correlation join has bounded expansion)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators.sigma import (
    compile_rule, load_rules, sigma_findings, sigma_where_sql,
)
from siem_on_amazon_opensearch_service_spark.operators.correlate import (
    correlate_findings, correlate_sql,
)

EVENTS = [
    # id, src_ip, user, action, status, bytes, message
    (0, "10.0.0.5", "root", "ConsoleLogin", "Failure", 10,
     "Failed password for root"),
    (1, "10.0.0.5", "root", "ConsoleLogin", "Failure", 20,
     "Failed password for root again"),
    (2, "192.168.1.9", "alice", "ConsoleLogin", "Success", 5,
     "Accepted password"),
    (3, "10.0.1.77", "bob", "AuthorizeSecurityGroupIngress", "Success",
     99, "opened the firewall"),
    (4, "8.8.8.8", "alice", "DeleteTrail", "Success", 50,
     "cloudtrail tampering DeleteTrail"),
    (5, "10.0.0.6", None, "ConsoleLogin", "Failure", 1000,
     "Failed publickey for invalid user admin"),
]
SCHEMA = ("event_id long, src_ip string, user string, action string, "
          "status string, bytes long, message string")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(EVENTS, SCHEMA)


def _duck(where):
    con = duckdb.connect()
    con.register("ev", pd.DataFrame(
        EVENTS, columns=["event_id", "src_ip", "user", "action",
                         "status", "bytes", "message"]))
    got = con.execute(
        f"SELECT event_id FROM ev WHERE {where} ORDER BY event_id"
    ).fetchall()
    con.close()
    return [r[0] for r in got]


def _spark_ids(docs, rule, **kw):
    return sorted(r["event_id"] for r in
                  docs.filter(compile_rule(rule, **kw)).collect())


RULES = [
    # map AND + list OR + case-insensitivity
    {"id": "r_login_fail", "level": "high", "detection": {
        "sel": {"Action": "consolelogin", "status": ["failure", "locked"]},
        "condition": "sel"}},
    # modifiers: contains / startswith / endswith
    {"id": "r_mods", "detection": {
        "s1": {"message|contains": "failed password"},
        "s2": {"src_ip|startswith": "10.0."},
        "s3": {"action|endswith": "ingress"},
        "condition": "s1 and s2 or s3"}},
    # glob values + null + exists
    {"id": "r_glob", "detection": {
        "glob": {"action": "*Delete*"},
        "nouser": {"user": None},
        "condition": "glob or nouser"}},
    # numeric + cidr + re
    {"id": "r_num", "detection": {
        "big": {"bytes|gte": 100},
        "inside": {"src_ip|cidr": "10.0.0.0/16"},
        "rx": {"message|re": "invalid user \\w+"},
        "condition": "big and (inside or rx)"}},
    # quantifiers
    {"id": "r_quant", "detection": {
        "sel_a": {"status": "Failure"},
        "sel_b": {"bytes|lt": 15},
        "sel_c": {"user": "root"},
        "condition": "2 of sel_*"}},
    # all-of-them + not
    {"id": "r_all", "detection": {
        "one": {"status": "Failure"},
        "two": {"message|contains": "password"},
        "condition": "all of them and not (one and two and not one)"}},
    # |all list + keywords list
    {"id": "r_lists", "detection": {
        "both": {"message|contains|all": ["failed", "root"]},
        "kw": ["tampering", "firewall"],
        "condition": "both or kw"}},
]

FIELDMAP = {"Action": "action"}


@pytest.mark.parametrize("rule", RULES, ids=lambda r: r["id"])
def test_rule_cross_engine(docs, rule):
    got = _spark_ids(docs, rule, fieldmap=FIELDMAP)
    want = _duck(sigma_where_sql(rule, fieldmap=FIELDMAP))
    assert got == want, (rule["id"], got, want)
    assert got, f"{rule['id']} matched nothing — vacuous test"


def test_expected_matches(docs):
    # hand-checked expectations (not just engine-vs-engine agreement)
    assert _spark_ids(docs, RULES[0], fieldmap=FIELDMAP) == [0, 1, 5]
    assert _spark_ids(docs, RULES[2]) == [4, 5]
    assert _spark_ids(docs, RULES[3]) == [5]
    assert _spark_ids(docs, RULES[4]) == [0, 1]


def test_rule_pack_single_projection(docs):
    out = sigma_findings(docs, RULES, fieldmap=FIELDMAP)
    rows = sorted((r["event_id"], r["rule_id"]) for r in out.collect())
    # per-rule reference
    want = sorted(
        (eid, rule["id"])
        for rule in RULES
        for eid in _spark_ids(docs, rule, fieldmap=FIELDMAP))
    assert rows == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan
    # levels ride along
    lv = {r["rule_id"]: r["level"] for r in out.collect()}
    assert lv["r_login_fail"] == "high" and lv["r_glob"] == "medium"


def test_yaml_roundtrip(docs):
    text = """
title: Root console failure
id: yaml_rule
level: critical
detection:
  sel:
    Action: ConsoleLogin
    status: Failure
  filter:
    user: root
  condition: sel and not filter
"""
    (rule,) = load_rules(text)
    assert _spark_ids(docs, rule, fieldmap=FIELDMAP) == [5]


def test_unsupported_modifier_raises():
    with pytest.raises(ValueError, match="modifier"):
        compile_rule({"detection": {
            "s": {"message|base64": "x"}, "condition": "s"}})
    with pytest.raises(ValueError, match="unknown selection"):
        compile_rule({"detection": {"s": {"user": "x"},
                                    "condition": "s and missing"}})


# ---------------------------------------------------------------------------
# correlation
# ---------------------------------------------------------------------------

FINDINGS = [
    # finding_id, rule_id, entity, ts
    (0, "brute", "root", "2024-01-01 00:00:00"),
    (1, "brute", "root", "2024-01-01 00:04:00"),
    (2, "escal", "root", "2024-01-01 00:05:30"),   # 90s after #1
    (3, "escal", "root", "2024-01-01 02:00:00"),   # far away
    (4, "brute", "alice", "2024-01-01 00:04:00"),  # other entity
    (5, "escal", "alice", "2024-01-01 00:05:00"),
    (6, "escal", "alice", "2024-01-01 00:11:00"),  # 420s: out of 300
    (7, "noise", "root", "2024-01-01 00:05:00"),   # rule not in groups
]


def test_correlate_vs_duckdb(spark):
    f = spark.createDataFrame(
        FINDINGS,
        "finding_id long, rule_id string, entity string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = correlate_findings(f, ["brute"], ["escal"], window_s=300)
    got_rows = sorted((r["a_id"], r["b_id"], r["delta_s"])
                      for r in got.collect())

    con = duckdb.connect()
    con.register("fd", pd.DataFrame(
        FINDINGS, columns=["finding_id", "rule_id", "entity", "ts"]
    ).assign(ts=lambda d: pd.to_datetime(d["ts"])))
    want = sorted(tuple(r) for r in con.execute(
        "SELECT a_id, b_id, delta_s FROM (" +
        correlate_sql("SELECT * FROM fd", ["brute"], ["escal"], 300) + ")"
    ).fetchall())
    con.close()
    assert got_rows == want
    assert got_rows == [(1, 2, 90), (4, 5, 60)]


def test_correlate_plan_is_banded_equijoin(spark):
    """The correlation plan must be an equi-join on (entity, bucket) —
    never a nested-loop/cartesian range join, whose per-entity cost is
    unbounded in corpus length."""
    f = spark.createDataFrame(
        FINDINGS,
        "finding_id long, rule_id string, entity string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = correlate_findings(f, ["brute"], ["escal"], window_s=300)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_correlate_window_edges(spark):
    # exactly-at-window pairs count; one-second-past does not; and the
    # bucket expansion catches pairs straddling a bucket boundary
    rows = [(0, "a", "e", "2024-01-01 00:04:59"),
            (1, "b", "e", "2024-01-01 00:09:59"),   # delta = 300
            (2, "b", "e", "2024-01-01 00:10:00")]   # delta = 301
    f = spark.createDataFrame(
        rows, "finding_id long, rule_id string, entity string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = sorted((r["a_id"], r["b_id"])
                 for r in correlate_findings(
                     f, ["a"], ["b"], window_s=300).collect())
    assert got == [(0, 1)]
