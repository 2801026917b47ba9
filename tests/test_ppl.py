"""Mini-PPL compiler: Spark pipeline vs DuckDB oracle built from the
same parsed stages."""

import duckdb
import pytest

from siem_on_amazon_opensearch_service_spark.ppl import (
    PPLError, parse_expr, parse_ppl, ppl_query, ppl_to_sql,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"

PIPELINES = [
    "search source=events | where event_type = 'error' and value > 100 "
    "| stats count() as n, sum(value) as sv by user_id "
    "| sort -n, user_id | head 10",

    "source=events | where event_type in ('click', 'purchase') "
    "| eval v2 = value * 2 + 1 | fields user_id, event_type, v2 "
    "| stats avg(v2) as a, max(v2) as m by event_type | sort event_type",

    "search source=events | where not (value < 50) "
    "| stats count(), distinct_count(user_id) as users",

    "source=events | dedup event_type | sort event_type",

    "source=events | where event_type like 'err%' "
    "| rename event_type as kind | stats count() as n by kind | sort kind",

    "source=events | eval bucket = value / 25 "
    "| stats count() as n by event_type | sort -n, event_type | head 3",

    "source=events | stats count() as n, sum(value) as sv by user_id "
    "| where n >= 5 | eval sum_value = round(sv, 4) "
    "| eval grade = if(n >= 10, 'high', 'medium') "
    "| fields user_id, n, sum_value, grade | sort user_id",

    # date_histogram via span(): 12h epoch-floored buckets
    "source=events | stats count() as n by span(ts, 12h) "
    "| sort ts_span",

    "source=events | top 3 event_type",

    "source=events | top 2 user_id by event_type "
    "| sort event_type, -count, user_id",

    "source=events | rare 4 event_type",

    # regex field extraction then rollup on the extracted value
    "source=events | parse props 'k.:.(\\w+)' as pk "
    "| stats count() as n by pk | sort pk",

    # eventstats: window aggregates appended, no row reduction
    "source=events | stats count() as n by user_id "
    "| eventstats sum(n) as tot, avg(n) as m "
    "| eval share = round(n / tot, 6) | sort user_id | head 20",

    "source=events | eventstats max(value) as mx, "
    "distinct_count(user_id) as du by event_type "
    "| where value = mx | fields event_type, value, du | sort event_type",

    # lookup enrichment with misses, then fillnull on the gap
    "source=events | lookup users user_id | fillnull with -1 in tier "
    "| stats count() as n by tier | sort tier",

    # trendline: trailing simple moving average in sort order
    "source=events | stats sum(value) as sv by span(ts, 12h) "
    "| eval svr = round(sv, 4) | fields ts_span, svr "
    "| trendline sort ts_span sma(3, svr) as sv_sma | sort ts_span",

    # tail: last-N of the current order (inverted TakeOrdered)
    "source=events | stats count() as n by user_id | sort user_id "
    "| tail 5",

    # patterns: alphanumerics stripped to the punctuation skeleton
    "source=events | patterns props | stats count() as n "
    "by patterns_props | sort patterns_props | head 10",

    # join (inner/left) against a second pipeline source
    "source=events | join left user_id users "
    "| stats count() as n by tier | sort tier",
    "source=events | join inner user_id users "
    "| stats count() as n, avg(value) as av by tier | sort tier",

    # fieldsummary: one-job numeric profile per field
    "source=events | fieldsummary includefields=value, user_id, "
    "event_type | sort field",

    # unary minus in expressions (round-5 fix: '-5' previously
    # failed to parse as an atom) — literal, column, and grouped
    "source=events | where value > -5 and -(value) < -10 "
    "| eval neg = -user_id | stats count() as n, min(neg) as mn",
]


@pytest.fixture(scope="module")
def tables(spark):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(EVENTS)
    users = (
        ev.select("user_id").distinct().filter(F.col("user_id") < 20)
        .withColumn("tier", (F.col("user_id") % 3).cast("long"))
    )
    return {"events": ev, "users": users}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{EVENTS}'")
    con.execute(
        "CREATE VIEW users AS SELECT user_id, (user_id % 3)::BIGINT AS tier"
        " FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 20)")
    return con


@pytest.mark.parametrize("text", PIPELINES)
def test_ppl_matches_duckdb(spark, tables, duck, text):
    got = ppl_query(spark, text, tables)
    cols = got.columns
    grows = [tuple(r[c] for c in cols) for r in got.collect()]
    orows = duck.execute(ppl_to_sql(text)).fetchall()

    def canon(rows):
        return sorted(
            tuple(round(v, 6) if isinstance(v, float) else v for v in r)
            for r in rows
        )

    assert canon(grows) == canon(orows), text


def test_ppl_head_after_sort_is_topk(spark, tables):
    got = ppl_query(
        spark,
        "source=events | stats count() as n by user_id "
        "| sort -n, user_id | head 5",
        tables,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_ppl_where_pushdown_reaches_scan(spark, tables):
    got = ppl_query(
        spark,
        "source=events | where value > 150 | fields event_id, value",
        tables,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(value,150" in plan
    # column pruning: only the two projected columns are read
    assert "ReadSchema" in plan and "props" not in plan.split("ReadSchema")[1][:200]


def test_ppl_expand_flatten(spark, tmp_path):
    """expand (array explode) and flatten (struct unnest) against the
    DuckDB unnest twins over the same nested parquet."""
    path = str(tmp_path / "nested")
    spark.createDataFrame(
        [(1, [1, 2], (10, "x")), (2, [3], (20, "y")), (3, [], (30, "z"))],
        "id long, vals array<long>, s struct<a:long, b:string>",
    ).coalesce(1).write.parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nested AS SELECT * FROM '{path}/*.parquet'")
    text = ("source=nested | expand vals | flatten s "
            "| eval v2 = vals * a | sort id, vals")
    got = ppl_query(spark, text, {"nested": spark.read.parquet(path)})
    grows = sorted(tuple(r) for r in got.collect())
    orows = sorted(tuple(r) for r in con.execute(ppl_to_sql(text)).fetchall())
    assert grows == orows and len(grows) == 3  # id=3 empty array drops


def test_ppl_tail_requires_sort(spark, tables):
    with pytest.raises(PPLError, match="requires a preceding sort"):
        ppl_query(spark, "source=events | tail 3", tables)
    with pytest.raises(PPLError):
        ppl_to_sql("source=events | tail 3")


def test_ppl_errors():
    for bad in ("from events", "source=events | frobnicate x",
                "source=events | stats sum() by a",
                "source=events | where value >",
                "source=events | eval 1bad = 2"):
        with pytest.raises((PPLError, ValueError)):
            q = parse_ppl(bad)
            # expression errors may only surface at parse of the stage
            _ = q


def test_parse_expr_precedence():
    n = parse_expr("a = 1 or b = 2 and c = 3")
    assert n[1] == "or"
    assert parse_expr("not a = 1")[0] == "not"
    assert parse_expr("(a + b) * 2")[1] == "*"


# --- ml-commons commands: ad / kmeans --------------------------------------


def test_ppl_ad_appends_score_and_grade(spark):
    ev = spark.read.parquet(EVENTS)
    hourly = ppl_query(
        spark,
        "source=events | stats count() as n by event_type, span(ts, 1h)"
        " | eval ts = ts_span",
        {"events": ev})
    out = ppl_query(
        spark,
        "source=hourly | ad field=n time_field=ts by=event_type "
        "threshold=3.0",
        {"hourly": hourly})
    rows = out.collect()
    assert rows and {"score", "anomaly_grade"} <= set(out.columns)
    # python twin on one entity+hour-of-day cell
    import numpy as np

    pdf = hourly.toPandas()

    def hod(t):
        return str(t)[11:13]

    pdf["hod"] = pdf["ts"].map(hod)
    r0 = rows[0]
    grp = pdf[(pdf["event_type"] == r0["event_type"])
              & (pdf["hod"] == hod(r0["ts"]))]["n"]
    med = float(np.median(grp))
    mad = float(np.median((grp - med).abs()))
    want = abs(r0["n"] - med) / (1.4826 * mad + 1e-9)
    assert abs(r0["score"] - want) < 1e-6
    # grade zero below threshold, positive above
    for r in rows:
        assert (r["anomaly_grade"] > 0) == (r["score"] > 3.0)


def test_ppl_kmeans_clusters_numeric_fields(spark):
    # deterministic init takes the 3 lowest-id rows (sorted by the
    # field tuple) -- x interleaves the blobs so the seeds span them;
    # separation lives in y
    pdf = [(float(i), float(i % 3) * 1000.0 + (i % 7) * 0.1)
           for i in range(30)]
    df = spark.createDataFrame(pdf, "x double, y double")
    out = ppl_query(
        spark, "source=pts | kmeans centroids=3 iterations=6",
        {"pts": df})
    rows = out.collect()
    assert "ClusterID" in out.columns and len(rows) == 30
    # three well-separated blobs -> exactly three clusters, and
    # cluster membership aligns with the generating blob
    blobs = {}
    for r in rows:
        blobs.setdefault(int(r.y // 1000), set()).add(r.ClusterID)
    assert all(len(s) == 1 for s in blobs.values())
    assert len({s.pop() for s in blobs.values()}) == 3


def test_ppl_ad_requires_field(spark):
    ev = spark.read.parquet(EVENTS)
    with pytest.raises(PPLError, match="field"):
        ppl_query(spark, "source=events | ad time_field=ts",
                  {"events": ev})


def test_ppl_ad_keeps_null_key_rows_and_name_collisions(spark):
    # NULL entity/time keys keep flowing (NULL score) -- the command
    # APPENDS, it never drops rows; an input `med` column survives
    rows = [("a", "2024-01-01 10:00:00", 5.0, 1.0),
            ("a", "2024-01-02 10:00:00", 6.0, 1.0),
            (None, "2024-01-01 10:00:00", 7.0, 1.0),
            ("a", None, 8.0, 1.0)]
    df = spark.createDataFrame(
        rows, "event_type string, ts string, n double, med double")
    out = ppl_query(spark,
                    "source=t | ad field=n time_field=ts "
                    "by=event_type", {"t": df})
    got = out.collect()
    assert len(got) == 4
    assert "med" in out.columns
    nulls = [r for r in got
             if r.event_type is None or r.ts is None]
    assert len(nulls) == 2 and all(r.score is None for r in nulls)


def test_ppl_kmeans_survives_cell_column(spark):
    pdf = [(float(i), float(i % 2) * 100.0, "x")
           for i in range(10)]
    df = spark.createDataFrame(pdf, "a double, b double, cell string")
    out = ppl_query(
        spark,
        "source=t | kmeans centroids=2 iterations=4 fields='a,b'",
        {"t": df})
    rows = out.collect()
    assert "ClusterID" in out.columns and "cell" in out.columns
    assert len({r.ClusterID for r in rows}) == 2
    assert all(r.cell == "x" for r in rows)


def test_trendline_guard_refuses_unreduced_corpus(spark):
    # a raw-corpus trendline would single-partition the whole frame
    # through one task; the guard probes with a bounded limit job and
    # refuses instead
    import pytest as _pytest

    from siem_on_amazon_opensearch_service_spark.ppl import PPLError, ppl_query

    big = spark.range(0, 500).selectExpr("id", "id * 2.0 AS v")
    with _pytest.raises(PPLError, match="reducing stage"):
        ppl_query(spark, "search source=t | trendline sort +id sma(3, v)",
                  {"t": big}, global_window_limit=100)
    # same pipe, reduced first: allowed (head bounds the frame)
    out = ppl_query(
        spark, "search source=t | sort +id | head 10 "
        "| trendline sort +id sma(3, v)",
        {"t": big}, global_window_limit=100)
    assert out.count() == 10
    # and a small frame passes the probe without any reducing stage
    small = spark.range(0, 50).selectExpr("id", "id * 2.0 AS v")
    assert ppl_query(spark,
                     "search source=t | trendline sort +id sma(3, v)",
                     {"t": small}, global_window_limit=100).count() == 50


def test_kmeans_guard_refuses_unreduced_corpus(spark):
    import pytest as _pytest

    from siem_on_amazon_opensearch_service_spark.ppl import PPLError, ppl_query

    big = spark.range(0, 500).selectExpr(
        "id", "CAST(id % 7 AS DOUBLE) AS x", "CAST(id % 3 AS DOUBLE) AS y")
    with _pytest.raises(PPLError, match="reducing stage"):
        ppl_query(spark, "search source=t | kmeans centroids=2 fields=x,y",
                  {"t": big}, global_window_limit=100)
    # disabling the guard restores the old behavior
    out = ppl_query(spark, "search source=t | head 20 "
                    "| kmeans centroids=2 fields=x,y", {"t": big},
                    global_window_limit=100)
    assert "ClusterID" in out.columns and out.count() == 20


def test_ppl_round5_parser_fixes():
    """Round-5 parser pins: head default, one-arg round, literal-only
    `in` lists, integer-literal round digits."""
    # head with no count = 10 (the upstream default; was ValueError)
    assert parse_ppl("source=t | head").stages == [("head", 10)]
    # one-arg round -> 0 digits in BOTH backends
    sql = ppl_to_sql("source=t | eval r = round(x)")
    assert "round(x, 0)" in sql
    # non-integer digits are a loud PPLError, not a backend crash
    with pytest.raises(PPLError, match="integer literal"):
        ppl_to_sql("source=t | eval r = round(x, 2.5)")
    with pytest.raises(PPLError, match="integer literal"):
        ppl_to_sql("source=t | eval r = round(x, y)")
    # a column ref inside in (...) would silently become a string
    # literal on the DataFrame side -- refused at parse time
    with pytest.raises(PPLError, match="literal"):
        parse_expr("a in (b, 'c')")
    # negative round digits stay legal (round to tens)
    assert "round(x, -1)" in ppl_to_sql("source=t | eval r = round(x, -1)")


def test_ppl_unary_minus_shapes():
    n = parse_expr("-5")
    assert n == ("num", -5)
    n = parse_expr("x > -5")
    assert n == ("bin", ">", ("col", "x"), ("num", -5))
    n = parse_expr("-x")
    assert n == ("bin", "-", ("num", 0), ("col", "x"))
