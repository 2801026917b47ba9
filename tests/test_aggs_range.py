"""Range-family aggs, auto_date_histogram, adjacency_matrix and the
sampler scopes vs pure-Python brute force."""

import datetime as dt
from collections import Counter
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators.aggs import (
    _cidr_bounds, adjacency_matrix, auto_date_histogram,
    choose_auto_interval, date_range_buckets, diversified_sampler_top,
    ip_range_buckets, range_buckets, sampler_top,
)

T0 = dt.datetime(2024, 3, 1, 6, 0, 0)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (
            i,
            f"type{i % 5}",
            float((i * 37) % 200),
            T0 + dt.timedelta(minutes=13 * i),
            f"10.{(i * 7) % 4}.{(i * 3) % 256}.{i % 256}",
        )
        for i in range(400)
    ]
    sdf = spark.createDataFrame(
        rows,
        "id long, event_type string, value double, ts timestamp, ip string",
    )
    return sdf, rows


def test_range_buckets_overlapping_open_ended(events):
    sdf, rows = events
    ranges = [("low", None, 50.0), ("mid", 25.0, 150.0), ("high", 150.0, None)]
    got = {r["key"]: (r["doc_count"], r["metric_sum"])
           for r in range_buckets(
               sdf, F.col("value"), ranges, metric=F.col("value")).collect()}
    for key, lo, hi in ranges:
        sel = [r[2] for r in rows
               if (lo is None or r[2] >= lo) and (hi is None or r[2] < hi)]
        assert got[key][0] == len(sel)
        assert got[key][1] == pytest.approx(round(sum(sel), 4))
    # overlap: a value of 30 is in both low and mid
    assert got["low"][0] + got["mid"][0] > len(rows) - got["high"][0]


def test_date_range_buckets(events):
    sdf, rows = events
    ranges = [
        ("before", None, "2024-03-02 00:00:00"),
        ("day2", "2024-03-02 00:00:00", "2024-03-03 00:00:00"),
        ("after", "2024-03-03 00:00:00", None),
    ]
    got = {r["key"]: r["doc_count"]
           for r in date_range_buckets(sdf, F.col("ts"), ranges).collect()}
    b1 = dt.datetime(2024, 3, 2)
    b2 = dt.datetime(2024, 3, 3)
    assert got["before"] == sum(1 for r in rows if r[3] < b1)
    assert got["day2"] == sum(1 for r in rows if b1 <= r[3] < b2)
    assert got["after"] == sum(1 for r in rows if r[3] >= b2)
    assert sum(got.values()) == len(rows)


def ip2int(s):
    a, b, c, d = (int(x) for x in s.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


def test_cidr_bounds():
    lo, hi = _cidr_bounds("10.1.0.0/16")
    assert lo == ip2int("10.1.0.0")
    assert hi == ip2int("10.2.0.0")
    lo, hi = _cidr_bounds("10.1.2.3/32")
    assert (lo, hi) == (ip2int("10.1.2.3"), ip2int("10.1.2.3") + 1)
    # base not aligned to the mask is floored to the network address
    lo, hi = _cidr_bounds("10.1.2.3/24")
    assert lo == ip2int("10.1.2.0")


def test_ip_range_buckets(events):
    sdf, rows = events
    got = {r["key"]: r["doc_count"] for r in ip_range_buckets(
        sdf, F.col("ip"),
        ranges=[("lowhalf", None, "10.2.0.0")],
        masks=[("net1", "10.1.0.0/16"), ("net3", "10.3.0.0/16")],
    ).collect()}
    ints = [ip2int(r[4]) for r in rows]
    assert got["lowhalf"] == sum(1 for v in ints if v < ip2int("10.2.0.0"))
    assert got["net1"] == sum(
        1 for v in ints if ip2int("10.1.0.0") <= v < ip2int("10.2.0.0"))
    assert got["net3"] == sum(
        1 for v in ints if ip2int("10.3.0.0") <= v < ip2int("10.4.0.0"))


def test_choose_auto_interval_ladder():
    assert choose_auto_interval(9, 10) == "1s"
    assert choose_auto_interval(3600, 10) == "10m"
    assert choose_auto_interval(86400 * 3, 10) == "12h"
    assert choose_auto_interval(86400 * 400, 10) == "3M"
    assert choose_auto_interval(86400 * 365 * 50, 10) == "1y"


def test_auto_date_histogram_counts_and_bound(events):
    sdf, rows = events
    got = auto_date_histogram(sdf, F.col("ts"), target_buckets=10).collect()
    # span = 399*13 min ≈ 3.6 days -> 12h rung
    assert {r["interval"] for r in got} == {"12h"}
    assert len(got) <= 10
    exp = Counter()
    for r in rows:
        # session tz is UTC, so the naive fixture datetimes ARE UTC
        secs = int(r[3].replace(
            tzinfo=dt.timezone.utc).timestamp()) // 43200 * 43200
        exp[dt.datetime.fromtimestamp(
            secs, dt.timezone.utc).strftime("%Y-%m-%d %H:%M:%S")] += 1
    assert {r["bucket"]: r["n"] for r in got} == dict(exp)


def test_auto_date_histogram_calendar_rung(spark):
    rows = [(dt.datetime(2020 + i // 12, i % 12 + 1, 15),) for i in range(36)]
    sdf = spark.createDataFrame(rows, "ts timestamp")
    got = auto_date_histogram(sdf, F.col("ts"), target_buckets=15).collect()
    assert {r["interval"] for r in got} == {"3M"}
    exp = Counter()
    for (t,) in rows:
        q = (t.month - 1) // 3 * 3 + 1
        exp[f"{t.year}-{q:02d}-01 00:00:00"] += 1
    assert {r["bucket"]: r["n"] for r in got} == dict(exp)


def test_adjacency_matrix(events):
    sdf, rows = events
    filters = [
        ("hot", F.col("value") >= 150),
        ("t0", F.col("event_type") == "type0"),
        ("even", F.col("id") % 2 == 0),
    ]
    py = {
        "hot": lambda r: r[2] >= 150,
        "t0": lambda r: r[1] == "type0",
        "even": lambda r: r[0] % 2 == 0,
    }
    exp = Counter()
    for r in rows:
        names = [n for n in ("hot", "t0", "even") if py[n](r)]
        for n in names:
            exp[n] += 1
        # pair keys are a&b with a < b ALPHABETICALLY (upstream sorts
        # the keyed filters by name), independent of filter order
        for a, b in combinations(sorted(names), 2):
            exp[f"{a}&{b}"] += 1
    got = {r["key"]: r["doc_count"]
           for r in adjacency_matrix(sdf, filters).collect()}
    assert got == dict(exp)


def test_sampler_plan_and_rows(events):
    sdf, rows = events
    s = sampler_top(sdf, [F.desc("value"), F.asc("id")], shard_size=20)
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    exp = sorted(rows, key=lambda r: (-r[2], r[0]))[:20]
    assert [r["id"] for r in s.collect()] == [r[0] for r in exp]


def test_diversified_sampler(events):
    sdf, rows = events
    got = diversified_sampler_top(
        sdf, [F.desc("value"), F.asc("id")], "event_type",
        max_docs_per_value=3, shard_size=10,
    ).collect()
    seen = Counter()
    exp = []
    for r in sorted(rows, key=lambda r: (-r[2], r[0])):
        if seen[r[1]] < 3:
            seen[r[1]] += 1
            exp.append(r[0])
    assert [r["id"] for r in got] == exp[:10]
    per_type = Counter(r["event_type"] for r in got)
    assert max(per_type.values()) <= 3
