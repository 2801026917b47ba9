"""IPv6 3-column split + timestamp dispatcher breadth, verified
against Python's ipaddress / datetime ground truth AND the DuckDB twin
SQL (the same fragments the registry oracles embed)."""

import datetime as dt
import ipaddress
import random

import duckdb
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.functions import scalars


def _random_v6(rng, n):
    out = []
    for _ in range(n):
        v = rng.getrandbits(128)
        a = ipaddress.IPv6Address(v)
        out.append(str(a))  # compressed canonical form
        out.append(a.exploded)  # fully-written form
    out += ["::", "::1", "2001:db8::", "fe80::1:0:0:1", "::ffff:1.2.3.4",
            "64:ff9b::192.0.2.33"]
    return out


def test_ipv6_split_matches_ipaddress(spark):
    rng = random.Random(1234)
    ips = _random_v6(rng, 40)
    df = spark.createDataFrame([(s,) for s in ips], "ip string")
    parts = scalars.ipv6_to_3long("ip")
    rows = df.select(
        "ip", scalars.ipv6_to_hex32("ip").alias("h"),
        *[c.alias(n) for n, c in parts.items()],
        scalars.longs_to_ipv6(
            parts["ip6_hi"], parts["ip6_mid"], parts["ip6_lo"]
        ).alias("back"),
    ).collect()
    for r in rows:
        want = int(ipaddress.IPv6Address(r["ip"]))
        assert r["h"] == format(want, "032x"), r["ip"]
        assert r["ip6_hi"] == want >> 80
        assert r["ip6_mid"] == (want >> 32) & ((1 << 48) - 1)
        assert r["ip6_lo"] == want & ((1 << 32) - 1)
        assert int(ipaddress.IPv6Address(r["back"])) == want


def test_ipv6_duckdb_twin_agrees():
    rng = random.Random(99)
    ips = _random_v6(rng, 25)
    con = duckdb.connect()
    hex_sql = scalars.duckdb_ipv6_hex32_sql("ip")
    q = (
        f"SELECT ip, {hex_sql} AS h, "
        f"{scalars.duckdb_hex_to_long_sql(hex_sql, 1, 12)} AS hi, "
        f"{scalars.duckdb_hex_to_long_sql(hex_sql, 13, 12)} AS mid, "
        f"{scalars.duckdb_hex_to_long_sql(hex_sql, 25, 8)} AS lo "
        f"FROM (SELECT unnest({ips!r}) AS ip)"
    )
    for ip, h, hi, mid, lo in con.execute(q).fetchall():
        want = int(ipaddress.IPv6Address(ip))
        assert h == format(want, "032x"), ip
        assert (hi, mid, lo) == (
            want >> 80, (want >> 32) & ((1 << 48) - 1), want & ((1 << 32) - 1)
        )


def test_ip_any_dispatch(spark):
    mixed = ["10.1.2.3", "2001:db8::5", "255.255.255.255", "::ffff:1.2.3.4"]
    df = spark.createDataFrame([(s,) for s in mixed], "ip string")
    parts = scalars.ip_any_to_3long("ip")
    got = {
        r["ip"]: (r["hi"], r["mid"], r["lo"])
        for r in df.select(
            "ip", parts["ip6_hi"].alias("hi"), parts["ip6_mid"].alias("mid"),
            parts["ip6_lo"].alias("lo"),
        ).collect()
    }
    for ip in mixed:
        want = int(ipaddress.IPv6Address(ip)) if ":" in ip else int(
            ipaddress.IPv6Address(f"::ffff:{ip}")
        )
        assert got[ip] == (
            want >> 80, (want >> 32) & ((1 << 48) - 1), want & ((1 << 32) - 1)
        ), ip


def test_syslog_year_inference(spark):
    now = "2024-03-10 12:00:00"
    rows = spark.createDataFrame(
        [("Jan  5 10:00:00",), ("Mar 10 11:59:00",), ("Mar 11 00:00:01",),
         ("Dec 31 23:59:59",)],
        "s string",
    ).select("s", scalars.syslog_ts("s", now).alias("t")).collect()
    got = {r["s"]: r["t"] for r in rows}
    assert got["Jan  5 10:00:00"] == dt.datetime(2024, 1, 5, 10, 0, 0)
    assert got["Mar 10 11:59:00"] == dt.datetime(2024, 3, 10, 11, 59, 0)
    # future relative to "now" -> previous year (reference rule)
    assert got["Mar 11 00:00:01"] == dt.datetime(2023, 3, 11, 0, 0, 1)
    assert got["Dec 31 23:59:59"] == dt.datetime(2023, 12, 31, 23, 59, 59)


def test_format_list_and_tz(spark):
    rows = spark.createDataFrame(
        [("2024/01/02 03:04:05", 5.5), ("02/Jan/2024:03:04:05", -8.0),
         ("garbage", 0.0)],
        "s string, off double",
    ).select(
        "s",
        scalars.ts_from_formats("s").alias("t"),
        scalars.tz_shift_to_utc(
            scalars.ts_from_formats("s"), F.col("off")
        ).alias("utc"),
    ).collect()
    got = {r["s"]: r for r in rows}
    assert got["2024/01/02 03:04:05"]["t"] == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert got["2024/01/02 03:04:05"]["utc"] == dt.datetime(
        2024, 1, 1, 21, 34, 5
    )
    assert got["02/Jan/2024:03:04:05"]["utc"] == dt.datetime(
        2024, 1, 2, 11, 4, 5
    )
    assert got["garbage"]["t"] is None and got["garbage"]["utc"] is None
