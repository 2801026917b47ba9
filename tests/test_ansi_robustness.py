"""Round-4 ANSI-robustness pins: malformed log input must NULL (the
reference's log-and-drop contract), never throw, under Spark 4's
default ANSI mode — and the CEF escape/duplicate edge cases parse per
spec."""

from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.functions.scalars import (
    epoch_auto_ts,
    http_outcome,
    ip_any_to_3long,
    ipv4_to_long,
    protocol_name,
    syslog_ts,
    url_fields,
    xff_client_ip_ranged,
)
from siem_on_amazon_opensearch_service_spark.sources.cef import parse_cef
from siem_on_amazon_opensearch_service_spark.sources.multiline import (
    assemble_records,
)


def test_malformed_inputs_null_not_throw(spark):
    df = spark.createDataFrame(
        [("https://h/a%25b", "Feb 29 12:00:00", "-", "HOPOPT",
          "garbage", "-")],
        "url string, sl string, status string, proto string, "
        "ip string, ep string")
    row = df.select(
        url_fields("url")["path"].alias("path"),
        syslog_ts(F.col("sl"), "2026-01-15 00:00:00").alias("ts"),
        http_outcome("status").alias("outcome"),
        protocol_name("proto").alias("proto"),
        ipv4_to_long("ip").alias("ip4"),
        epoch_auto_ts("ep").alias("ep"),
        ip_any_to_3long("ip")["ip6_lo"].alias("lo"),
    ).collect()[0]
    assert row["path"] == "/a%b"       # singly-encoded percent survives
    assert row["ts"] is None           # 2026 is not a leap year
    assert row["outcome"] == "unknown"
    assert row["proto"] == "HOPOPT"    # falls through to the string form
    assert row["ip4"] is None
    assert row["ep"] is None
    assert row["lo"] is None


def test_xff_null_header_keeps_source_ip(spark):
    df = spark.createDataFrame(
        [(1, "203.0.113.9", None),
         (2, "10.0.0.5", "198.51.100.7, 10.0.0.9")],
        "id long, src string, xff string")
    ranges = spark.createDataFrame(
        [(167772160, 184549375)], "net_start long, net_end long")  # 10/8
    got = {r["id"]: r["client_ip"]
           for r in xff_client_ip_ranged(df, "id", "src", "xff",
                                         ranges).collect()}
    assert got[1] == "203.0.113.9"     # no header -> source kept
    assert got[2] == "198.51.100.7"    # trusted source -> walk the chain


def test_cef_escapes_pipes_and_duplicate_keys(spark):
    lines = [
        (0, "CEF:0|V|P|1|100|name|5|msg=a|b src=1.2.3.4"),
        (1, "CEF:0|V|P|1|100|name|5|src=1.1.1.1 src=2.2.2.2"),
        (2, "CEF:0|V\\\\|P|1|100|name|5|src=9.9.9.9"),
        (3, "CEF:0|Ven\\|dor|P|1|100|name|5|k=v"),
    ]
    df = spark.createDataFrame(lines, "i long, line string")
    rows = {r["i"]: r for r in parse_cef(df, "line").collect()}
    # raw pipe inside the extension: nothing truncated
    assert dict(rows[0]["ext"]) == {"msg": "a|b", "src": "1.2.3.4"}
    # duplicate key: last wins, no DUPLICATED_MAP_KEY crash
    assert dict(rows[1]["ext"]) == {"src": "2.2.2.2"}
    # escaped backslash then a REAL delimiter: fields do not shift
    assert rows[2]["device_vendor"] == "V\\"
    assert rows[2]["device_product"] == "P"
    assert dict(rows[2]["ext"]) == {"src": "9.9.9.9"}
    # escaped pipe inside a header field
    assert rows[3]["device_vendor"] == "Ven|dor"


def test_multiline_first_re_is_anchored(spark):
    df = spark.createDataFrame(
        [("f", 1, "START one"),
         ("f", 2, "  cont has START inside"),
         ("f", 3, "START two")],
        "file string, lineno long, value string")
    recs = assemble_records(df, "value", file_col="file",
                            lineno_col="lineno", first_re="START")
    texts = sorted(r[recs.columns[-1]] for r in recs.collect())
    assert len(texts) == 2
    assert texts[0] == "START one\n  cont has START inside"
