"""Registry entries for source-format readers (S-series) and scalar
functions (F-series). Inputs are synthesized deterministically from
the events table with identical expressions on both engines, so the
parse logic itself is what the oracle verifies."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _t, register
from .functions import scalars
from .sources import cef, csvfmt, multiline, textfmt

# ---------------------------------------------------------------------------
# S3: JSON
# ---------------------------------------------------------------------------


@register(
    "src_json_props",
    """
    SELECT event_type, sum(json_extract_string(props, '$.k')::BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def src_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-string column parse (S3 analog): schema-on-read the props
    payload, aggregate an extracted field."""
    from .sources.jsonfmt import parse_json_col

    ev = parse_json_col(_t(spark, sf_dir, "events"), "props", "k long")
    return ev.groupBy("event_type").agg(
        F.sum(F.col("rec.k")).alias("sum_k"), F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# S2: regex text lines (apache access shape)
# ---------------------------------------------------------------------------

_AP_LINE_DUCK = (
    "'192.0.2.' || (user_id % 256)::VARCHAR || ' - u' || user_id::VARCHAR"
    " || ' [01/Jan/2024:00:00:00 +0000] \"GET /p/' || event_id::VARCHAR"
    " || ' HTTP/1.1\" ' || (100 + (floor(value)::BIGINT % 500))::VARCHAR"
    " || ' ' || (event_id % 10000)::VARCHAR"
)


def _ap_line_spark() -> F.Column:
    return F.concat(
        F.lit("192.0.2."), (F.col("user_id") % 256).cast("string"),
        F.lit(" - u"), F.col("user_id").cast("string"),
        F.lit(' [01/Jan/2024:00:00:00 +0000] "GET /p/'),
        F.col("event_id").cast("string"),
        F.lit(' HTTP/1.1" '),
        (F.floor(F.col("value")).cast("long") % 500 + 100).cast("string"),
        F.lit(" "), (F.col("event_id") % 10000).cast("string"),
    )


@register(
    "src_regex_apache",
    f"""
    WITH lines AS (
      SELECT event_id, {_AP_LINE_DUCK} AS line FROM events WHERE event_id < 500
    )
    SELECT event_id,
      regexp_extract(line, '{textfmt.APACHE_PATTERN}', 1) AS client_ip,
      regexp_extract(line, '{textfmt.APACHE_PATTERN}', 4) AS method,
      regexp_extract(line, '{textfmt.APACHE_PATTERN}', 5) AS request,
      regexp_extract(line, '{textfmt.APACHE_PATTERN}', 7) AS status,
      regexp_extract(line, '{textfmt.APACHE_PATTERN}', 8) AS bytes
    FROM lines
    """,
)
def src_regex_apache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-regex text-line source (S2): synthesize access-log lines,
    parse them back with the shared pattern."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    lines = ev.select("event_id", _ap_line_spark().alias("line"))
    parsed = textfmt.regex_parse(lines, "line", textfmt.APACHE_PATTERN,
                                 textfmt.APACHE_GROUPS)
    return parsed.select(
        "event_id", "client_ip", "method", "request", "status", "bytes"
    )


# ---------------------------------------------------------------------------
# S8: CEF
# ---------------------------------------------------------------------------

_CEF_LINE_DUCK = (
    "'CEF:0|AcmeCo|WAF|1.0|' || (event_id % 50)::VARCHAR"
    " || '|Blocked request|' || (event_id % 10)::VARCHAR"
    " || '|src=10.0.' || (user_id % 256)::VARCHAR || '.1 dst=192.0.2.'"
    " || (event_id % 256)::VARCHAR || ' act=block'"
)


def _cef_line_spark() -> F.Column:
    return F.concat(
        F.lit("CEF:0|AcmeCo|WAF|1.0|"), (F.col("event_id") % 50).cast("string"),
        F.lit("|Blocked request|"), (F.col("event_id") % 10).cast("string"),
        F.lit("|src=10.0."), (F.col("user_id") % 256).cast("string"),
        F.lit(".1 dst=192.0.2."), (F.col("event_id") % 256).cast("string"),
        F.lit(" act=block"),
    )


@register(
    "src_cef_extract",
    f"""
    WITH lines AS (
      SELECT event_id, {_CEF_LINE_DUCK} AS line FROM events WHERE event_id < 500
    ), p AS (SELECT event_id, string_split(line, '|') AS f FROM lines)
    SELECT event_id, f[2] AS device_vendor, f[5] AS signature_id,
           f[7] AS severity,
           regexp_extract(f[8], 'src=(\\S+)', 1) AS src,
           regexp_extract(f[8], 'act=(\\S+)', 1) AS act
    FROM p
    """,
)
def src_cef_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEF source (S8): header split + k=v extension map."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    lines = ev.select("event_id", _cef_line_spark().alias("line"))
    parsed = cef.parse_cef(lines, "line")
    return parsed.select(
        "event_id", "device_vendor", "signature_id", "severity",
        F.col("ext")["src"].alias("src"), F.col("ext")["act"].alias("act"),
    )


# ---------------------------------------------------------------------------
# S4: CSV
# ---------------------------------------------------------------------------


@register(
    "src_csv_fields",
    """
    WITH lines AS (
      SELECT event_id,
        event_id::VARCHAR || ',' || event_type || ',' || user_id::VARCHAR AS line
      FROM events WHERE event_id < 500
    )
    SELECT event_id, string_split(line, ',')[1] AS id,
           string_split(line, ',')[2] AS kind,
           string_split(line, ',')[3] AS user_ref
    FROM lines
    """,
)
def src_csv_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source (S4): header-driven parse with safe-key renaming
    ('-' -> '_', the reference's key-hygiene rule)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    lines = ev.select(
        "event_id",
        F.concat_ws(
            ",", F.col("event_id").cast("string"), "event_type",
            F.col("user_id").cast("string"),
        ).alias("line"),
    )
    parsed = csvfmt.parse_csv_col(lines, "line", "id,kind,user-ref")
    return parsed.select("event_id", "id", "kind", "user_ref")


# ---------------------------------------------------------------------------
# S5: multiline assembly
# ---------------------------------------------------------------------------


@register(
    "src_multiline_assemble",
    """
    WITH lines AS (
      SELECT user_id % 10 AS file_id, event_id AS lineno,
        CASE WHEN event_id % 3 = 0
             THEN 'START ' || event_id::VARCHAR
             ELSE '  cont ' || event_id::VARCHAR END AS line
      FROM events WHERE event_id < 300
    ), marked AS (
      SELECT file_id, lineno, line,
        sum(CASE WHEN line LIKE 'START%' THEN 1 ELSE 0 END)
          OVER (PARTITION BY file_id ORDER BY lineno) AS record_id
      FROM lines
    )
    SELECT file_id, record_id,
           string_agg(line, chr(10) ORDER BY lineno) AS record
    FROM marked GROUP BY file_id, record_id
    """,
)
def src_multiline_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiline source (S5): first-line-regex record assembly as a
    cumulative-count window + ordered string agg (no stateful Python)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    lines = ev.select(
        (F.col("user_id") % 10).alias("file_id"),
        F.col("event_id").alias("lineno"),
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(F.lit("START "), F.col("event_id").cast("string")),
        ).otherwise(
            F.concat(F.lit("  cont "), F.col("event_id").cast("string"))
        ).alias("line"),
    )
    return multiline.assemble_records(lines, "line", "file_id", "lineno",
                                      r"^START")


# ---------------------------------------------------------------------------
# F2/F13: epoch auto-ranging
# ---------------------------------------------------------------------------


@register(
    "fn_epoch_dispatch",
    f"""
    WITH e AS (
      SELECT event_id, ts,
        CASE event_id % 3
          WHEN 0 THEN floor(epoch(ts))::BIGINT
          WHEN 1 THEN floor(epoch(ts))::BIGINT * 1000
          ELSE floor(epoch(ts))::BIGINT * 1000000 END AS raw
      FROM events WHERE event_id < 500
    )
    SELECT event_id,
      strftime({scalars.duckdb_epoch_auto_sql('raw')},
               '%Y-%m-%d %H:%M:%S') AS parsed,
      (date_trunc('second', ts) = {scalars.duckdb_epoch_auto_sql('raw')})
        AS roundtrip_ok
    FROM e
    """,
)
def fn_epoch_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch unit auto-ranging (F2/F13): s/ms/us inputs all parse back
    to the original timestamp."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    raw = (
        F.when(F.col("event_id") % 3 == 0, F.unix_timestamp("ts"))
        .when(F.col("event_id") % 3 == 1, F.unix_timestamp("ts") * 1000)
        .otherwise(F.unix_timestamp("ts") * 1000000)
    )
    e = ev.select("event_id", "ts", raw.alias("raw"))
    parsed = scalars.epoch_auto_ts("raw")
    return e.select(
        "event_id",
        F.date_format(parsed, "yyyy-MM-dd HH:mm:ss").alias("parsed"),
        (F.date_trunc("second", F.col("ts")) == parsed).alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# F3: URL field split
# ---------------------------------------------------------------------------

_URL_DUCK = (
    "'https://host' || (event_id % 97)::VARCHAR"
    " || '.example.com:8443/dir%2520x/page' || (event_id % 7)::VARCHAR"
    " || '.html?q=' || (user_id % 100)::VARCHAR || '&r=1#s' || (event_id % 5)::VARCHAR"
)


def _url_spark() -> F.Column:
    return F.concat(
        F.lit("https://host"), (F.col("event_id") % 97).cast("string"),
        F.lit(".example.com:8443/dir%2520x/page"),
        (F.col("event_id") % 7).cast("string"),
        F.lit(".html?q="), (F.col("user_id") % 100).cast("string"),
        F.lit("&r=1#s"), (F.col("event_id") % 5).cast("string"),
    )


@register(
    "fn_url_parse",
    (lambda d: f"""
    WITH u AS (
      SELECT event_id, {_URL_DUCK} AS url FROM events WHERE event_id < 500
    )
    SELECT event_id, {d['scheme']} AS scheme, {d['domain']} AS domain,
           {d['port']} AS port, {d['path']} AS path, {d['query']} AS query,
           {d['fragment']} AS fragment, {d['extension']} AS extension
    FROM u
    """)(scalars.duckdb_url_sql("url")),
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL request-target split with the reference's double-decode
    order (F3, ref siem/utils.py:207-289)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    u = ev.select("event_id", _url_spark().alias("url"))
    fields = scalars.url_fields("url")
    return u.select(
        "event_id", *[c.alias(n) for n, c in fields.items()]
    )


# ---------------------------------------------------------------------------
# F5: IP validation + int encoding
# ---------------------------------------------------------------------------


@register(
    "fn_ip_roundtrip",
    """
    WITH x AS (
      SELECT event_id, (user_id * 9973 + event_id) % 4294967296 AS ip_int
      FROM events WHERE event_id < 500
    ), s AS (
      SELECT event_id, ip_int,
        ((ip_int // 16777216) % 256)::VARCHAR || '.' ||
        ((ip_int // 65536) % 256)::VARCHAR || '.' ||
        ((ip_int // 256) % 256)::VARCHAR || '.' ||
        (ip_int % 256)::VARCHAR AS ip_str
      FROM x
    )
    SELECT event_id, ip_str, TRUE AS is_valid, ip_int AS back
    FROM s
    """,
)
def fn_ip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 string<->uint32 round-trip + validity (F5; the `ip` typed
    column encoding the range joins key on)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    x = ev.select(
        "event_id",
        ((F.col("user_id") * 9973 + F.col("event_id")) % 4294967296).alias("ip_int"),
    )
    s = x.select(
        "event_id", "ip_int", scalars.long_to_ipv4("ip_int").alias("ip_str")
    )
    return s.select(
        "event_id", "ip_str",
        scalars.is_ipv4("ip_str").alias("is_valid"),
        scalars.ipv4_to_long("ip_str").alias("back"),
    )


# ---------------------------------------------------------------------------
# F10/F11: protocol + outcome maps
# ---------------------------------------------------------------------------


@register(
    "fn_protocol_outcome",
    f"""
    SELECT {scalars.duckdb_protocol_sql('(event_id % 60)')} AS protocol,
           CASE WHEN 100 + (floor(value)::BIGINT % 500) < 400 THEN 'success'
                ELSE 'failure' END AS outcome,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def fn_protocol_outcome(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Protocol-number naming (F10) + HTTP outcome classification (F11)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            scalars.protocol_name(F.col("event_id") % 60).alias("protocol"),
            scalars.http_outcome(
                F.floor(F.col("value")).cast("long") % 500 + 100
            ).alias("outcome"),
        )
        .groupBy("protocol", "outcome")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# J6: user-agent parse
# ---------------------------------------------------------------------------

_UA_SAMPLES = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) "
    "Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/17.1 Safari/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "curl/8.4.0",
    "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
    "SomeUnknownClient/1.0",
]


@register(
    "fn_ua_parse",
    (lambda d: f"""
    WITH ua AS (
      SELECT event_id,
        (['{"', '".join(s.replace("'", "''") for s in _UA_SAMPLES)}'])
          [(event_id % {len(_UA_SAMPLES)}) + 1] AS ua_string
      FROM events WHERE event_id < 500
    )
    SELECT event_id, {d['ua_family']} AS ua_family,
           {d['ua_version']} AS ua_version, {d['ua_os']} AS ua_os
    FROM ua
    """)(scalars.duckdb_ua_sql("ua_string")),
)
def fn_ua_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-agent parse (J6, ref siem/user_agent.py:22-54): first-
    match regex cascade for family/version/os, fully native."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    samples = F.array(*[F.lit(s) for s in _UA_SAMPLES])
    ua = ev.select(
        "event_id",
        F.element_at(
            samples, (F.col("event_id") % len(_UA_SAMPLES) + 1).cast("int")
        ).alias("ua_string"),
    )
    fields = scalars.ua_fields("ua_string")
    return ua.select("event_id", *[c.alias(n) for n, c in fields.items()])


# ---------------------------------------------------------------------------
# F4/J4: XFF client-ip selection
# ---------------------------------------------------------------------------


@register(
    "fn_xff_client_ip",
    """
    WITH x AS (
      SELECT event_id,
        '10.0.0.1, 198.51.' || (user_id % 200)::VARCHAR || '.7, 172.16.0.'
          || (event_id % 200)::VARCHAR AS xff
      FROM events WHERE event_id < 500
    ), ips AS (
      SELECT event_id, xff,
        list_filter(list_transform(string_split(xff, ','), s -> trim(s)),
          s -> regexp_matches(s,
            '^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$'))
          AS lst
      FROM x
    ), c AS (
      SELECT event_id, xff,
        list_filter(list_reverse(lst),
          s -> NOT (starts_with(s, '10.') OR starts_with(s, '172.16.'))) AS cand,
        lst
      FROM ips
    )
    SELECT event_id,
      CASE WHEN len(cand) > 0 THEN cand[1]
           WHEN len(lst) > 0 THEN lst[1] END AS client_ip
    FROM c
    """,
)
def fn_xff_client_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-Forwarded-For client selection (F4+J4): rightmost IP outside
    the trusted proxy prefixes."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    x = ev.select(
        "event_id",
        F.concat(
            F.lit("10.0.0.1, 198.51."), (F.col("user_id") % 200).cast("string"),
            F.lit(".7, 172.16.0."), (F.col("event_id") % 200).cast("string"),
        ).alias("xff"),
    )
    return x.select(
        "event_id",
        scalars.xff_client_ip("xff", ["10.", "172.16."]).alias("client_ip"),
    )
