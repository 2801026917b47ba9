"""Registry entries for source-format readers (S-series) and scalar
functions (F-series), consolidated into five driver-gated suites so
every family carries a CORRECTNESS row (the driver records at most 50
entries). Inputs are synthesized deterministically from the events
table with identical expressions on both engines, so the parse logic
itself is what the oracle verifies.

  src_line_formats : S2 regex text + S8 CEF + S4 CSV
  src_structured   : S3 JSON + S10 envelope + S5 multiline + S6 XML
                     + S7 windows-event XML
  fn_time_suite    : F2/F13 epoch auto-range + syslog year inference
                     + strptime format list + per-source TZ shift
  fn_ip_suite      : F5 v4 roundtrip + J2 IPv6 3-column split + F4/J4
                     XFF client-ip
  fn_web_suite     : F3 URL split + J6 user-agent + F10/F11 maps
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _t, _utc, register
from .functions import scalars
from .sources import cef, csvfmt, multiline, textfmt, winevt, xmlfmt

# ---------------------------------------------------------------------------
# src_line_formats: S2 (regex apache) + S8 (CEF) + S4 (CSV)
# canonical row: (fmt, key, v1..v5)
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
    "src_line_formats",
    f"""
    WITH e AS (SELECT * FROM events WHERE event_id < 500),
    ap AS (SELECT event_id, {_AP_LINE_DUCK} AS line FROM e),
    cf AS (SELECT event_id, {_CEF_LINE_DUCK} AS line FROM e),
    cv AS (
      SELECT event_id,
        event_id::VARCHAR || ',' || event_type || ',' || user_id::VARCHAR
          AS line
      FROM e
    ), cfp AS (SELECT event_id, string_split(line, '|') AS f FROM cf)
    SELECT 'apache' AS fmt, event_id::VARCHAR AS key,
      regexp_extract(line, '{textfmt.APACHE_PATTERN}', 1) AS v1,
      regexp_extract(line, '{textfmt.APACHE_PATTERN}', 4) AS v2,
      regexp_extract(line, '{textfmt.APACHE_PATTERN}', 5) AS v3,
      regexp_extract(line, '{textfmt.APACHE_PATTERN}', 7) AS v4,
      regexp_extract(line, '{textfmt.APACHE_PATTERN}', 8) AS v5
    FROM ap
    UNION ALL
    SELECT 'cef', event_id::VARCHAR, f[2], f[5], f[7],
      regexp_extract(f[8], 'src=(\\S+)', 1),
      regexp_extract(f[8], 'act=(\\S+)', 1)
    FROM cfp
    UNION ALL
    SELECT 'csv', event_id::VARCHAR, string_split(line, ',')[1],
      string_split(line, ',')[2], string_split(line, ',')[3], '', ''
    FROM cv
    """,
)
def src_line_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented source formats in one gated entry: named-regex
    text (S2, the shared APACHE_PATTERN), CEF header split + k=v
    extensions (S8), and CSV with safe-key renaming (S4)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)

    ap = textfmt.regex_parse(
        ev.select("event_id", _ap_line_spark().alias("line")),
        "line", textfmt.APACHE_PATTERN, textfmt.APACHE_GROUPS,
    ).select(
        F.lit("apache").alias("fmt"),
        F.col("event_id").cast("string").alias("key"),
        F.col("client_ip").alias("v1"), F.col("method").alias("v2"),
        F.col("request").alias("v3"), F.col("status").alias("v4"),
        F.col("bytes").alias("v5"),
    )
    cf = cef.parse_cef(
        ev.select("event_id", _cef_line_spark().alias("line")), "line"
    ).select(
        F.lit("cef").alias("fmt"),
        F.col("event_id").cast("string").alias("key"),
        F.col("device_vendor").alias("v1"),
        F.col("signature_id").alias("v2"), F.col("severity").alias("v3"),
        F.col("ext")["src"].alias("v4"), F.col("ext")["act"].alias("v5"),
    )
    cv = csvfmt.parse_csv_col(
        ev.select(
            "event_id",
            F.concat_ws(
                ",", F.col("event_id").cast("string"), "event_type",
                F.col("user_id").cast("string"),
            ).alias("line"),
        ),
        "line", "id,kind,user-ref",
    ).select(
        F.lit("csv").alias("fmt"),
        F.col("event_id").cast("string").alias("key"),
        F.col("id").alias("v1"), F.col("kind").alias("v2"),
        F.col("user_ref").alias("v3"),
        F.lit("").alias("v4"), F.lit("").alias("v5"),
    )
    return ap.unionByName(cf).unionByName(cv)


# ---------------------------------------------------------------------------
# src_structured: S3 JSON + S10 envelope + S5 multiline + S6 XML +
# S7 windows-event XML; canonical row: (fmt, k1, v1, v2)
# ---------------------------------------------------------------------------

_ENV_DUCK = """
  SELECT user_id,
    '{"messageType":"' ||
    (CASE WHEN user_id % 7 = 0 THEN 'CONTROL_MESSAGE' ELSE 'DATA_MESSAGE' END)
    || '","owner":"acct' || (user_id % 5)::VARCHAR
    || '","logEvents":[{"id":1,"message":"m' || user_id::VARCHAR
    || 'a"},{"id":2,"message":"m' || user_id::VARCHAR || 'b"}]}' AS payload
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 200)
"""

_XML_DUCK = (
    "'<ev id=\"' || event_id::VARCHAR || '\"><user>u' || user_id::VARCHAR"
    " || '</user><lvl>' || (event_id % 4)::VARCHAR || '</lvl></ev>'"
)

_WEVT_DUCK = (
    "'<Event><System><Provider Name=\"Microsoft-Windows-Security-Auditing\"/>"
    "<EventID>' || (4624 + event_id % 2)::VARCHAR || '</EventID>"
    "<Computer>host' || (user_id % 20)::VARCHAR || '</Computer></System>"
    "<EventData><Data Name=\"TargetUserName\">u' || user_id::VARCHAR"
    " || '</Data><Data Name=\"Status\">0x' || (event_id % 16)::VARCHAR"
    " || '</Data></EventData></Event>'"
)


#: PAN-OS raw-log messages synthesized from events (classification
#: marker in field 3, THREAT subtype in field 4 — the shapes
#: sources/pan_firewall.py classifies by substring precedence).
_PAN_DUCK = """
  SELECT '2024/10/17 14:32:34,s' || (user_id % 50)::VARCHAR || ',' ||
    (CASE WHEN event_id % 8 = 0 THEN 'SYSTEM'
          WHEN event_id % 8 = 1 THEN 'TRAFFIC'
          WHEN event_id % 8 <= 4 THEN 'THREAT'
          WHEN event_id % 8 = 5 THEN 'DECRYPTION'
          WHEN event_id % 8 = 6 THEN 'CONFIG'
          ELSE 'AUTHENTICATION' END) || ',' ||
    (CASE WHEN event_id % 8 = 2 THEN 'url'
          WHEN event_id % 8 = 3 THEN 'data'
          WHEN event_id % 8 = 4 THEN 'vulnerability'
          ELSE 'general' END) || ',tail' AS message,
    (CASE WHEN event_id % 8 = 0 THEN 'system'
          WHEN event_id % 8 = 1 THEN 'traffic'
          WHEN event_id % 8 = 2 THEN 'threat_url'
          WHEN event_id % 8 = 3 THEN 'threat_data'
          WHEN event_id % 8 = 4 THEN 'threat_others'
          WHEN event_id % 8 = 5 THEN 'decryption'
          WHEN event_id % 8 = 6 THEN 'config'
          ELSE 'authentication' END) AS grp
  FROM events
"""


def _pan_msg_spark() -> F.Column:
    m8 = F.col("event_id") % 8
    marker = (F.when(m8 == 0, "SYSTEM").when(m8 == 1, "TRAFFIC")
              .when(m8 <= 4, "THREAT").when(m8 == 5, "DECRYPTION")
              .when(m8 == 6, "CONFIG").otherwise("AUTHENTICATION"))
    sub = (F.when(m8 == 2, "url").when(m8 == 3, "data")
           .when(m8 == 4, "vulnerability").otherwise("general"))
    return F.concat(
        F.lit("2024/10/17 14:32:34,s"),
        (F.col("user_id") % 50).cast("string"), F.lit(","),
        marker, F.lit(","), sub, F.lit(",tail"))


def _env_payload_spark() -> F.Column:
    return F.concat(
        F.lit('{"messageType":"'),
        F.when(F.col("user_id") % 7 == 0, F.lit("CONTROL_MESSAGE"))
        .otherwise(F.lit("DATA_MESSAGE")),
        F.lit('","owner":"acct'), (F.col("user_id") % 5).cast("string"),
        F.lit('","logEvents":[{"id":1,"message":"m'),
        F.col("user_id").cast("string"),
        F.lit('a"},{"id":2,"message":"m'), F.col("user_id").cast("string"),
        F.lit('b"}]}'),
    )


def _xml_payload_spark() -> F.Column:
    return F.concat(
        F.lit('<ev id="'), F.col("event_id").cast("string"),
        F.lit('"><user>u'), F.col("user_id").cast("string"),
        F.lit("</user><lvl>"), (F.col("event_id") % 4).cast("string"),
        F.lit("</lvl></ev>"),
    )


def _wevt_payload_spark() -> F.Column:
    return F.concat(
        F.lit('<Event><System><Provider Name="Microsoft-Windows-Security-Auditing"/>'
              "<EventID>"),
        (4624 + F.col("event_id") % 2).cast("string"),
        F.lit("</EventID><Computer>host"), (F.col("user_id") % 20).cast("string"),
        F.lit('</Computer></System><EventData><Data Name="TargetUserName">u'),
        F.col("user_id").cast("string"),
        F.lit('</Data><Data Name="Status">0x'),
        (F.col("event_id") % 16).cast("string"),
        F.lit("</Data></EventData></Event>"),
    )


@register(
    "src_structured",
    f"""
    WITH env AS ({_ENV_DUCK}),
    e300 AS (SELECT * FROM events WHERE event_id < 300),
    ml AS (
      SELECT user_id % 10 AS file_id, event_id AS lineno,
        CASE WHEN event_id % 3 = 0
             THEN 'START ' || event_id::VARCHAR
             ELSE '  cont ' || event_id::VARCHAR END AS line
      FROM e300
    ), marked AS (
      SELECT file_id, lineno, line,
        sum(CASE WHEN line LIKE 'START%' THEN 1 ELSE 0 END)
          OVER (PARTITION BY file_id ORDER BY lineno) AS record_id
      FROM ml
    ), xml AS (SELECT event_id, {_XML_DUCK} AS x FROM e300),
    wevt AS (SELECT event_id, {_WEVT_DUCK} AS x FROM e300)
    SELECT 'json' AS fmt, event_type AS k1,
           sum(json_extract_string(props, '$.k')::BIGINT)::VARCHAR AS v1,
           count(*)::VARCHAR AS v2
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'envelope', json_extract_string(payload, '$.owner'),
           json_array_length(payload, '$.logEvents')::VARCHAR, ''
    FROM env
    WHERE json_extract_string(payload, '$.messageType') = 'DATA_MESSAGE'
    UNION ALL
    SELECT 'multiline', file_id::VARCHAR || ':' || record_id::VARCHAR,
           string_agg(line, chr(10) ORDER BY lineno), ''
    FROM marked GROUP BY file_id, record_id
    UNION ALL
    SELECT 'xml', regexp_extract(x, 'id="(\\d+)"', 1),
           regexp_extract(x, '<user>([^<]*)</user>', 1),
           regexp_extract(x, '<lvl>([^<]*)</lvl>', 1)
    FROM xml
    UNION ALL
    SELECT 'winevt', event_id::VARCHAR,
           regexp_extract(x, '<EventID>(\\d+)</EventID>', 1)
             || '@host' || regexp_extract(x, '<Computer>host(\\d+)</Computer>', 1),
           regexp_extract(x, '<Data Name="TargetUserName">([^<]*)</Data>', 1)
             || '/' || regexp_extract(x, '<Data Name="Status">([^<]*)</Data>', 1)
    FROM wevt
    UNION ALL
    SELECT 'flat', name, n::VARCHAR, '' FROM (
      SELECT 'leaf_term' AS name,
             count(*) FILTER (event_type = 'click') AS n FROM events
      UNION ALL SELECT 'root_term', count(*) FROM events
      UNION ALL SELECT 'exists', count(*) FROM events
      UNION ALL SELECT 'range',
             count(*) FILTER (event_id % 5 >= 3) FROM events
      UNION ALL SELECT 'wild',
             count(*) FILTER (event_type LIKE 'cl%') FROM events
    )
    UNION ALL
    SELECT 'pan', grp, count(*)::VARCHAR, '' FROM ({_PAN_DUCK})
    GROUP BY grp
    UNION ALL
    SELECT 'pan_parse', 'system_serials',
           count(DISTINCT string_split(message, ',')[2])::VARCHAR, ''
    FROM ({_PAN_DUCK}) WHERE grp = 'system'
    """,
)
def src_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured/nested source formats in one gated entry: JSON
    schema-on-read (S3), CloudWatch-Logs envelope with DATA_MESSAGE
    filter + logEvents fan-out (S10), stateless multiline record
    assembly (S5), generic XML via xmltodict-in-mapInPandas (S6), and
    the native windows-event XML parser with its EventData map (S7)."""
    from .sources.jsonfmt import parse_json_col

    ev = _t(spark, sf_dir, "events")
    e300 = ev.filter(F.col("event_id") < 300)

    js = parse_json_col(ev, "props", "k long").groupBy("event_type").agg(
        F.sum(F.col("rec.k")).cast("string").alias("v1"),
        F.count("*").cast("string").alias("v2"),
    ).select(
        F.lit("json").alias("fmt"), F.col("event_type").alias("k1"),
        "v1", "v2",
    )

    users = ev.filter(F.col("user_id") < 200).select("user_id").distinct()
    env = users.select("user_id", _env_payload_spark().alias("payload"))
    envp = env.withColumn(
        "rec",
        F.from_json(
            "payload",
            "messageType string, owner string, "
            "logEvents array<struct<id:int,message:string>>",
        ),
    ).filter(F.col("rec.messageType") == "DATA_MESSAGE").select(
        F.lit("envelope").alias("fmt"),
        F.col("rec.owner").alias("k1"),
        F.size("rec.logEvents").cast("string").alias("v1"),
        F.lit("").alias("v2"),
    )

    lines = e300.select(
        (F.col("user_id") % 10).alias("file_id"),
        F.col("event_id").alias("lineno"),
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(F.lit("START "), F.col("event_id").cast("string")),
        ).otherwise(
            F.concat(F.lit("  cont "), F.col("event_id").cast("string"))
        ).alias("line"),
    )
    mlp = multiline.assemble_records(
        lines, "line", "file_id", "lineno", r"^START"
    ).select(
        F.lit("multiline").alias("fmt"),
        F.concat_ws(
            ":", F.col("file_id").cast("string"),
            F.col("record_id").cast("string"),
        ).alias("k1"),
        F.col("record").alias("v1"),
        F.lit("").alias("v2"),
    )

    xmlp = xmlfmt.parse_xml_paths(
        e300.select(_xml_payload_spark().alias("x")),
        "x",
        {"xid": "ev.@id", "xuser": "ev.user", "xlvl": "ev.lvl"},
    ).select(
        F.lit("xml").alias("fmt"), F.col("xid").alias("k1"),
        F.col("xuser").alias("v1"), F.col("xlvl").alias("v2"),
    )

    wv = winevt.parse_winevt(
        e300.select("event_id", _wevt_payload_spark().alias("x")), "x"
    ).select(
        F.lit("winevt").alias("fmt"),
        F.col("event_id").cast("string").alias("k1"),
        F.concat(
            F.col("event_id_str"), F.lit("@host"),
            F.regexp_extract("computer", r"host(\d+)", 1),
        ).alias("v1"),
        F.concat(
            F.col("event_data")["TargetUserName"], F.lit("/"),
            F.col("event_data")["Status"],
        ).alias("v2"),
    )

    # 'flat' rows — flat_object field type (index/flatobject.py):
    # build a JSON payload per event, flatten to the map column, and
    # run term/root/exists/range/wildcard flat queries through the
    # shared FieldLeaf compiler in ONE aggregate pass (each predicate
    # a native higher-order exists folded as a conditional sum).
    from .index.flatobject import flatten_json
    from .index.searchbody import _filter_pred

    payload = F.concat(
        F.lit('{"meta":{"type":"'), F.col("event_type"),
        F.lit('","sev":'), (F.col("event_id") % 5).cast("string"),
        F.lit('},"tags":["t'), (F.col("user_id") % 3).cast("string"),
        F.lit('","x"]}'))
    flat_df = flatten_json(ev.select(payload.alias("payload")),
                           "payload", "attrs")
    flat_qs = {
        "leaf_term": {"term": {"attrs.meta.type": "click"}},
        "root_term": {"term": {"attrs": "x"}},
        "exists": {"exists": {"field": "attrs.meta.sev"}},
        "range": {"range": {"attrs.meta.sev": {"gte": 3}}},
        "wild": {"wildcard": {"attrs.meta.type": "cl*"}},
    }
    flat_agg = flat_df.agg(*[
        F.sum(_filter_pred(q, "payload", frame=flat_df).cast("long"))
        .alias(name) for name, q in flat_qs.items()])
    stack_args = ", ".join(f"'{n}', {n}" for n in flat_qs)
    flatp = flat_agg.select(F.expr(
        f"stack({len(flat_qs)}, {stack_args}) AS (k1, nv)")).select(
        F.lit("flat").alias("fmt"), "k1",
        F.col("nv").cast("string").alias("v1"), F.lit("").alias("v2"))

    # 'pan' rows — the PAN-OS raw-log transformer
    # (sources/pan_firewall.py): substring-precedence classification
    # counts plus a parsed-field check on the system group.
    from .sources.pan_firewall import pan_classify, pan_tables

    pmsgs = ev.select(_pan_msg_spark().alias("message"))
    classified = pan_classify(pmsgs)
    panp = (classified.groupBy("log_group")
            .agg(F.count("*").alias("_n"))
            .select(F.lit("pan").alias("fmt"),
                    F.col("log_group").alias("k1"),
                    F.col("_n").cast("string").alias("v1"),
                    F.lit("").alias("v2")))
    pan_sys = pan_tables(classified)["system"].agg(
        F.countDistinct("serial_number").alias("_n")).select(
        F.lit("pan_parse").alias("fmt"),
        F.lit("system_serials").alias("k1"),
        F.col("_n").cast("string").alias("v1"), F.lit("").alias("v2"))

    return js.unionByName(envp).unionByName(mlp).unionByName(xmlp) \
        .unionByName(wv).unionByName(flatp).unionByName(panp) \
        .unionByName(pan_sys)


# ---------------------------------------------------------------------------
# fn_time_suite: F2/F13 full dispatcher; canonical row:
# (chk, key, parsed, ok)
# ---------------------------------------------------------------------------

_NOW = "2024-06-15 12:00:00"  # deterministic "now" for year inference


@register(
    "fn_time_suite",
    f"""
    WITH e AS (SELECT * FROM events WHERE event_id < 500),
    ep AS (
      SELECT event_id, ts,
        CASE event_id % 3
          WHEN 0 THEN floor(epoch(ts))::BIGINT
          WHEN 1 THEN floor(epoch(ts))::BIGINT * 1000
          ELSE floor(epoch(ts))::BIGINT * 1000000 END AS raw
      FROM e
    ),
    sysl AS (
      SELECT event_id, strftime(ts, '%b %-d %H:%M:%S') AS s FROM e
    ),
    fmts AS (
      SELECT event_id, ts,
        CASE event_id % 3
          WHEN 0 THEN strftime(ts, '%Y/%m/%d %H:%M:%S')
          WHEN 1 THEN strftime(ts, '%d/%b/%Y:%H:%M:%S')
          ELSE strftime(ts, '%m-%d-%Y %H:%M:%S') END AS s
      FROM e
    ),
    tz AS (
      SELECT event_id, ts,
        CASE user_id % 3 WHEN 0 THEN 5.5 WHEN 1 THEN -8.0 ELSE 0.25 END
          AS off
      FROM e
    )
    SELECT 'epoch' AS chk, event_id::VARCHAR AS key,
      strftime({scalars.duckdb_epoch_auto_sql('raw')},
               '%Y-%m-%d %H:%M:%S') AS parsed,
      (date_trunc('second', ts) = {scalars.duckdb_epoch_auto_sql('raw')})
        AS ok
    FROM ep
    UNION ALL
    SELECT 'syslog', event_id::VARCHAR,
      strftime({scalars.duckdb_syslog_sql('s', _NOW)}, '%Y-%m-%d %H:%M:%S'),
      {scalars.duckdb_syslog_sql('s', _NOW)} IS NOT NULL
    FROM sysl
    UNION ALL
    SELECT 'fmtlist', event_id::VARCHAR,
      strftime({scalars.duckdb_ts_formats_sql('s')}, '%Y-%m-%d %H:%M:%S'),
      ({scalars.duckdb_ts_formats_sql('s')} = date_trunc('second', ts))
    FROM fmts
    UNION ALL
    SELECT 'tz', event_id::VARCHAR,
      strftime({scalars.duckdb_tz_shift_sql('ts', 'off')},
               '%Y-%m-%d %H:%M:%S'),
      (floor(epoch(ts))::BIGINT
       - floor(epoch({scalars.duckdb_tz_shift_sql('ts', 'off')}))::BIGINT
       = (off * 3600)::BIGINT)
    FROM tz
    """,
)
def fn_time_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full F2 timestamp dispatcher (ref siem/utils.py:308-443) in
    one gated entry: epoch s/ms/us auto-ranging, syslog year
    inference against a fixed now, strptime format-list coalesce, and
    per-source TZ-offset shift -- each emitting (parsed, ok)."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    key = F.col("event_id").cast("string").alias("key")
    fmt = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")  # noqa: E731

    raw = (
        F.when(F.col("event_id") % 3 == 0, F.unix_timestamp("ts"))
        .when(F.col("event_id") % 3 == 1, F.unix_timestamp("ts") * 1000)
        .otherwise(F.unix_timestamp("ts") * 1000000)
    )
    eparsed = scalars.epoch_auto_ts(raw)
    ep = ev.select(
        F.lit("epoch").alias("chk"), key,
        fmt(eparsed).alias("parsed"),
        (F.date_trunc("second", F.col("ts")) == eparsed).alias("ok"),
    )

    s_sys = F.date_format("ts", "MMM d HH:mm:ss")
    sp = scalars.syslog_ts(s_sys, _NOW)
    sysl = ev.select(
        F.lit("syslog").alias("chk"), key,
        fmt(sp).alias("parsed"), sp.isNotNull().alias("ok"),
    )

    s_fmt = (
        F.when(F.col("event_id") % 3 == 0,
               F.date_format("ts", "yyyy/MM/dd HH:mm:ss"))
        .when(F.col("event_id") % 3 == 1,
              F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"))
        .otherwise(F.date_format("ts", "MM-dd-yyyy HH:mm:ss"))
    )
    fparsed = scalars.ts_from_formats(s_fmt)
    fmts = ev.select(
        F.lit("fmtlist").alias("chk"), key,
        fmt(fparsed).alias("parsed"),
        (fparsed == F.date_trunc("second", F.col("ts"))).alias("ok"),
    )

    off = (
        F.when(F.col("user_id") % 3 == 0, 5.5)
        .when(F.col("user_id") % 3 == 1, -8.0)
        .otherwise(0.25)
    )
    shifted = scalars.tz_shift_to_utc(F.col("ts"), off)
    tz = ev.select(
        F.lit("tz").alias("chk"), key,
        fmt(shifted).alias("parsed"),
        (
            (F.unix_timestamp("ts") - F.unix_timestamp(shifted))
            == (off * 3600).cast("long")
        ).alias("ok"),
    )
    return ep.unionByName(sysl).unionByName(fmts).unionByName(tz)


# ---------------------------------------------------------------------------
# fn_ip_suite: F5 v4 roundtrip + J2 IPv6 split + F4/J4 XFF;
# canonical row: (chk, key, v1, v2, ok)
# ---------------------------------------------------------------------------


def _v6_oracle_parts() -> dict[str, str]:
    hex_sql = scalars.duckdb_ipv6_hex32_sql("ip6")
    return {
        "hex": hex_sql,
        "hi": scalars.duckdb_hex_to_long_sql(hex_sql, 1, 12),
        "mid": scalars.duckdb_hex_to_long_sql(hex_sql, 13, 12),
        "lo": scalars.duckdb_hex_to_long_sql(hex_sql, 25, 8),
    }


@register(
    "fn_ip_suite",
    (lambda v6: f"""
    WITH e AS (SELECT * FROM events WHERE event_id < 500),
    x4 AS (
      SELECT event_id, (user_id * 9973 + event_id) % 4294967296 AS ip_int
      FROM e
    ), s4 AS (
      SELECT event_id, ip_int,
        ((ip_int // 16777216) % 256)::VARCHAR || '.' ||
        ((ip_int // 65536) % 256)::VARCHAR || '.' ||
        ((ip_int // 256) % 256)::VARCHAR || '.' ||
        (ip_int % 256)::VARCHAR AS ip_str
      FROM x4
    ),
    x6 AS (
      SELECT event_id,
        '2001:db8::' || lower(to_hex(user_id % 65536)) || ':'
          || lower(to_hex(event_id % 65536)) AS ip6
      FROM e
    ),
    xff AS (
      SELECT event_id,
        '10.0.0.1, 198.51.' || (user_id % 200)::VARCHAR || '.7, 172.16.0.'
          || (event_id % 200)::VARCHAR AS xffs
      FROM e
    ), ips AS (
      SELECT event_id, xffs,
        list_filter(list_transform(string_split(xffs, ','), s -> trim(s)),
          s -> regexp_matches(s,
            '^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){{3}}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$'))
          AS lst
      FROM xff
    ), c AS (
      SELECT event_id,
        list_filter(list_reverse(lst),
          s -> NOT (starts_with(s, '10.') OR starts_with(s, '172.16.')))
          AS cand,
        lst
      FROM ips
    ),
    xr AS (
      SELECT event_id,
        [CASE WHEN event_id % 2 = 0
              THEN '203.0.113.' || (event_id % 250)::VARCHAR
              ELSE '10.0.0.1' END]
        || list_reverse(
             CASE WHEN user_id % 3 = 0 THEN ['10.9.9.9']
                  ELSE ['198.51.' || (user_id % 200)::VARCHAR || '.7',
                        '10.1.2.3',
                        '172.16.0.' || (event_id % 200)::VARCHAR] END)
          AS cand
      FROM e
    ),
    xrf AS (
      SELECT event_id, i.i AS pos, xr.cand[i.i] AS ip,
        coalesce((
          SELECT (p[1]::BIGINT * 16777216 + p[2]::BIGINT * 65536
                  + p[3]::BIGINT * 256 + p[4]::BIGINT)
                   BETWEEN 167772160 AND 184549375
              OR (p[1]::BIGINT * 16777216 + p[2]::BIGINT * 65536
                  + p[3]::BIGINT * 256 + p[4]::BIGINT)
                   BETWEEN 2886729728 AND 2887778303
          FROM (SELECT string_split(xr.cand[i.i], '.') AS p)
        ), FALSE) AS trusted
      FROM xr,
        LATERAL (SELECT unnest(generate_series(1, len(xr.cand))) AS i) i
    ),
    xrp AS (
      SELECT event_id,
        max(CASE WHEN pos = 1 THEN trusted END) AS src_trusted,
        max(CASE WHEN pos = 1 THEN ip END) AS src_ip,
        min_by(ip, pos) FILTER (WHERE pos > 1 AND NOT trusted) AS fu_ip
      FROM xrf GROUP BY event_id
    )
    SELECT 'v4' AS chk, event_id::VARCHAR AS key, ip_str AS v1,
           ip_int::VARCHAR AS v2, TRUE AS ok
    FROM s4
    UNION ALL
    SELECT 'v6', event_id::VARCHAR, {v6["hex"]},
      {v6["hi"]}::VARCHAR || ':' || {v6["mid"]}::VARCHAR || ':'
        || {v6["lo"]}::VARCHAR,
      TRUE
    FROM x6
    UNION ALL
    SELECT 'xff', event_id::VARCHAR,
      CASE WHEN len(cand) > 0 THEN cand[1]
           WHEN len(lst) > 0 THEN lst[1] END, '', TRUE
    FROM c
    UNION ALL
    SELECT 'xff_ranged', event_id::VARCHAR,
      CASE WHEN NOT src_trusted THEN src_ip
           ELSE coalesce(fu_ip, '') END, '', TRUE
    FROM xrp
    """)(_v6_oracle_parts()),
)
def fn_ip_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IP family in one gated entry: v4 string<->uint32 roundtrip with
    validation (F5), the IPv6 canonical-hex + 3-column split (J2, ref
    ioc_database/lambda_function.py:296-346) with an engine-side
    reconstruction check, and XFF rightmost-untrusted client selection
    (F4+J4)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    key = F.col("event_id").cast("string").alias("key")

    ip_int = ((F.col("user_id") * 9973 + F.col("event_id")) % 4294967296)
    ip_str = scalars.long_to_ipv4(ip_int)
    v4 = ev.select(
        F.lit("v4").alias("chk"), key,
        ip_str.alias("v1"),
        scalars.ipv4_to_long(ip_str).cast("string").alias("v2"),
        scalars.is_ipv4(ip_str).alias("ok"),
    )

    ip6 = F.concat(
        F.lit("2001:db8::"), F.lower(F.hex(F.col("user_id") % 65536)),
        F.lit(":"), F.lower(F.hex(F.col("event_id") % 65536)),
    )
    parts = scalars.ipv6_to_3long(ip6)
    rebuilt = scalars.longs_to_ipv6(
        parts["ip6_hi"], parts["ip6_mid"], parts["ip6_lo"]
    )
    v6 = ev.select(
        F.lit("v6").alias("chk"), key,
        scalars.ipv6_to_hex32(ip6).alias("v1"),
        F.concat_ws(
            ":", parts["ip6_hi"].cast("string"),
            parts["ip6_mid"].cast("string"), parts["ip6_lo"].cast("string"),
        ).alias("v2"),
        (scalars.ipv6_to_hex32(rebuilt) == scalars.ipv6_to_hex32(ip6))
        .alias("ok"),
    )

    xffs = F.concat(
        F.lit("10.0.0.1, 198.51."), (F.col("user_id") % 200).cast("string"),
        F.lit(".7, 172.16.0."), (F.col("event_id") % 200).cast("string"),
    )
    xf = ev.select(
        F.lit("xff").alias("chk"), key,
        scalars.xff_client_ip(xffs, ["10.", "172.16."]).alias("v1"),
        F.lit("").alias("v2"), F.lit(True).alias("ok"),
    )

    # range-table trust (the reference's actual sqlite-range check,
    # siem/xff.py:77-91): source-ip gate + rightmost-untrusted walk
    # against broadcast (net_start, net_end) intervals, '' fallthrough.
    src = F.when(
        F.col("event_id") % 2 == 0,
        F.concat(F.lit("203.0.113."),
                 (F.col("event_id") % 250).cast("string")),
    ).otherwise(F.lit("10.0.0.1"))
    xffs_r = F.when(F.col("user_id") % 3 == 0, F.lit("10.9.9.9")).otherwise(
        F.concat(
            F.lit("198.51."), (F.col("user_id") % 200).cast("string"),
            F.lit(".7, 10.1.2.3, 172.16.0."),
            (F.col("event_id") % 200).cast("string"),
        )
    )
    trusted = spark.createDataFrame(
        [(167772160, 184549375), (2886729728, 2887778303)],  # 10/8, 172.16/12
        "net_start long, net_end long",
    )
    ranged = scalars.xff_client_ip_ranged(
        ev.select("event_id", src.alias("_src"), xffs_r.alias("_xff")),
        "event_id", "_src", "_xff", trusted,
    ).select(
        F.lit("xff_ranged").alias("chk"),
        F.col("event_id").cast("string").alias("key"),
        F.col("client_ip").alias("v1"),
        F.lit("").alias("v2"), F.lit(True).alias("ok"),
    )
    return v4.unionByName(v6).unionByName(xf).unionByName(ranged)


# ---------------------------------------------------------------------------
# fn_web_suite: F3 URL split + J6 user-agent + F10/F11 maps -- one
# wide per-event row
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
    "fn_web_suite",
    (lambda u, d: f"""
    WITH w AS (
      SELECT event_id, user_id, {_URL_DUCK} AS url,
        (['{"', '".join(s.replace("'", "''") for s in _UA_SAMPLES)}'])
          [(event_id % {len(_UA_SAMPLES)}) + 1] AS ua_string,
        (event_id % 60) AS proto_num,
        100 + (floor(value)::BIGINT % 500) AS status
      FROM events WHERE event_id < 500
    )
    SELECT event_id, {u['scheme']} AS scheme, {u['domain']} AS domain,
           {u['port']} AS port, {u['path']} AS path, {u['query']} AS query,
           {u['fragment']} AS fragment, {u['extension']} AS extension,
           {d['ua_family']} AS ua_family, {d['ua_version']} AS ua_version,
           {d['ua_os']} AS ua_os,
           {scalars.duckdb_protocol_sql('proto_num')} AS protocol,
           CASE WHEN status < 400 THEN 'success' ELSE 'failure' END
             AS outcome
    FROM w
    """)(scalars.duckdb_url_sql("url"), scalars.duckdb_ua_sql("ua_string")),
)
def fn_web_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-scalar family as ONE wide per-event row: URL request-target
    split with the reference's double-decode order (F3, ref
    siem/utils.py:207-289), user-agent regex-cascade parse (J6), and
    the protocol-number / HTTP-outcome maps (F10/F11)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    samples = F.array(*[F.lit(s) for s in _UA_SAMPLES])
    base = ev.select(
        "event_id",
        _url_spark().alias("url"),
        F.element_at(
            samples, (F.col("event_id") % len(_UA_SAMPLES) + 1).cast("int")
        ).alias("ua_string"),
        (F.col("event_id") % 60).alias("proto_num"),
        (F.floor(F.col("value")).cast("long") % 500 + 100).alias("status"),
    )
    url_fields = scalars.url_fields("url")
    ua_fields = scalars.ua_fields("ua_string")
    return base.select(
        "event_id",
        *[c.alias(n) for n, c in url_fields.items()],
        *[c.alias(n) for n, c in ua_fields.items()],
        scalars.protocol_name("proto_num").alias("protocol"),
        scalars.http_outcome("status").alias("outcome"),
    )
