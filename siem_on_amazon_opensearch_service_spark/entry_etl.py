"""Registry entries for the remaining ETL operator families of
SURVEY.md section 2: projection/filter P-series, the IP-interval
range join (J1/J2), and the envelope sources (S10/S11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .detfloat import (DEC, round_det, round_det_sql, sum_round,
                       sum_round_sql)
from .entry_queries import _t, _utc, register
from .functions.scalars import long_to_ipv4
from .operators.aggs import geotile_duck_sql as _geotile_duck

# ---------------------------------------------------------------------------
# P3/P4: row exclusion by pattern conditions
# ---------------------------------------------------------------------------


@register(
    "filter_exclusion_patterns",
    """
    SELECT event_type, count(*) AS n FROM events
    WHERE NOT (regexp_matches(props, '"k": 9[0-9]}')
               OR (event_type = 'error' AND value < 10))
    GROUP BY event_type
    """,
)
def filter_exclusion_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-driven row exclusion (P3/P4, ref siem/utils.py:1041-1099
    + JMESPath exclusions siem/__init__.py:997-1033): a disjunction of
    per-field regex / comparison conditions, rows matching any are
    dropped before load."""
    ev = _t(spark, sf_dir, "events")
    excl = F.col("props").rlike('"k": 9[0-9]}') | (
        (F.col("event_type") == "error") & (F.col("value") < 10)
    )
    return ev.filter(~excl).groupBy("event_type").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# P5: ECS projection -- multi-source coalesce + list union
# ---------------------------------------------------------------------------


@register(
    "proj_ecs_coalesce",
    """
    SELECT event_id,
      coalesce(nullif(json_extract_string(props, '$.missing'), ''),
               nullif(event_type, ''), 'unknown') AS ecs_action,
      array_to_string(
        list_sort(list_distinct([event_type, 'evt' || (event_id % 3)::VARCHAR])),
        '|') AS ecs_category
    FROM events WHERE event_id < 500
    """,
)
def proj_ecs_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECS field projection (P5, ref siem/__init__.py:745-776): for
    each target field try source keys in order taking the first
    non-empty; list targets are the sorted distinct union."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    first_nonempty = F.coalesce(
        F.nullif(F.get_json_object("props", "$.missing"), F.lit("")),
        F.nullif(F.col("event_type"), F.lit("")),
        F.lit("unknown"),
    )
    union_list = F.array_sort(
        F.array_distinct(
            F.array(
                F.col("event_type"),
                F.concat(F.lit("evt"), (F.col("event_id") % 3).cast("string")),
            )
        )
    )
    return ev.select(
        "event_id",
        first_nonempty.alias("ecs_action"),
        # array_join: the driver's canonicalizer sorts pandas columns,
        # which crashes on list cells -- project list targets as a
        # joined scalar so the gate hashes them (values unchanged).
        F.array_join(union_list, "|").alias("ecs_category"),
    )


# ---------------------------------------------------------------------------
# P10/P11: empty-value pruning + oversize truncation
# ---------------------------------------------------------------------------


@register(
    "proj_shape",
    """
    SELECT 'prune_truncate' AS chk, doc_id::VARCHAR AS key,
      (CASE WHEN text IS NULL OR text IN ('', '-', 'null') THEN NULL
            ELSE text END IS NOT NULL)::VARCHAR AS v1,
      CASE WHEN length(text) > 200
           THEN substr(text, 1, 200) || '<<TRUNCATED>>'
           ELSE text END AS v2,
      (length(text) > 200)::VARCHAR AS v3
    FROM documents
    UNION ALL
    SELECT 'field_prefix', event_id::VARCHAR, event_type,
           user_id::VARCHAR, ''
    FROM events WHERE event_id < 300
    """,
)
def proj_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-shape family in one gated entry: value hygiene
    (P10/P11, ref siem/__init__.py:1105-1147 -- empty/'-'/'null' ->
    NULL, oversize strings truncated with '<<TRUNCATED>>') UNION field
    prefixing (P12, ref siem/__init__.py:981-995 -- originals moved
    under a namespace struct, projected flat for hashing)."""
    d = _t(spark, sf_dir, "documents")
    pruned = F.when(
        F.col("text").isNull() | F.col("text").isin("", "-", "null"), None
    ).otherwise(F.col("text"))
    body = F.when(
        F.length("text") > 200,
        F.concat(F.substring("text", 1, 200), F.lit("<<TRUNCATED>>")),
    ).otherwise(F.col("text"))
    prune_part = d.select(
        F.lit("prune_truncate").alias("chk"),
        F.col("doc_id").cast("string").alias("key"),
        pruned.isNotNull().cast("string").alias("v1"),
        body.alias("v2"),
        (F.length("text") > 200).cast("string").alias("v3"),
    )
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    ns = F.struct(F.col("event_type"), F.col("user_id"))
    prefix_part = ev.select(
        F.lit("field_prefix").alias("chk"),
        F.col("event_id").cast("string").alias("key"),
        ns.getField("event_type").alias("v1"),
        ns.getField("user_id").cast("string").alias("v2"),
        F.lit("").alias("v3"),
    )
    return prune_part.unionByName(prefix_part)


# ---------------------------------------------------------------------------
# J1/J2: IP-interval broadcast range join (GeoIP / IOC shape)
# ---------------------------------------------------------------------------

_IP_DIM = [
    # (net_start, net_end, label) -- contiguous /8-ish ranges
    (0, 1 << 28, "block-a"),
    (1 << 28, 1 << 30, "block-b"),
    (1 << 30, 1 << 31, "block-c"),
    ((1 << 31), (1 << 32) - 1, "block-d"),
]


# Mixed v4/v6 interval dimension in the reference's 3-column integer
# space (hi = bits 127..80, mid = 79..32, lo = 31..0; IPv4 embedded
# IPv4-mapped at (0, 0xffff, uint32)). Ref
# ioc_database/lambda_function.py:296-346.
_V6_HI = 0x20010DB80000  # 2001:db8::/48 of the synthesized v6 facts
_IP6_DIM = [
    (0, 0xFFFF, 0, 0, 0xFFFF, (1 << 31) - 1, "v4-low"),
    (0, 0xFFFF, 1 << 31, 0, 0xFFFF, (1 << 32) - 1, "v4-high"),
    (_V6_HI, 0, 0, _V6_HI, 0, (1 << 31) - 1, "v6-low"),
    (_V6_HI, 0, 1 << 31, _V6_HI, 0, (1 << 32) - 1, "v6-high"),
]

#: half v4 dotted-quad, half compressed v6 under 2001:db8::/48 --
#: exercises '::' expansion + the v4-mapped embedding on BOTH engines.
_MIXED_IP_DUCK = """
  CASE WHEN event_id % 2 = 0 THEN
    ((user_id * 2654435761 + event_id) % 4294967296 // 16777216 % 256)::VARCHAR
    || '.' || ((user_id * 2654435761 + event_id) % 4294967296 // 65536 % 256)::VARCHAR
    || '.' || ((user_id * 2654435761 + event_id) % 4294967296 // 256 % 256)::VARCHAR
    || '.' || ((user_id * 2654435761 + event_id) % 4294967296 % 256)::VARCHAR
  ELSE '2001:db8::' || lower(to_hex(user_id % 65536))
    || ':' || lower(to_hex(event_id % 65536)) END
"""


def _mixed_ip_spark() -> F.Column:
    from .functions.scalars import long_to_ipv4 as _l2v4

    v4int = (F.col("user_id") * 2654435761 + F.col("event_id")) % 4294967296
    v6 = F.concat(
        F.lit("2001:db8::"), F.lower(F.hex(F.col("user_id") % 65536)),
        F.lit(":"), F.lower(F.hex(F.col("event_id") % 65536)),
    )
    return F.when(F.col("event_id") % 2 == 0, _l2v4(v4int)).otherwise(v6)


def _ip6_lookup_oracle() -> str:
    from .functions.scalars import duckdb_ip_any_3long_sql

    parts = duckdb_ip_any_3long_sql("ip")
    dim_rows = ", ".join(
        f"({a}, {b}, {c}, {d}, {e}, {f}, '{g}')" for a, b, c, d, e, f, g in _IP6_DIM
    )
    return f"""
    WITH dim(s_hi, s_mid, s_lo, e_hi, e_mid, e_lo, label) AS (
      VALUES {dim_rows}
    ), fact AS (
      SELECT event_id, {_MIXED_IP_DUCK} AS ip FROM events
    ), keyed AS (
      SELECT event_id, {parts["ip6_hi"]} AS hi, {parts["ip6_mid"]} AS mid,
             {parts["ip6_lo"]} AS lo
      FROM fact
    )
    SELECT 'lookup' AS chk, d.label AS key, count(*)::VARCHAR AS v1,
           '' AS v2
    FROM keyed f JOIN dim d
      ON (f.hi, f.mid, f.lo) >= (d.s_hi, d.s_mid, d.s_lo)
     AND (f.hi, f.mid, f.lo) <= (d.e_hi, d.e_mid, d.e_lo)
    GROUP BY d.label
    UNION ALL
    SELECT 'enrich', f.event_id::VARCHAR,
      ((f.ip // 16777216) % 256)::VARCHAR || '.' ||
      ((f.ip // 65536) % 256)::VARCHAR || '.' ||
      ((f.ip // 256) % 256)::VARCHAR || '.' || (f.ip % 256)::VARCHAR,
      d.label
    FROM (
      SELECT event_id, (user_id * 2654435761 + event_id) % 4294967296 AS ip
      FROM events WHERE event_id < 300
    ) f JOIN (VALUES {", ".join(f"({a}, {b}, '{c}')" for a, b, c in _IP_DIM)})
        d(net_start, net_end, label)
      ON f.ip >= d.net_start AND f.ip < d.net_end
    """


@register("join_ip_range", _ip6_lookup_oracle())
def join_ip_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoIP/IOC IP-interval lookup over MIXED v4/v6 facts (J1/J2, ref
    siem/ioc.py:167-230 + the IPv6 3-column split of
    ioc_database/lambda_function.py:296-346): every address maps into
    one (hi, mid, lo) integer space -- IPv6 split 48/48/32, IPv4
    embedded IPv4-mapped -- and the interval test is a lexicographic
    struct comparison against the broadcast dimension (the 128-bit
    compare sqlite does with its 3-column index). Plans as
    BroadcastNestedLoopJoin; the fact side never shuffles."""
    from .functions.scalars import ip_any_to_3long

    ev = _t(spark, sf_dir, "events")
    fact = ev.select("event_id", _mixed_ip_spark().alias("ip"))
    parts = ip_any_to_3long("ip")
    keyed = fact.select(
        "event_id",
        parts["ip6_hi"].alias("hi"), parts["ip6_mid"].alias("mid"),
        parts["ip6_lo"].alias("lo"),
    )
    dim = spark.createDataFrame(
        _IP6_DIM,
        "s_hi long, s_mid long, s_lo long, e_hi long, e_mid long, "
        "e_lo long, label string",
    )
    key = F.struct(F.col("hi"), F.col("mid"), F.col("lo"))
    lo_b = F.struct(dim.s_hi, dim.s_mid, dim.s_lo)
    hi_b = F.struct(dim.e_hi, dim.e_mid, dim.e_lo)
    lookup_part = (
        keyed.join(F.broadcast(dim), (key >= lo_b) & (key <= hi_b))
        .groupBy("label")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("lookup").alias("chk"), F.col("label").alias("key"),
            F.col("n").cast("string").alias("v1"), F.lit("").alias("v2"),
        )
    )

    # row-level enrichment variant (the GeoIP city-per-event shape,
    # v4 dim) -- same broadcast range-join machinery, row output.
    fact4 = (
        ev.filter(F.col("event_id") < 300)
        .select(
            "event_id",
            ((F.col("user_id") * 2654435761 + F.col("event_id")) % 4294967296)
            .alias("ip4"),
        )
    )
    dim4 = spark.createDataFrame(
        _IP_DIM, "net_start long, net_end long, label string"
    )
    enrich_part = (
        fact4.join(
            F.broadcast(dim4),
            (fact4.ip4 >= dim4.net_start) & (fact4.ip4 < dim4.net_end),
        )
        .select(
            F.lit("enrich").alias("chk"),
            F.col("event_id").cast("string").alias("key"),
            long_to_ipv4("ip4").alias("v1"),
            F.col("label").alias("v2"),
        )
    )
    return lookup_part.unionByName(enrich_part)


# ---------------------------------------------------------------------------
# P1/P6/P8 + F2: declarative source-config compiler (the aws.ini
# analog, ref siem/utils.py:618-636) driving an end-to-end pipeline
# ---------------------------------------------------------------------------

_CFG_TS_FMT = [("dd/MMM/yyyy:HH:mm:ss", "%d/%b/%Y:%H:%M:%S")]

#: one declarative section == one aws.ini logtype: regex source,
#: exclusion, rename, static field, ECS coalesce, strptime-list
#: timestamp with a per-source TZ offset.
APACHE_CONFIG = {
    "format": "regex",
    "pattern": (
        r"^(\S+) \S+ (\S+) \[([^\]]+)\] \"(\S+) (\S+) ([^\"]+)\" "
        r"(\d{3}) (\d+|-)"
    ),
    "groups": [
        "client_ip", "user", "ts_raw", "method", "request",
        "http_version", "status", "bytes",
    ],
    "exclusions": [{"field": "status", "pattern": "^[45]"}],
    "renames": {"request": "url_path"},
    "static_fields": {"log_type": "apache_access"},
    "ecs": {"source_ip": ["client_ip"]},
    "timestamp": {
        "field": "ts_raw", "formats": _CFG_TS_FMT,
        "tz_offset_hours": 2.0, "out": "ts_utc",
    },
    "select": [
        "event_id", "source_ip", "url_path", "status", "log_type", "ts_utc",
    ],
}

_CFG_LINE_DUCK = (
    "'192.0.2.' || (user_id % 256)::VARCHAR || ' - u' || user_id::VARCHAR"
    " || ' [' || strftime(ts, '%d/%b/%Y:%H:%M:%S') || '] \"GET /p/'"
    " || event_id::VARCHAR || ' HTTP/1.1\" '"
    " || (100 + (floor(value)::BIGINT % 500))::VARCHAR"
    " || ' ' || (event_id % 10000)::VARCHAR"
)


def _cfg_line_spark() -> F.Column:
    return F.concat(
        F.lit("192.0.2."), (F.col("user_id") % 256).cast("string"),
        F.lit(" - u"), F.col("user_id").cast("string"),
        F.lit(" ["), F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"),
        F.lit('] "GET /p/'), F.col("event_id").cast("string"),
        F.lit(' HTTP/1.1" '),
        (F.floor(F.col("value")).cast("long") % 500 + 100).cast("string"),
        F.lit(" "), (F.col("event_id") % 10000).cast("string"),
    )


@register(
    "etl_config_pipeline",
    """
    WITH lines AS (
      SELECT event_id, """ + _CFG_LINE_DUCK + """ AS line
      FROM events WHERE event_id < 400
    ), parsed AS (
      SELECT event_id,
        regexp_extract(line, '^(\\S+) \\S+ (\\S+) \\[([^\\]]+)\\] "(\\S+) (\\S+) ([^"]+)" (\\d{3}) (\\d+|-)', 1) AS client_ip,
        regexp_extract(line, '^(\\S+) \\S+ (\\S+) \\[([^\\]]+)\\] "(\\S+) (\\S+) ([^"]+)" (\\d{3}) (\\d+|-)', 3) AS ts_raw,
        regexp_extract(line, '^(\\S+) \\S+ (\\S+) \\[([^\\]]+)\\] "(\\S+) (\\S+) ([^"]+)" (\\d{3}) (\\d+|-)', 5) AS request,
        regexp_extract(line, '^(\\S+) \\S+ (\\S+) \\[([^\\]]+)\\] "(\\S+) (\\S+) ([^"]+)" (\\d{3}) (\\d+|-)', 7) AS status
      FROM lines
    )
    SELECT event_id, client_ip AS source_ip, request AS url_path, status,
      'apache_access' AS log_type,
      strftime(to_timestamp(floor(epoch(try_strptime(ts_raw, '%d/%b/%Y:%H:%M:%S')))::BIGINT
               - (2.0 * 3600)::BIGINT), '%Y-%m-%d %H:%M:%S') AS ts_utc
    FROM parsed WHERE NOT regexp_matches(status, '^[45]')
    UNION ALL
    SELECT event_id, client_ip AS source_ip,
      regexp_replace(request, '^/p/', '/page/') AS url_path, status,
      'ingest_access' AS log_type,
      strftime(to_timestamp(floor(epoch(try_strptime(ts_raw, '%d/%b/%Y:%H:%M:%S')))::BIGINT
               - (2.0 * 3600)::BIGINT), '%Y-%m-%d %H:%M:%S') AS ts_utc
    FROM parsed WHERE NOT regexp_matches(status, '^[45]')
    """,
)
def etl_config_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END config-defined source, BOTH declarative dialects in
    one gated entry: APACHE_CONFIG (one aws.ini section analog,
    config.py: parse -> exclude -> rename -> static -> ECS ->
    timestamp(+TZ shift) -> select) produces log_type=apache_access;
    the SAME source run through an OpenSearch ``_ingest/pipeline``
    processor chain (ingest.py: grok -> drop-if -> gsub -> rename ->
    set -> date(timezone)) produces log_type=ingest_access. Every
    transform on both paths is a native expression; the oracle is the
    two pipelines hand-written in SQL."""
    from .config import compile_pipeline
    from .ingest import compile_ingest_pipeline

    _utc(spark)
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 400)
    lines = ev.select("event_id", _cfg_line_spark().alias("line"))
    out = compile_pipeline(APACHE_CONFIG)(lines)
    cfg = out.withColumn(
        "ts_utc", F.date_format("ts_utc", "yyyy-MM-dd HH:mm:ss")
    )

    pipe = {"processors": [
        {"grok": {"field": "line", "patterns": [
            "%{NOTSPACE:client_ip} %{NOTSPACE} %{NOTSPACE:user} "
            "\\[%{DATA:ts_raw}\\] "
            "\"%{WORD:method} %{NOTSPACE:request} %{DATA:http_version}\" "
            "%{INT:status} %{NOTSPACE:bytes}"]}},
        {"drop": {"if": "status rlike '^[45]'"}},
        {"gsub": {"field": "request", "pattern": "^/p/",
                  "replacement": "/page/", "target_field": "url_path"}},
        {"rename": {"field": "client_ip", "target_field": "source_ip"}},
        {"set": {"field": "log_type", "value": "ingest_access"}},
        {"date": {"field": "ts_raw", "formats": ["dd/MMM/yyyy:HH:mm:ss"],
                  "target_field": "ts_utc", "timezone": "+02:00"}},
    ]}
    ing = compile_ingest_pipeline(pipe)(lines).select(
        "event_id", "source_ip", "url_path", "status", "log_type",
        F.date_format("ts_utc", "yyyy-MM-dd HH:mm:ss").alias("ts_utc"),
    )
    return cfg.unionByName(ing)


# ---------------------------------------------------------------------------
# geo_point (reference: 10 geo_point fields, data.ini:127; region_map
# rollups in waf.ndjson) -- haversine distance filter + bucket rollup
# ---------------------------------------------------------------------------

_GEO_LAT = "((user_id * 7 % 180) - 90 + 0.5)"
_GEO_LON = "((event_id * 13 % 360) - 180 + 0.5)"
_CENTER_LAT, _CENTER_LON = 40.0, -74.0
_HAV_DUCK = f"""
  2 * 6371.0 * asin(sqrt(
    pow(sin(radians(({_GEO_LAT}) - {_CENTER_LAT}) / 2), 2)
    + cos(radians({_CENTER_LAT})) * cos(radians({_GEO_LAT}))
      * pow(sin(radians(({_GEO_LON}) - ({_CENTER_LON})) / 2), 2)))
"""


def _geohash_duck() -> str:
    """The geohash_grid bucket key — literally the same SQL text the
    Spark side evaluates (operators/geo.geohash_sql is dual-dialect)."""
    from .operators.geo import geohash_sql

    return geohash_sql(_GEO_LAT, _GEO_LON, 3)


def _geohex_duck() -> str:
    """geohex_grid bucket key (axial hex lattice, operators/
    geo.geohex_sql) — same dual-dialect trick as the geohash."""
    from .operators.geo import geohex_sql

    return geohex_sql(_GEO_LAT, _GEO_LON, 4)


#: non-convex pentagon over the derived scatter — the geo_polygon /
#: polygon-geo_shape QUERY predicate (ray-casting parity, one
#: shared-dialect boolean; index/searchbody.py compiles the DSL nodes
#: to exactly these texts)
_PENTA = [(-40.0, -120.0), (50.0, -100.0), (10.0, 0.0),
          (55.0, 100.0), (-35.0, 60.0)]


def _geoq_sqls() -> dict[str, str]:
    from .operators.geo import (bbox_sql, haversine_sql,
                                point_in_polygon_sql)

    return {
        "poly": point_in_polygon_sql(_GEO_LAT, _GEO_LON, _PENTA),
        "dist": (f"({haversine_sql(_GEO_LAT, _GEO_LON, 40.0, -74.0)}"
                 " <= 3000.0)"),
        "bbox": bbox_sql(_GEO_LAT, _GEO_LON, 60.0, -120.0,
                         20.0, -60.0),
    }


@register(
    "join_range_geo_bands",
    f"""
    WITH bands(lo, hi, band) AS (
      VALUES (0.0, 50.0, 'low'), (50.0, 200.0, 'mid'),
             (200.0, 1e9, 'high')
    )
    SELECT 'value_band:' || b.band AS bucket, count(*) AS n,
           {sum_round_sql('e.value')} AS sum_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    UNION ALL
    SELECT 'geo_ring:' || (floor({_HAV_DUCK} / 2500)::BIGINT)::VARCHAR,
           count(*), 0.0
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'geotile:' || {_geotile_duck(_GEO_LAT, _GEO_LON, 3)}, count(*), 0.0
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'geohash:' || {_geohash_duck()}, count(*), 0.0
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'geohex:' || {_geohex_duck()}, count(*), 0.0
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'geo_bounds:' || (count(*))::VARCHAR,
           count(*),
           {round_det_sql(f'''max({_GEO_LAT}) + min({_GEO_LAT})
                 + avg({_GEO_LAT}) + avg({_GEO_LON})''', 4)}
    FROM events
    WHERE ({_GEO_LAT}) BETWEEN 20.0 AND 60.0
      AND ({_GEO_LON}) BETWEEN -120.0 AND -60.0
    UNION ALL
    SELECT 'geoq_poly', count(*),
           round(coalesce(sum(CAST(value AS {DEC})), 0), 4)::DOUBLE
    FROM events WHERE {_geoq_sqls()["poly"]}
    UNION ALL
    SELECT 'geoq_dist', count(*),
           round(coalesce(sum(CAST(value AS {DEC})), 0), 4)::DOUBLE
    FROM events WHERE {_geoq_sqls()["dist"]}
    UNION ALL
    SELECT 'geoq_bbox', count(*),
           round(coalesce(sum(CAST(value AS {DEC})), 0), 4)::DOUBLE
    FROM events WHERE {_geoq_sqls()["bbox"]}
    """,
)
def join_range_geo_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three geo/band rollups in one gated entry: the numeric interval
    lookup join (J1/J2 shape: fact value BETWEEN broadcast dim bounds,
    plans as BroadcastNestedLoopJoin over 3 rows -- the fact side
    never shuffles), the geo_point haversine ring rollup (the
    region_map aggregation, ref data.ini:127 / waf.ndjson) -- native
    trig, map-side only -- the `geotile_grid` agg (Web-Mercator
    z/x/y tile buckets at zoom 3, the OpenSearch coordinate-map
    aggregation; same native-trig map-side shape), the `geohash_grid`
    agg (operators/geo.geohash_sql: one dual-dialect closed form
    evaluated by BOTH engines), and a `geo_bounding_box` filter
    feeding `geo_bounds`+`geo_centroid` metrics folded into one chk
    row. Everything map-side arithmetic + one hash agg."""
    ev = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 200.0, "mid"), (200.0, 1e9, "high")],
        "lo double, hi double, band string",
    )
    band_part = (
        ev.join(
            F.broadcast(bands),
            (ev.value >= bands.lo) & (ev.value < bands.hi),
        )
        .groupBy(F.concat(F.lit("value_band:"), F.col("band")).alias("bucket"))
        .agg(F.count("*").alias("n"), sum_round("value").alias("sum_value"))
    )
    lat = (F.col("user_id") * 7 % 180) - 90 + 0.5
    lon = (F.col("event_id") * 13 % 360) - 180 + 0.5
    clat = F.lit(float(_CENTER_LAT))
    dist = (
        2 * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(lat - clat) / 2), 2)
                + F.cos(F.radians(clat)) * F.cos(F.radians(lat))
                * F.pow(F.sin(F.radians(lon - F.lit(float(_CENTER_LON))) / 2), 2)
            )
        )
    )
    geo_part = (
        ev.select(
            F.concat(
                F.lit("geo_ring:"),
                F.floor(dist / 2500).cast("long").cast("string"),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .withColumn("sum_value", F.lit(0.0))
    )
    from .operators.aggs import geotile

    tile_part = (
        ev.select(
            F.concat(F.lit("geotile:"), geotile(lat, lon, 3)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .withColumn("sum_value", F.lit(0.0))
    )
    from .operators.geo import (geo_bounds_centroid, geohash,
                                in_bounding_box)

    hash_part = (
        ev.select(
            F.concat(F.lit("geohash:"),
                     geohash(_GEO_LAT, _GEO_LON, 3)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .withColumn("sum_value", F.lit(0.0))
    )
    from .operators.geo import geohex

    hex_part = (
        ev.select(
            F.concat(F.lit("geohex:"),
                     geohex(_GEO_LAT, _GEO_LON, 4)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .withColumn("sum_value", F.lit(0.0))
    )
    boxed = ev.filter(in_bounding_box(lat, lon, top=60.0, left=-120.0,
                                      bottom=20.0, right=-60.0))
    bounds_part = geo_bounds_centroid(boxed, lat, lon).select(
        F.concat(F.lit("geo_bounds:"), F.col("n").cast("string"))
        .alias("bucket"),
        F.col("n"),
        round_det(
            F.col("top") + F.col("bottom")
            + F.col("centroid_lat") + F.col("centroid_lon"), 4
        ).alias("sum_value"),
    )
    # geo QUERY predicates (geo_polygon / geo_distance /
    # geo_bounding_box filter context): each is the ONE shared-dialect
    # boolean the _search compiler emits — whole-stage codegen, pushes
    # to the scan; the oracle evaluates the identical text.
    geoq_parts = [
        ev.filter(F.expr(sql)).agg(
            F.count("*").alias("n"),
            F.round(F.coalesce(F.sum(F.col("value").cast(DEC)), F.lit(0)), 4)
            .cast("double").alias("sum_value"),
        ).select(F.lit(f"geoq_{tag}").alias("bucket"), "n",
                 "sum_value")
        for tag, sql in _geoq_sqls().items()
    ]
    out = (band_part.unionByName(geo_part).unionByName(tile_part)
           .unionByName(hash_part).unionByName(hex_part)
           .unionByName(bounds_part))
    for p in geoq_parts:
        out = out.unionByName(p)
    return out
