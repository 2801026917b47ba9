"""Registry entries for the remaining ETL operator families of
SURVEY.md section 2: projection/filter P-series, the IP-interval
range join (J1/J2), and the envelope sources (S10/S11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import _t, register
from .functions.scalars import long_to_ipv4

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
    "proj_prune_truncate",
    """
    SELECT doc_id,
      CASE WHEN text IS NULL OR text IN ('', '-', 'null') THEN NULL
           ELSE text END IS NOT NULL AS kept,
      CASE WHEN length(text) > 200
           THEN substr(text, 1, 200) || '<<TRUNCATED>>'
           ELSE text END AS body,
      length(text) > 200 AS truncated
    FROM documents
    """,
)
def proj_prune_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value hygiene (P10 + P11, ref siem/__init__.py:1105-1147):
    empty/'-'/'null' values pruned to NULL; oversize strings truncated
    with the reference's '<<TRUNCATED>>' marker."""
    d = _t(spark, sf_dir, "documents")
    pruned = F.when(
        F.col("text").isNull() | F.col("text").isin("", "-", "null"), None
    ).otherwise(F.col("text"))
    body = F.when(
        F.length("text") > 200,
        F.concat(F.substring("text", 1, 200), F.lit("<<TRUNCATED>>")),
    ).otherwise(F.col("text"))
    return d.select(
        "doc_id",
        pruned.isNotNull().alias("kept"),
        body.alias("body"),
        (F.length("text") > 200).alias("truncated"),
    )


# ---------------------------------------------------------------------------
# P12: field prefixing (namespace struct)
# ---------------------------------------------------------------------------


@register(
    "proj_field_prefix",
    """
    SELECT event_id, event_type AS aws_event_type, user_id AS aws_user_id
    FROM events WHERE event_id < 300
    """,
)
def proj_field_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field prefixing (P12, ref siem/__init__.py:981-995): original
    fields moved under a namespace struct; projected flat here so the
    oracle can hash it (struct == prefixed columns)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    ns = F.struct(F.col("event_type"), F.col("user_id"))
    return ev.select(
        "event_id",
        ns.getField("event_type").alias("aws_event_type"),
        ns.getField("user_id").alias("aws_user_id"),
    )


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


@register(
    "join_ip_range_lookup",
    f"""
    WITH dim(net_start, net_end, label) AS (
      VALUES {", ".join(f"({a}, {b}, '{c}')" for a, b, c in _IP_DIM)}
    ), fact AS (
      SELECT event_id, (user_id * 2654435761 + event_id) % 4294967296 AS ip
      FROM events
    )
    SELECT d.label AS label, count(*) AS n
    FROM fact f JOIN dim d ON f.ip >= d.net_start AND f.ip < d.net_end
    GROUP BY d.label
    """,
)
def join_ip_range_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoIP/IOC IP-interval lookup (J1/J2, ref siem/ioc.py:167-230,
    siem/geodb.py:110-137): fact ip BETWEEN dim interval, dim
    broadcast -- plans as BroadcastNestedLoopJoin over the tiny
    interval table, never a shuffle of the fact side."""
    ev = _t(spark, sf_dir, "events")
    fact = ev.select(
        "event_id",
        ((F.col("user_id") * 2654435761 + F.col("event_id")) % 4294967296)
        .alias("ip"),
    )
    dim = spark.createDataFrame(_IP_DIM, "net_start long, net_end long, label string")
    return (
        fact.join(
            F.broadcast(dim),
            (fact.ip >= dim.net_start) & (fact.ip < dim.net_end),
        )
        .groupBy("label")
        .agg(F.count("*").alias("n"))
    )


@register(
    "join_ip_range_enrich",
    f"""
    WITH dim(net_start, net_end, label) AS (
      VALUES {", ".join(f"({a}, {b}, '{c}')" for a, b, c in _IP_DIM)}
    ), fact AS (
      SELECT event_id, (user_id * 2654435761 + event_id) % 4294967296 AS ip
      FROM events WHERE event_id < 300
    )
    SELECT f.event_id,
      ((f.ip // 16777216) % 256)::VARCHAR || '.' ||
      ((f.ip // 65536) % 256)::VARCHAR || '.' ||
      ((f.ip // 256) % 256)::VARCHAR || '.' || (f.ip % 256)::VARCHAR AS ip_str,
      d.label AS geo_label
    FROM fact f JOIN dim d ON f.ip >= d.net_start AND f.ip < d.net_end
    """,
)
def join_ip_range_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level enrichment variant of the range join (the GeoIP
    city-per-event shape) with the ip rendered dotted-quad."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    fact = ev.select(
        "event_id",
        ((F.col("user_id") * 2654435761 + F.col("event_id")) % 4294967296)
        .alias("ip"),
    )
    dim = spark.createDataFrame(_IP_DIM, "net_start long, net_end long, label string")
    return (
        fact.join(
            F.broadcast(dim),
            (fact.ip >= dim.net_start) & (fact.ip < dim.net_end),
        )
        .select(
            "event_id",
            long_to_ipv4("ip").alias("ip_str"),
            F.col("label").alias("geo_label"),
        )
    )


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


@register(
    "geo_distance_rollup",
    f"""
    SELECT floor({_HAV_DUCK} / 2500)::BIGINT AS ring_2500km,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def geo_distance_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_point semantics: haversine distance from synthesized
    lat/lon to a center, rolled up into 2500 km rings (the region_map
    aggregation shape) -- native trig expressions, map-side only."""
    ev = _t(spark, sf_dir, "events")
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
    return (
        ev.select(F.floor(dist / 2500).cast("long").alias("ring_2500km"))
        .groupBy("ring_2500km")
        .agg(F.count("*").alias("n"))
    )


@register(
    "agg_percentiles",
    """
    SELECT event_type,
      round(quantile_cont(value, 0.5), 4) AS p50,
      round(quantile_cont(value, 0.9), 4) AS p90,
      round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles aggregation (the OpenSearch `percentiles` metric):
    exact interpolated percentiles per bucket."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


# ---------------------------------------------------------------------------
# S10: CloudWatch-Logs-style envelope source
# ---------------------------------------------------------------------------


@register(
    "src_envelope_explode",
    """
    WITH env AS (
      SELECT user_id,
        '{"messageType":"' ||
        (CASE WHEN user_id % 7 = 0 THEN 'CONTROL_MESSAGE' ELSE 'DATA_MESSAGE' END)
        || '","owner":"acct' || (user_id % 5)::VARCHAR
        || '","logEvents":[{"id":1,"message":"m' || user_id::VARCHAR
        || 'a"},{"id":2,"message":"m' || user_id::VARCHAR || 'b"}]}' AS payload
      FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 200)
    )
    SELECT json_extract_string(payload, '$.owner') AS owner,
           json_array_length(payload, '$.logEvents')::BIGINT AS inner_id_count
    FROM env
    WHERE json_extract_string(payload, '$.messageType') = 'DATA_MESSAGE'
    """,
)
def src_envelope_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CloudWatch-Logs envelope source (S10, ref
    siem/__init__.py:290-338): DATA_MESSAGE filter, meta fan-out, and
    the nested logEvents array surfaced (count projected here so the
    oracle hashes scalars)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    users = ev.select("user_id").distinct()
    payload = F.concat(
        F.lit('{"messageType":"'),
        F.when(F.col("user_id") % 7 == 0, F.lit("CONTROL_MESSAGE"))
        .otherwise(F.lit("DATA_MESSAGE")),
        F.lit('","owner":"acct'), (F.col("user_id") % 5).cast("string"),
        F.lit('","logEvents":[{"id":1,"message":"m'),
        F.col("user_id").cast("string"),
        F.lit('a"},{"id":2,"message":"m'), F.col("user_id").cast("string"),
        F.lit('b"}]}'),
    )
    env = users.select("user_id", payload.alias("payload"))
    parsed = env.withColumn(
        "rec",
        F.from_json(
            "payload",
            "messageType string, owner string, "
            "logEvents array<struct<id:int,message:string>>",
        ),
    )
    return (
        parsed.filter(F.col("rec.messageType") == "DATA_MESSAGE")
        .select(
            F.col("rec.owner").alias("owner"),
            F.size("rec.logEvents").cast("long").alias("inner_id_count"),
        )
    )
