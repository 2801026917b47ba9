"""Advanced aggregation operators from the OpenSearch dashboard
surface that go beyond the basic terms/date_histogram family:
``significant_terms``, ``rare_terms``, ``composite`` after-key
pagination, ``geotile_grid``, and the pipeline aggregations
(``cumulative_sum`` / ``derivative`` / ``moving_avg``) that run over
a parent histogram's bucket list.

Scale posture: every operator here is a single hash aggregate over
the fact table (one shuffle on the bucket key) followed by work on
the REDUCED bucket list — the same two-tier shape OpenSearch uses
(shard-level aggs, coordinator-level pipeline/significance pass).
Bucket lists are small by construction (bounded key cardinality or a
time-bounded histogram), so the post-aggregation window functions
cost nothing at 100 TB; the fact-table pass stays a map-side partial
+ final hash agg that AQE sizes.

Semantics references (public docs / Lucene source): significant_terms
JLH score = (fg% - bg%) * (fg% / bg%); composite aggs paginate the
bucket lattice in key order with an ``after`` tuple cursor;
geotile_grid keys are Web-Mercator ``z/x/y`` tiles (OSM tiling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# significant_terms
# ---------------------------------------------------------------------------

def significant_terms(df: DataFrame, field: str, foreground: Column,
                      size: int = 10, min_doc_count: int = 1) -> DataFrame:
    """``significant_terms`` agg: keys of ``field`` over-represented in
    the foreground set (rows matching ``foreground``) relative to the
    whole background corpus, ranked by the JLH score
    ``(fg% - bg%) * (fg% / bg%)`` (the OpenSearch default heuristic;
    background includes the foreground, as in OpenSearch).

    ONE pass over the fact table: a conditional count per key gives
    fg/bg doc counts together; totals fold in via a 1x1 crossJoin of
    the same aggregate run at top level (metadata-sized).
    Returns (key, fg_count, bg_count, score) ordered by score desc.
    """
    per_key = df.groupBy(F.col(field).alias("key")).agg(
        F.count(F.when(foreground, 1)).alias("fg_count"),
        F.count("*").alias("bg_count"),
    )
    totals = df.agg(
        F.count(F.when(foreground, 1)).cast("double").alias("_fg_total"),
        F.count("*").cast("double").alias("_bg_total"),
    )
    fg_pct = F.col("fg_count") / F.col("_fg_total")
    bg_pct = F.col("bg_count") / F.col("_bg_total")
    jlh = F.when(
        (F.col("fg_count") >= min_doc_count) & (fg_pct > bg_pct),
        (fg_pct - bg_pct) * (fg_pct / bg_pct),
    ).otherwise(0.0)
    return (
        per_key.crossJoin(F.broadcast(totals))
        .select("key", "fg_count", "bg_count", jlh.alias("score"))
        .filter(F.col("score") > 0.0)
        .orderBy(F.desc("score"), F.asc("key"))
        .limit(size)
    )


# ---------------------------------------------------------------------------
# rare_terms
# ---------------------------------------------------------------------------

def rare_terms(df: DataFrame, key: Column, max_doc_count: int = 1,
               size: int = 10) -> DataFrame:
    """``rare_terms`` agg: long-tail keys with at most ``max_doc_count``
    occurrences, least-frequent first (OpenSearch orders rare_terms by
    ascending count). OpenSearch bounds memory with a CuckooFilter;
    the exact groupBy here IS the scale answer on Spark — the
    aggregate is distributed, and only keys passing the count filter
    survive to the (tiny) ordered tail. Returns (key, n).
    """
    return (
        df.groupBy(key.alias("key"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") <= max_doc_count)
        .orderBy(F.asc("n"), F.asc("key"))
        .limit(size)
    )


# ---------------------------------------------------------------------------
# composite agg pagination
# ---------------------------------------------------------------------------

def composite_page(df: DataFrame, keys: list[str], page_size: int,
                   after: tuple | None = None) -> DataFrame:
    """``composite`` agg: deterministic multi-source bucket pagination.
    Buckets over ``keys`` are emitted in key-tuple order, ``page_size``
    at a time; ``after`` is the last key tuple of the previous page
    (the OpenSearch ``after_key`` cursor).

    The cursor predicate is a native struct comparison — it reaches
    the scan as a filter BEFORE aggregation for the leading key
    (partition/row-group pruning on sorted layouts), so deep pages do
    not recompute or re-shuffle earlier pages' buckets: exactly why
    composite exists vs. terms-agg-with-offset.
    Returns (key columns..., n) ordered by the key tuple.
    """
    key_struct = F.struct(*[F.col(c) for c in keys])
    if after is not None:
        # literal cursor struct must mirror the key struct's field
        # names AND types for the native struct comparison
        df = df.filter(key_struct > F.struct(*[
            F.lit(v).cast(df.schema[c].dataType).alias(c)
            for c, v in zip(keys, after)
        ]))
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .orderBy(*[F.asc(c) for c in keys])
        .limit(page_size)
    )


# ---------------------------------------------------------------------------
# geotile_grid
# ---------------------------------------------------------------------------

def geotile(lat: Column, lon: Column, zoom: int) -> Column:
    """Web-Mercator ``z/x/y`` tile key for a geo_point (OpenSearch
    ``geotile_grid`` agg; OSM slippy-map tiling). Native trig only —
    the ln(tan + sec) form rather than asinh so the oracle SQL can be
    written with the identical expression text (DuckDB has no asinh).
    Latitudes are clamped to the Mercator domain (+/-85.0511) exactly
    as OpenSearch does.
    """
    n = float(2 ** zoom)
    lat_c = F.greatest(F.least(lat, F.lit(85.0511)), F.lit(-85.0511))
    lat_r = F.radians(lat_c)
    x = F.floor((lon + 180.0) / 360.0 * n).cast("long")
    y = F.floor(
        (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / float(__import__("math").pi))
        / 2.0 * n
    ).cast("long")
    # edge clamp: lon=180 / lat at the clamp boundary land on tile n
    x = F.least(x, F.lit(int(n) - 1))
    y = F.greatest(F.least(y, F.lit(int(n) - 1)), F.lit(0))
    return F.concat_ws("/", F.lit(zoom), x, y)


def geotile_duck_sql(lat_sql: str, lon_sql: str, zoom: int) -> str:
    """DuckDB twin of :func:`geotile` — the same clamp + ln(tan+sec)
    expression, for oracle construction."""
    n = float(2 ** zoom)
    nmax = int(n) - 1
    lat_c = f"greatest(least({lat_sql}, 85.0511), -85.0511)"
    lat_r = f"radians({lat_c})"
    x = f"least(floor(({lon_sql} + 180.0) / 360.0 * {n})::BIGINT, {nmax})"
    y = (f"greatest(least(floor((1.0 - ln(tan({lat_r}) + 1.0/cos({lat_r})) / pi())"
         f" / 2.0 * {n})::BIGINT, {nmax}), 0)")
    return f"({zoom} || '/' || {x} || '/' || {y})"


# ---------------------------------------------------------------------------
# pipeline aggregations over a histogram's bucket list
# ---------------------------------------------------------------------------

def with_pipeline_aggs(buckets: DataFrame, order_col: str, value_col: str,
                       window_size: int = 3) -> DataFrame:
    """Attach the OpenSearch pipeline aggs to a parent histogram's
    bucket list: ``cumulative_sum``, ``derivative`` (first difference;
    null on the first bucket, as OpenSearch emits), and ``moving_avg``
    over a trailing ``window_size``-bucket frame.

    Runs AFTER the reduce — the input is the aggregated bucket list
    (one row per histogram bucket), so the unpartitioned window is
    over a time-bounded, metadata-sized set; this mirrors OpenSearch,
    where pipeline aggs execute on the coordinator over the reduced
    buckets, never over raw documents.
    """
    w = Window.orderBy(F.asc(order_col))
    v = F.col(value_col)
    return (
        buckets
        .withColumn("cum_sum", F.sum(v).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("deriv", v - F.lag(v).over(w))
        .withColumn("moving_avg", F.avg(v).over(
            w.rowsBetween(-(window_size - 1), 0)))
    )


# ---------------------------------------------------------------------------
# terms agg "Other" bucket + top_hits sub-aggregation
# ---------------------------------------------------------------------------

def terms_with_other(df: DataFrame, key: str, size: int) -> DataFrame:
    """``terms`` aggregation with the ``sum_other_doc_count`` row the
    reference dashboards render as the "Other" slice (every OpenSearch
    terms response carries it; the Kibana/OpenSearch-Dashboards pie and
    table visualizations show it as an explicit bucket).

    One wide shuffle (the groupBy on ``key``, with map-side partial
    counts) produces a |distinct keys|-sized bucket table; the top-N
    cut, the total, and the Other subtraction all run on that
    metadata-sized table, so no second scan of the raw corpus happens.
    Returns the top ``size`` buckets (count desc, key asc) plus one
    ``__other__`` row whose doc_count is total - sum(top).
    """
    buckets = df.groupBy(key).agg(F.count("*").alias("doc_count"))
    top = buckets.orderBy(F.desc("doc_count"), F.asc(key)).limit(size)
    other = (
        buckets.agg(F.sum("doc_count").alias("total"))
        .crossJoin(top.agg(F.sum("doc_count").alias("in_top")))
        .select(
            F.lit("__other__").alias(key),
            (F.col("total") - F.col("in_top")).alias("doc_count"),
        )
    )
    return top.unionByName(other)


def top_hits(df: DataFrame, key: str, sort_cols: list[Column],
             size: int = 1) -> DataFrame:
    """``top_hits`` sub-aggregation: the best ``size`` documents per
    bucket under an explicit sort (the reference dashboards use it for
    "latest event per host" style tables).

    Implemented as a rank-limited window — the shape Spark's
    WindowGroupLimit rule rewrites into a per-partition partial limit
    BEFORE the shuffle (spark.sql.optimizer.windowGroupLimitThreshold,
    default 1000), so each map task forwards at most ``size`` rows per
    key instead of its whole partition; the post-shuffle work is
    bucket-count-sized. Returns the input columns plus ``_rn`` (1-based
    rank within the bucket).
    """
    w = Window.partitionBy(key).orderBy(*sort_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= size)
    )
