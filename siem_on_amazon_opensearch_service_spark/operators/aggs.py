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
                      size: int = 10, min_doc_count: int = 1,
                      heuristic: str = "jlh") -> DataFrame:
    """``significant_terms`` agg: keys of ``field`` over-represented in
    the foreground set (rows matching ``foreground``) relative to the
    whole background corpus (background includes the foreground, as in
    OpenSearch: ``background_is_superset``).

    ``heuristic`` selects the OpenSearch significance scorer (public
    formulas; ES/OpenSearch heuristics package):

    * ``jlh`` (default): ``(fg% - bg%) * (fg% / bg%)``
    * ``percentage``: ``fg_count / bg_count``
    * ``chi_square`` (include_negatives=false): the 2x2 contingency
      chi-square over (a,b,c,d) = (fg_count, fg_total - fg_count,
      bg_count - fg_count, bg_total - fg_total - bg_count + fg_count)
    * ``mutual_information``: pointwise MI sum over the same table
    * ``gnd``: Google normalized distance, scored exp(-2*GND) so
      bigger = more significant

    ONE pass over the fact table: a conditional count per key gives
    fg/bg doc counts together; totals fold in via a 1x1 crossJoin of
    the same aggregate run at top level (metadata-sized) -- the plan
    is heuristic-independent, only the final scalar changes.
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
    a = F.col("fg_count").cast("double")
    b = F.col("_fg_total") - a
    c = F.col("bg_count") - a
    d = F.col("_bg_total") - F.col("_fg_total") - c
    n = F.col("_bg_total")
    if heuristic == "jlh":
        raw = (fg_pct - bg_pct) * (fg_pct / bg_pct)
    elif heuristic == "percentage":
        raw = a / F.col("bg_count")
    elif heuristic == "chi_square":
        raw = (
            n * F.pow(a * d - b * c, 2)
            / ((a + b) * (c + d) * (a + c) * (b + d))
        )
    elif heuristic == "mutual_information":
        def _mi(x, px, py):
            p = x / n
            return F.when(x > 0, p * F.log2(p / (px * py))).otherwise(0.0)
        pf, pnf = (a + b) / n, (c + d) / n
        pk, pnk = (a + c) / n, (b + d) / n
        raw = (_mi(a, pf, pk) + _mi(b, pf, pnk)
               + _mi(c, pnf, pk) + _mi(d, pnf, pnk))
    elif heuristic == "gnd":
        # f1 = key docs, f2 = foreground docs, f12 = both
        lf1 = F.log(F.col("bg_count").cast("double"))
        lf2 = F.log(F.col("_fg_total"))
        lf12 = F.log(a)
        gnd = ((F.greatest(lf1, lf2) - lf12)
               / (F.log(n) - F.least(lf1, lf2)))
        raw = F.when(a > 0, F.exp(-2.0 * gnd)).otherwise(0.0)
    else:
        raise ValueError(f"unknown significance heuristic {heuristic!r}")
    score = F.when(
        (F.col("fg_count") >= min_doc_count) & (fg_pct > bg_pct), raw
    ).otherwise(0.0)
    return (
        per_key.crossJoin(F.broadcast(totals))
        .select("key", "fg_count", "bg_count", score.alias("score"))
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


def serial_diff(buckets: DataFrame, order_col: str, value_col: str,
                lag: int = 1, out: str = "serial_diff") -> DataFrame:
    """``serial_diff`` pipeline agg: ``value - lag(value, lag)`` over
    the ordered bucket list (null for the first ``lag`` buckets, as
    OpenSearch emits). ``lag=1`` is the derivative; larger lags remove
    a seasonal period (e.g. lag=24 on hourly buckets = day-over-day).
    Coordinator-phase work on the reduced bucket list."""
    w = Window.orderBy(F.asc(order_col))
    v = F.col(value_col)
    return buckets.withColumn(out, v - F.lag(v, lag).over(w))


def moving_fn(buckets: DataFrame, order_col: str, value_col: str,
              fn: str, window_size: int,
              out: str = "moving_fn") -> DataFrame:
    """``moving_fn`` pipeline agg: any of the built-in window
    reducers (``min|max|sum|avg|stddev``) over a trailing
    ``window_size``-bucket frame, matching the shipped
    ``MovingFunctions.*`` script helpers."""
    reducer = {"min": F.min, "max": F.max, "sum": F.sum,
               "avg": F.avg, "stddev": F.stddev_samp}[fn]
    w = (Window.orderBy(F.asc(order_col))
         .rowsBetween(-(window_size - 1), 0))
    return buckets.withColumn(out, reducer(F.col(value_col)).over(w))


def bucket_script(buckets: DataFrame, out: str,
                  expr: Column) -> DataFrame:
    """``bucket_script`` pipeline agg: a per-bucket computed metric
    from the bucket's own aggregate values (OpenSearch runs a Painless
    script per reduced bucket; here it's a native column expression —
    codegen instead of a script engine)."""
    return buckets.withColumn(out, expr)


def bucket_selector(buckets: DataFrame, cond: Column) -> DataFrame:
    """``bucket_selector`` pipeline agg: drop reduced buckets whose
    aggregate values fail the predicate (the HAVING of the DSL)."""
    return buckets.filter(cond)


def bucket_sort(buckets: DataFrame, sort_cols: list[Column],
                size: int) -> DataFrame:
    """``bucket_sort`` pipeline agg: truncate the reduced bucket list
    to the top ``size`` under an explicit sort. Plans as
    TakeOrderedAndProject — no global sort materialization."""
    return buckets.orderBy(*sort_cols).limit(size)


def stats_bucket(buckets: DataFrame, value_col: str,
                 by: list[str] | None = None) -> DataFrame:
    """The sibling-bucket metric family in one pass: ``min_bucket``,
    ``max_bucket``, ``avg_bucket``, ``sum_bucket`` and ``count``
    (``stats_bucket`` response shape) over a parent aggregation's
    bucket values."""
    v = F.col(value_col)
    return buckets.groupBy(*(by or [])).agg(
        F.count(v).alias("count"),
        F.min(v).alias("min_bucket"), F.max(v).alias("max_bucket"),
        F.avg(v).alias("avg_bucket"), F.sum(v).alias("sum_bucket"),
    )


def matrix_stats(df: DataFrame, fields: list[str]) -> DataFrame:
    """``matrix_stats`` agg: per-field mean/variance plus pairwise
    covariance and Pearson correlation across numeric fields, exactly
    the OpenSearch response matrix — computed as ONE partial+final
    hash aggregate (every moment is an algebraic aggregate, so the
    map-side combine carries k + k^2 accumulators, constant-size at
    any corpus scale). Returns one row per (field_a, field_b) pair
    with (mean_a, var_a, cov, corr)."""
    aggs = [F.count(F.col(fields[0])).alias("doc_count")]
    for f_ in fields:
        aggs.append(F.avg(f_).alias(f"mean__{f_}"))
        aggs.append(F.var_samp(f_).alias(f"var__{f_}"))
    for i, a in enumerate(fields):
        for b in fields[i:]:
            aggs.append(F.covar_samp(a, b).alias(f"cov__{a}__{b}"))
            aggs.append(F.corr(a, b).alias(f"corr__{a}__{b}"))
    wide = df.agg(*aggs)
    return _matrix_explode(wide, fields)


def matrix_stats_exact(df: DataFrame, fields: list[str],
                       decimals: int = 6) -> DataFrame:
    """:func:`matrix_stats` with order-independent moments: every
    sum (S_a, Q_ab = sum(a*b)) is an exact DECIMAL(18,d) aggregate, so
    partial-merge order cannot move the last ulp, and mean/var/cov/corr
    are derived in doubles via the textbook closed forms::

        mean_a = S_a / n
        var_a  = (Q_aa - S_a*S_a/n) / (n-1)
        cov_ab = (Q_ab - S_a*S_b/n) / (n-1)
        corr   = cov_ab / sqrt(var_a * var_b)

    An oracle replaying the same formulas over the same exact sums
    reproduces the output bit-for-bit. Quantizes inputs to ``decimals``
    places — use only on decimal-quantized data.

    NULL semantics: rows missing ANY of the fields are excluded
    entirely before aggregation — the OpenSearch ``matrix_stats``
    document-drop rule (and what makes the single shared ``n`` sound;
    the legacy :func:`matrix_stats` is per-aggregate null-aware
    instead, which disagrees with the wire on partially-null docs)."""
    from functools import reduce as _reduce
    from operator import and_ as _and

    df = df.filter(_reduce(_and, [F.col(f_).isNotNull() for f_ in fields]))
    dt = f"decimal(18,{decimals})"
    cols = {f_: F.col(f_).cast(dt) for f_ in fields}
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    for f_ in fields:
        aggs.append(F.sum(cols[f_]).cast("double").alias(f"s__{f_}"))
    for i, a in enumerate(fields):
        for b in fields[i:]:
            aggs.append(F.sum(cols[a] * cols[b]).cast("double")
                        .alias(f"q__{a}__{b}"))
    wide = df.agg(*aggs)
    n = F.col("doc_count")
    for f_ in fields:
        s = F.col(f"s__{f_}")
        wide = wide.withColumn(f"mean__{f_}", s / n)
        wide = wide.withColumn(
            f"var__{f_}",
            (F.col(f"q__{f_}__{f_}") - s * s / n) / (n - F.lit(1)))
    for i, a in enumerate(fields):
        for b in fields[i:]:
            cov = ((F.col(f"q__{a}__{b}")
                    - F.col(f"s__{a}") * F.col(f"s__{b}") / n)
                   / (n - F.lit(1)))
            wide = wide.withColumn(f"cov__{a}__{b}", cov)
            wide = wide.withColumn(
                f"corr__{a}__{b}",
                F.col(f"cov__{a}__{b}")
                / F.sqrt(F.col(f"var__{a}") * F.col(f"var__{b}")))
    return _matrix_explode(wide, fields)


def _matrix_explode(wide: DataFrame, fields: list[str]) -> DataFrame:
    pairs = [
        F.struct(
            F.lit(a).alias("field_a"), F.lit(b).alias("field_b"),
            F.col(f"mean__{a}").alias("mean_a"),
            F.col(f"var__{a}").alias("var_a"),
            F.col(f"cov__{a}__{b}").alias("cov"),
            F.col(f"corr__{a}__{b}").alias("corr"),
        )
        for i, a in enumerate(fields) for b in fields[i:]
    ]
    return wide.select(
        F.explode(F.array(*pairs)).alias("p")
    ).select("p.*")


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

# ---------------------------------------------------------------------------
# range-family bucket aggregations (range / date_range / ip_range)
# ---------------------------------------------------------------------------

def range_buckets(df: DataFrame, value: Column,
                  ranges: list[tuple[str, object, object]],
                  metric: Column | None = None) -> DataFrame:
    """OpenSearch ``range`` aggregation: one bucket per configured
    interval ``[from, to)`` (from inclusive, to exclusive, either end
    open with ``None``), doc count plus an optional ``sum`` metric.
    Ranges may overlap — each is an independent predicate, exactly as
    in OpenSearch (a doc can land in several buckets).

    Scale shape: ONE full scan with a single global aggregate (every
    bucket is a conditional count/sum in the same 1-row reduce — the
    classic map-side-combined "filters" plan), then an explode of the
    1-row result into bucket rows. No shuffle wider than the number
    of configured ranges, which is query metadata.
    """
    conds = []
    for key, lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (value >= (lo if isinstance(lo, Column)
                                     else F.lit(lo)))
        if hi is not None:
            cond = cond & (value < (hi if isinstance(hi, Column)
                                    else F.lit(hi)))
        conds.append((key, cond))
    return _conditional_buckets(df, conds, metric)


def _conditional_buckets(df: DataFrame, conds: list[tuple[str, Column]],
                         metric: Column | None) -> DataFrame:
    """Shared reduce for the range family: every bucket is a
    conditional count/sum inside ONE global aggregate (1-row result),
    exploded into (key, doc_count, metric_sum) rows."""
    aggs = []
    for i, (key, cond) in enumerate(conds):
        aggs.append(F.count(F.when(cond, 1)).alias(f"__n_{i}"))
        m = metric if metric is not None else F.lit(0.0)
        # sum raw (keeps an exact-decimal metric exact: coalescing
        # against a double literal here would coerce it to double and
        # reintroduce order-dependent partial sums), zero-fill after.
        aggs.append(F.sum(F.when(cond, m)).alias(f"__m_{i}"))
    one = df.agg(*aggs)
    pairs = F.array(*[
        F.struct(
            F.lit(key).alias("key"),
            F.col(f"__n_{i}").alias("doc_count"),
            F.round(F.coalesce(F.col(f"__m_{i}"), F.lit(0)), 4)
            .cast("double").alias("metric_sum"),
        )
        for i, (key, _) in enumerate(conds)
    ])
    return (
        one.select(F.explode(pairs).alias("b"))
        .select("b.key", "b.doc_count", "b.metric_sum")
    )


def date_range_buckets(df: DataFrame, ts: Column,
                       ranges: list[tuple[str, str | None, str | None]],
                       metric: Column | None = None) -> DataFrame:
    """``date_range`` agg: :func:`range_buckets` over a timestamp
    column with ISO-string bounds (from inclusive, to exclusive —
    OpenSearch semantics)."""
    typed = [
        (k,
         None if lo is None else F.to_timestamp(F.lit(lo)),
         None if hi is None else F.to_timestamp(F.lit(hi)))
        for k, lo, hi in ranges
    ]
    return range_buckets(df, ts, typed, metric)


def _cidr_bounds(cidr: str) -> tuple[int, int]:
    """IPv4 CIDR -> [lo, hi) uint32 interval (driver-side: CIDR masks
    are query metadata)."""
    base, _, plen = cidr.partition("/")
    plen = int(plen) if plen else 32
    parts = [int(p) for p in base.split(".")]
    lo = (parts[0] << 24) | (parts[1] << 16) | (parts[2] << 8) | parts[3]
    lo &= ~((1 << (32 - plen)) - 1) & 0xFFFFFFFF
    return lo, lo + (1 << (32 - plen))


def ip_range_buckets(df: DataFrame, ip: Column,
                     ranges: list[tuple[str, str | None, str | None]],
                     masks: list[tuple[str, str]] = (),
                     metric: Column | None = None) -> DataFrame:
    """``ip_range`` agg over IPv4 string addresses: explicit
    ``[from, to)`` address bounds plus CIDR ``mask`` buckets (each
    mask expands to its [network, broadcast+1) interval driver-side —
    masks are query metadata). Comparison happens in uint32 space via
    the shared :func:`..functions.scalars.ipv4_to_long` encoding, so
    the scan-side predicate is pure integer arithmetic."""
    from ..functions.scalars import ipv4_to_long

    typed: list[tuple[str, object, object]] = [
        (k,
         None if lo is None else _cidr_bounds(lo + "/32")[0],
         None if hi is None else _cidr_bounds(hi + "/32")[0])
        for k, lo, hi in ranges
    ]
    for k, cidr in masks:
        lo, hi = _cidr_bounds(cidr)
        typed.append((k, lo, hi))
    return range_buckets(df, ipv4_to_long(ip), typed, metric)


# ---------------------------------------------------------------------------
# auto_date_histogram
# ---------------------------------------------------------------------------

# OpenSearch's rounding ladder (AutoDateHistogramAggregationBuilder's
# buildRoundings): seconds up to calendar years. Fixed-width rungs are
# (label, seconds); calendar rungs handled separately.
_AUTO_FIXED = [
    ("1s", 1), ("5s", 5), ("10s", 10), ("30s", 30),
    ("1m", 60), ("5m", 300), ("10m", 600), ("30m", 1800),
    ("1h", 3600), ("3h", 10800), ("12h", 43200),
    ("1d", 86400), ("7d", 604800),
]
_AUTO_CAL = [("1M", "month"), ("3M", None), ("1y", "year")]


def choose_auto_interval(span_seconds: float, target_buckets: int) -> str:
    """Pick the smallest rung of the ladder whose bucket count over
    ``span_seconds`` does not exceed ``target_buckets`` (OpenSearch's
    auto_date_histogram contract). Returns the rung label."""
    for label, secs in _AUTO_FIXED:
        if span_seconds / secs < target_buckets:
            return label
    for label, approx in (("1M", 2_592_000), ("3M", 7_776_000),
                          ("1y", 31_536_000)):
        if span_seconds / approx < target_buckets:
            return label
    return "1y"


def auto_date_histogram(df: DataFrame, ts: Column,
                        target_buckets: int = 10) -> DataFrame:
    """``auto_date_histogram``: the interval is chosen from the data's
    time span so the bucket count stays <= ``target_buckets``.

    The span probe is a 1-row global aggregate (min/max — two longs to
    the driver, metadata at any corpus size); the chosen rung is then
    compiled into the scan-side bucket expression, so the data pass is
    the ordinary single-shuffle date_histogram. Fixed rungs floor
    epoch seconds; calendar rungs (1M/3M/1y) use date_trunc, with 3M
    snapping months to the quarter — the same calendar/fixed split
    OpenSearch's Rounding classes make.

    Returns (interval, bucket, n) with ``bucket`` formatted
    'yyyy-MM-dd HH:mm:ss'.
    """
    row = df.agg(F.min(ts).alias("lo"), F.max(ts).alias("hi")).collect()[0]
    if row["lo"] is None:
        return df.sparkSession.createDataFrame(
            [], "interval string, bucket string, n long")
    span = (row["hi"] - row["lo"]).total_seconds()
    label = choose_auto_interval(span, target_buckets)
    fixed = dict(_AUTO_FIXED)
    if label in fixed:
        secs = fixed[label]
        bucket = F.timestamp_seconds(
            F.floor(F.unix_timestamp(ts) / secs) * secs)
    elif label == "1M":
        bucket = F.date_trunc("month", ts)
    elif label == "3M":
        m = F.date_trunc("month", ts)
        bucket = F.add_months(m, -(F.month(m) - 1) % 3)
    else:
        bucket = F.date_trunc("year", ts)
    return (
        df.groupBy(
            F.date_format(bucket, "yyyy-MM-dd HH:mm:ss").alias("bucket"))
        .agg(F.count("*").alias("n"))
        .select(F.lit(label).alias("interval"), "bucket", "n")
    )


# ---------------------------------------------------------------------------
# adjacency_matrix
# ---------------------------------------------------------------------------

def adjacency_matrix(df: DataFrame,
                     filters: list[tuple[str, Column]]) -> DataFrame:
    """``adjacency_matrix`` agg: doc counts for every named filter and
    every pairwise intersection, keyed ``a`` / ``a&b`` (names sorted,
    OpenSearch's key scheme).

    One scan builds the per-row array of matched filter names (all
    predicates evaluated in one projection — whole-stage codegen),
    expands it to singles + ordered pairs with native array transforms
    (no Python), and explodes into a hash aggregate on the bucket key.
    Key cardinality is <= n + n(n-1)/2 for n configured filters —
    query metadata — so the shuffle is trivially small no matter the
    corpus size.
    """
    # sort the matched names so pair keys come out `a&b` with a < b —
    # OpenSearch's key scheme — regardless of the caller's filter
    # order (previously `{"hot": .., "even": ..}` produced "hot&even")
    matched = F.array_sort(F.array_compact(F.array(*[
        F.when(cond, F.lit(name)) for name, cond in filters
    ])))
    singles = matched
    pairs = F.flatten(F.transform(
        matched,
        lambda a, i: F.transform(
            F.slice(matched, i + 2, F.size(matched)),
            lambda b: F.concat_ws("&", a, b),
        ),
    ))
    keys = F.concat(singles, pairs)
    return (
        df.select(F.explode(keys).alias("key"))
        .groupBy("key").agg(F.count("*").alias("doc_count"))
    )


# ---------------------------------------------------------------------------
# sampler / diversified_sampler
# ---------------------------------------------------------------------------

def sampler_top(df: DataFrame, sort_cols: list[Column],
                shard_size: int) -> DataFrame:
    """``sampler`` agg scope: restrict child aggregations to the
    ``shard_size`` best rows under ``sort_cols``. Deterministic
    single-coordinator semantics (OpenSearch samples per shard; with
    one logical shard the sample is the global top-N). The plan is a
    TakeOrderedAndProject — per-partition partial top-N before the
    single merge, never a full sort."""
    return df.orderBy(*sort_cols).limit(shard_size)


def diversified_sampler_top(df: DataFrame, sort_cols: list[Column],
                            dedup_field: str, max_docs_per_value: int,
                            shard_size: int) -> DataFrame:
    """``diversified_sampler``: like :func:`sampler_top` but first
    capping rows per ``dedup_field`` value at ``max_docs_per_value``
    (de-biasing a dominant key, OpenSearch's use case). The cap is a
    rank-limited window — WindowGroupLimit pushes the per-key limit
    map-side — then the global top-N merge."""
    w = Window.partitionBy(dedup_field).orderBy(*sort_cols)
    capped = (
        df.withColumn("_dsr", F.row_number().over(w))
        .filter(F.col("_dsr") <= max_docs_per_value).drop("_dsr")
    )
    return capped.orderBy(*sort_cols).limit(shard_size)


# ---------------------------------------------------------------------------
# significant_text
# ---------------------------------------------------------------------------

def significant_text(df: DataFrame, text_col: str, foreground: Column,
                     size: int = 10, min_doc_count: int = 1) -> DataFrame:
    """``significant_text`` agg: JLH-ranked over-represented TERMS of
    an analyzed text field (vs significant_terms' keyword keys) — the
    "what words characterize the matching docs" panel.

    Doc-frequency semantics, as in OpenSearch: a term counts once per
    document (``array_distinct`` before the explode), and the JLH
    percentages divide by DOC totals, not token totals. One tokenize
    scan: the per-term conditional aggregate computes fg/bg doc
    frequency together; the two doc totals come from a 1-row
    aggregate of the same pass's input (metadata crossJoin). Shuffle
    is vocabulary-keyed with map-side partials — the same scale shape
    as the index build's tf pass. Returns (term, fg_count, bg_count,
    score) ordered score desc, term asc.
    """
    from ..analysis import tokens_col

    base = df.select(foreground.alias("_fg"),
                     F.array_distinct(tokens_col(text_col)).alias("_ts"))
    totals = base.agg(
        F.count(F.when(F.col("_fg"), 1)).cast("double").alias("_fg_total"),
        F.count("*").cast("double").alias("_bg_total"),
    )
    per_term = (
        base.select("_fg", F.explode("_ts").alias("term"))
        .groupBy("term")
        .agg(
            F.count(F.when(F.col("_fg"), 1)).alias("fg_count"),
            F.count("*").alias("bg_count"),
        )
    )
    fg_pct = F.col("fg_count") / F.col("_fg_total")
    bg_pct = F.col("bg_count") / F.col("_bg_total")
    jlh = F.when(
        (F.col("fg_count") >= min_doc_count) & (fg_pct > bg_pct),
        (fg_pct - bg_pct) * (fg_pct / bg_pct),
    ).otherwise(0.0)
    return (
        per_term.crossJoin(F.broadcast(totals))
        .select("term", "fg_count", "bg_count", jlh.alias("score"))
        .filter(F.col("score") > 0.0)
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(size)
    )


# ---------------------------------------------------------------------------
# remaining metric/bucket aggs: weighted_avg, missing, global,
# multi_terms, boxplot, rate, t_test
# ---------------------------------------------------------------------------

def weighted_avg(df: DataFrame, value: Column, weight: Column,
                 by: list[str]) -> DataFrame:
    """``weighted_avg`` metric agg: sum(v*w)/sum(w) per bucket, docs
    with a NULL value excluded entirely (OpenSearch skips them — their
    weight must not dilute the denominator). One map-side-combinable
    hash aggregate (two partial sums)."""
    return df.groupBy(*by).agg(
        F.count("*").alias("doc_count"),
        (F.sum(value * weight)
         / F.sum(F.when(value.isNotNull(), weight))).alias("weighted_avg"),
        # exact components (numerator / denominator) so a caller that
        # needs engine-deterministic rounding can re-derive the ratio
        # itself (see detfloat.ratio_round); when `value` is fed as an
        # exact decimal these sums are order-independent.
        F.sum(value * weight).alias("vw_sum"),
        F.sum(F.when(value.isNotNull(), weight)).alias("w_sum"),
    )


def missing_count(df: DataFrame, col: Column,
                  by: list[str] | None = None) -> DataFrame:
    """``missing`` bucket agg: how many docs lack the field (NULL).
    A conditional count — same single pass as any sibling agg."""
    agg = F.count(F.when(col.isNull(), 1)).alias("missing_count")
    return df.groupBy(*by).agg(agg) if by else df.agg(agg)


def global_and_query(df: DataFrame, query: Column,
                     metric: Column) -> DataFrame:
    """``global`` agg: metrics over ALL docs alongside the filtered
    query context, WITHOUT a second scan — the classic "show my
    selection vs the whole corpus" dashboard panel. One conditional
    aggregate; returns two tagged rows (scope, doc_count, metric_sum)."""
    row = df.agg(
        F.count("*").alias("n_all"),
        F.sum(metric).alias("s_all"),
        F.count(F.when(query, 1)).alias("n_q"),
        F.sum(F.when(query, metric)).alias("s_q"),
    )
    allr = row.select(F.lit("all").alias("scope"),
                      F.col("n_all").alias("doc_count"),
                      F.col("s_all").alias("metric_sum"))
    qr = row.select(F.lit("query").alias("scope"),
                    F.col("n_q").alias("doc_count"),
                    F.col("s_q").alias("metric_sum"))
    return allr.unionByName(qr)


def multi_terms(df: DataFrame, cols: list[str], size: int = 10) -> DataFrame:
    """``multi_terms`` bucket agg: top-``size`` composite keys by doc
    count (count desc, then key asc — OpenSearch tie order). Hash agg
    on the composite key + TakeOrderedAndProject."""
    return (
        df.groupBy(*cols).agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), *[F.asc(c) for c in cols])
        .limit(size)
    )


def boxplot(df: DataFrame, value: Column, by: list[str]) -> DataFrame:
    """``boxplot`` metric agg: min / q1 / q2 / q3 / max per bucket
    (exact interpolated percentiles here; OpenSearch uses TDigest —
    same contract, sketch-free at test scale). Single hash agg."""
    return df.groupBy(*by).agg(
        F.count("*").alias("doc_count"),
        F.min(value).alias("bp_min"),
        F.percentile(value, F.lit(0.25)).alias("q1"),
        F.percentile(value, F.lit(0.5)).alias("q2"),
        F.percentile(value, F.lit(0.75)).alias("q3"),
        F.max(value).alias("bp_max"),
    )


def rate_per_day(df: DataFrame, ts: Column, by: list[str]) -> DataFrame:
    """``rate`` agg (unit=day): bucket doc count normalized by the
    corpus time span in days. The span is a 1-row aggregate broadcast
    back — one fact pass + metadata crossJoin, no second scan."""
    span = df.agg(
        (F.unix_timestamp(F.max(ts)) - F.unix_timestamp(F.min(ts)))
        .alias("span_seconds")
    )
    return (
        df.groupBy(*by).agg(F.count("*").alias("doc_count"))
        .crossJoin(F.broadcast(span))
        .select(*by, "doc_count", "span_seconds",
                # zero-span guard: a single-timestamp corpus has no
                # rate (NULL), not a DIVIDE_BY_ZERO under ANSI
                F.when(F.col("span_seconds") > 0,
                       F.col("doc_count")
                       / (F.col("span_seconds") / 86400.0))
                .alias("rate_per_day"))
    )


def welch_t_test(df: DataFrame, value: Column, pop_a: Column,
                 pop_b: Column,
                 exact_decimals: int | None = None) -> DataFrame:
    """``t_test`` metric agg (heteroscedastic / Welch): t statistic
    between two filtered populations of the same scan. One conditional
    aggregate — counts, means and variances of both groups in a single
    pass; t = (m_a - m_b) / sqrt(s2_a/n_a + s2_b/n_b).

    ``exact_decimals=d`` switches the moments to exact DECIMAL(18,d)
    sums (S, Q=sum(x^2)) merged order-independently, with mean/variance
    derived in doubles via m = S/n, v = (Q - S*S/n)/(n-1): the result
    is then bit-identical across partition counts (and across engines
    that replay the same formula), at the cost of quantizing the input
    to d decimals. Leave None for data that isn't decimal-quantized.
    """
    if exact_decimals is None:
        # nv_* = observation counts (docs with a value): the t
        # denominator must divide by the number of OBSERVATIONS, not
        # population rows — they differ only when values are NULL
        row = df.agg(
            F.count(F.when(pop_a, 1)).alias("n_a"),
            F.count(F.when(pop_a, value)).alias("nv_a"),
            F.avg(F.when(pop_a, value)).alias("m_a"),
            F.var_samp(F.when(pop_a, value)).alias("v_a"),
            F.count(F.when(pop_b, 1)).alias("n_b"),
            F.count(F.when(pop_b, value)).alias("nv_b"),
            F.avg(F.when(pop_b, value)).alias("m_b"),
            F.var_samp(F.when(pop_b, value)).alias("v_b"),
        )
        t = (F.col("m_a") - F.col("m_b")) / F.sqrt(
            F.col("v_a") / F.col("nv_a") + F.col("v_b") / F.col("nv_b")
        )
        return row.select(
            (F.col("n_a") + F.col("n_b")).alias("doc_count"),
            t.alias("t_stat"),
        )
    x = value.cast(f"decimal(18,{exact_decimals})")
    # nv_* count NON-NULL values (the moments' denominator, matching
    # the null-aware avg/var_samp of the default branch); n_* count
    # population rows (the response's doc_count, as before)
    row = df.agg(
        F.count(F.when(pop_a, 1)).alias("n_a"),
        F.count(F.when(pop_a, x)).alias("nv_a"),
        F.sum(F.when(pop_a, x)).cast("double").alias("s_a"),
        F.sum(F.when(pop_a, x * x)).cast("double").alias("q_a"),
        F.count(F.when(pop_b, 1)).alias("n_b"),
        F.count(F.when(pop_b, x)).alias("nv_b"),
        F.sum(F.when(pop_b, x)).cast("double").alias("s_b"),
        F.sum(F.when(pop_b, x * x)).cast("double").alias("q_b"),
    )
    m_a = F.col("s_a") / F.col("nv_a")
    m_b = F.col("s_b") / F.col("nv_b")
    v_a = ((F.col("q_a") - F.col("s_a") * F.col("s_a") / F.col("nv_a"))
           / (F.col("nv_a") - F.lit(1)))
    v_b = ((F.col("q_b") - F.col("s_b") * F.col("s_b") / F.col("nv_b"))
           / (F.col("nv_b") - F.lit(1)))
    t = (m_a - m_b) / F.sqrt(v_a / F.col("nv_a") + v_b / F.col("nv_b"))
    return row.select(
        (F.col("n_a") + F.col("n_b")).alias("doc_count"), t.alias("t_stat")
    )
