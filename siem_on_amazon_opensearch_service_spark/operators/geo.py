"""Geo query/agg family over ``geo_point`` columns (lat/lon doubles).

The reference maps 10 fields as ``geo_point`` (e.g.
``destination.geo.location``, deploy_es/data.ini:127) and its
dashboards draw ``region_map`` / coordinate-map rollups
(saved_objects/each-dashboard/waf.ndjson).  The OpenSearch surface
this module reproduces natively:

* ``geohash_grid`` aggregation — the base32 geohash cell of a point at
  a fixed precision (:func:`geohash_sql`);
* ``geo_bounding_box`` filter — pure comparisons;
* ``geo_distance`` filter / sort — haversine distance
  (:func:`haversine_km`), already used by the ring rollup in
  ``entry_etl.join_range_geo_bands``;
* ``geo_bounds`` / ``geo_centroid`` metric aggregations — min/max and
  arithmetic-mean of coordinates per bucket.

Everything is closed-form native column arithmetic — map-side,
codegen, no UDF, no shuffle beyond the final aggregation — so each
construct costs the same as a ``count(*)`` at 100 TB.

Dialect note: :func:`geohash_sql` emits ONE SQL text that parses
identically in Spark SQL and DuckDB (floor/cast/% arithmetic instead
of shift operators; ``substring`` is 1-based in both), so the engine
expression and the correctness oracle are literally the same code —
the same trick ``analysis.tokens_sql`` uses for the tokenizer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the geohash base32 alphabet (public spec: no a/i/l/o).
_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_sql(idx_sql: str, bit: int) -> str:
    """SQL for bit ``bit`` of the small non-negative integer expression
    ``idx_sql`` (values < 2^26, exact in doubles), shift-free so the
    text parses in both Spark SQL and DuckDB."""
    if bit == 0:
        return f"(({idx_sql}) % 2)"
    return f"(cast(floor(({idx_sql}) / {1 << bit}) as bigint) % 2)"


def geohash_sql(lat_sql: str, lon_sql: str, precision: int = 4) -> str:
    """SQL expression (Spark SQL == DuckDB dialect subset) computing
    the geohash string of (lat, lon) at ``precision`` characters.

    Closed form instead of the textbook bisection loop: the cell
    indices are ``floor((lat+90)/180 * 2^latbits)`` (resp. lon/360),
    interleaved MSB-first with longitude taking the even positions —
    bit-identical to the iterative algorithm."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    lat_idx = (f"least(cast(floor((({lat_sql}) + 90.0) / 180.0 * "
               f"{1 << lat_bits}) as bigint), {(1 << lat_bits) - 1})")
    lon_idx = (f"least(cast(floor((({lon_sql}) + 180.0) / 360.0 * "
               f"{1 << lon_bits}) as bigint), {(1 << lon_bits) - 1})")
    terms: list[str] = []
    for i in range(lon_bits):  # even interleave positions (0-based MSB)
        weight = 1 << (total - 1 - 2 * i)
        terms.append(f"{_bit_sql(lon_idx, lon_bits - 1 - i)} * {weight}")
    for i in range(lat_bits):  # odd positions
        weight = 1 << (total - 2 - 2 * i)
        terms.append(f"{_bit_sql(lat_idx, lat_bits - 1 - i)} * {weight}")
    gh_int = "(" + " + ".join(terms) + ")"
    chars = [
        f"substring('{_B32}', "
        f"cast(cast(floor({gh_int} / {1 << (5 * (precision - 1 - c))}) "
        f"as bigint) % 32 + 1 as int), 1)"
        for c in range(precision)
    ]
    return "concat(" + ", ".join(chars) + ")"


def geohash(lat_sql: str, lon_sql: str, precision: int = 4) -> Column:
    """``geohash_grid`` bucket key as a native Spark column. Takes the
    coordinate expressions as SQL text (the same text the DuckDB
    oracle uses) so both engines evaluate one definition."""
    return F.expr(geohash_sql(lat_sql, lon_sql, precision))


def geohex_sql(lat_sql: str, lon_sql: str, resolution: int = 4) -> str:
    """SQL expression (Spark SQL == DuckDB dialect subset) computing a
    hexagonal grid cell key for (lat, lon) at ``resolution`` — the
    ``geohex_grid`` aggregation's bucket key.

    Upstream keys cells with Uber H3 (icosahedral, needs the H3
    native lib); this engine bins on a deterministic POINTY-TOP AXIAL
    hex lattice over the equirectangular plane instead — same agg
    shape (hex cells, halving-size resolution ladder 0..15, top-N by
    count), different key encoding, honestly documented.  Key format:
    ``res/q/r`` axial coordinates.  Hex circumradius = 45/2^res
    degrees; axial coords use the standard pointy-top basis
    (q = (x/√3 − y/3)/s, r = (2y/3)/s) with cube rounding
    (Red Blob Games' published hex-grid algebra).  Nearest-integer
    rounding is written ``floor(x + 0.5)`` so both dialects
    (and the python twin) agree exactly at ties."""
    if not 0 <= resolution <= 15:
        raise ValueError("geohex resolution must be 0..15")
    s = repr(45.0 / (1 << resolution))
    qe = (f"((0.5773502691896258 * ({lon_sql}) - ({lat_sql}) / 3.0)"
          f" / {s})")
    rr = f"((2.0 * ({lat_sql}) / 3.0) / {s})"
    rx = f"floor({qe} + 0.5)"
    rz = f"floor({rr} + 0.5)"
    ry = f"floor((0.0 - {qe} - {rr}) + 0.5)"
    dx = f"abs({rx} - {qe})"
    dy = f"abs({ry} + {qe} + {rr})"
    dz = f"abs({rz} - {rr})"
    big = f"({dx} > {dy} AND {dx} > {dz})"
    fq = f"(CASE WHEN {big} THEN 0.0 - {ry} - {rz} ELSE {rx} END)"
    fr = (f"(CASE WHEN (NOT {big}) AND NOT ({dy} > {dz}) "
          f"THEN 0.0 - {rx} - {ry} ELSE {rz} END)")
    return (f"concat('{resolution}/', cast({fq} as bigint), '/', "
            f"cast({fr} as bigint))")


def geohex(lat_sql: str, lon_sql: str, resolution: int = 4) -> Column:
    """``geohex_grid`` bucket key as a native Spark column (takes SQL
    text so the DuckDB oracle evaluates the same definition)."""
    return F.expr(geohex_sql(lat_sql, lon_sql, resolution))


def geohex_py(lat: float, lon: float, resolution: int = 4) -> str:
    """Pure-python twin of :func:`geohex_sql` (tests pin the three
    implementations to one definition)."""
    import math

    s = 45.0 / (1 << resolution)
    qe = (0.5773502691896258 * lon - lat / 3.0) / s
    rr = (2.0 * lat / 3.0) / s
    rx = math.floor(qe + 0.5)
    rz = math.floor(rr + 0.5)
    ry = math.floor((0.0 - qe - rr) + 0.5)
    dx, dy, dz = abs(rx - qe), abs(ry + qe + rr), abs(rz - rr)
    if dx > dy and dx > dz:
        fq, fr = -ry - rz, rz
    elif dy > dz:
        fq, fr = rx, rz
    else:
        fq, fr = rx, -rx - ry
    return f"{resolution}/{int(fq)}/{int(fr)}"


def haversine_km(lat: Column, lon: Column,
                 center_lat: float, center_lon: float) -> Column:
    """Great-circle distance in km to a fixed center (the
    ``geo_distance`` filter/sort metric), R = 6371 km."""
    clat = F.lit(float(center_lat))
    return (
        2 * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(lat - clat) / 2), 2)
                + F.cos(F.radians(clat)) * F.cos(F.radians(lat))
                * F.pow(
                    F.sin(F.radians(lon - F.lit(float(center_lon))) / 2), 2
                )
            )
        )
    )


def in_bounding_box(lat: Column, lon: Column, top: float, left: float,
                    bottom: float, right: float) -> Column:
    """``geo_bounding_box`` filter predicate (non-dateline-crossing
    box: left < right). Pure comparisons — pushes down to the scan."""
    return (
        (lat <= F.lit(top)) & (lat >= F.lit(bottom))
        & (lon >= F.lit(left)) & (lon <= F.lit(right))
    )


def geo_bounds_centroid(df: DataFrame, lat: Column, lon: Column,
                        by: list[str] | None = None) -> DataFrame:
    """``geo_bounds`` + ``geo_centroid`` metric aggs in one pass:
    (top, bottom, left, right, centroid_lat, centroid_lon, n) per
    bucket (or globally). Partial+final hash agg — map-side combine."""
    base = df.select(lat.alias("_lat"), lon.alias("_lon"), *(by or []))
    la, lo = F.col("_lat"), F.col("_lon")
    return base.groupBy(*(by or [])).agg(
        F.max(la).alias("top"), F.min(la).alias("bottom"),
        F.min(lo).alias("left"), F.max(lo).alias("right"),
        F.avg(la).alias("centroid_lat"), F.avg(lo).alias("centroid_lon"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# geo queries (query-DSL filter context) — shared-dialect SQL text
# ---------------------------------------------------------------------------

def bbox_sql(lat_sql: str, lon_sql: str, top: float, left: float,
             bottom: float, right: float) -> str:
    """``geo_bounding_box`` query as ONE SQL boolean that parses
    identically in Spark SQL and DuckDB (the geohash_sql trick) — so
    the engine predicate and the correctness oracle are the same
    text. Non-wrapping box (left < right); pure comparisons, pushes
    down to the scan."""
    return (f"(({lat_sql}) <= {float(top)!r} AND "
            f"({lat_sql}) >= {float(bottom)!r} AND "
            f"({lon_sql}) >= {float(left)!r} AND "
            f"({lon_sql}) <= {float(right)!r})")


def haversine_sql(lat_sql: str, lon_sql: str,
                  center_lat: float, center_lon: float) -> str:
    """Great-circle distance in km to a fixed center as shared-dialect
    SQL (radians/sin/cos/asin parse in both engines); the
    ``geo_distance`` QUERY's metric, same formula as
    :func:`haversine_km`."""
    la, lo = f"radians({lat_sql})", f"radians({lon_sql})"
    cla, clo = (f"radians({float(center_lat)!r})",
                f"radians({float(center_lon)!r})")
    return (
        f"(2 * 6371.0 * asin(sqrt("
        f"pow(sin(({la} - {cla}) / 2), 2) + "
        f"cos({la}) * cos({cla}) * "
        f"pow(sin(({lo} - {clo}) / 2), 2))))"
    )


def point_in_polygon_sql(lat_sql: str, lon_sql: str,
                         points: list[tuple[float, float]]) -> str:
    """``geo_polygon`` / polygon-``geo_shape`` containment as ONE
    closed-form SQL boolean: textbook ray casting (odd crossing
    parity of the eastward ray), one CASE term per polygon edge —
    whole-stage codegen on the Spark side, the identical text on the
    DuckDB side. ``points`` are (lat, lon) vertices in ring order
    (closing edge implied). Edges with y1 == y2 can never satisfy the
    crossing test, so the division is guarded by construction.

    Scale: the polygon is a driver-side literal; N edges cost N
    comparisons per row — map-side, no join, no UDF.
    """
    if len(points) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    terms = []
    n = len(points)
    for i in range(n):
        y1, x1 = (float(points[i][0]), float(points[i][1]))
        y2, x2 = (float(points[(i + 1) % n][0]),
                  float(points[(i + 1) % n][1]))
        if y1 == y2:
            continue  # horizontal edge: parity unchanged
        terms.append(
            f"(CASE WHEN (({y1!r} > ({lat_sql})) <> "
            f"({y2!r} > ({lat_sql}))) AND "
            f"(({lon_sql}) < ({x2!r} - {x1!r}) * "
            f"(({lat_sql}) - {y1!r}) / ({y2!r} - {y1!r}) + {x1!r}) "
            f"THEN 1 ELSE 0 END)"
        )
    if not terms:
        return "(1 = 0)"
    return f"((({' + '.join(terms)}) % 2) = 1)"
