"""Geo queries in the _search body filter context (geo_bounding_box /
geo_distance / geo_polygon / polygon geo_shape): the compiled
predicate is ONE shared-dialect SQL boolean, so each test checks the
match set three ways — the engine through search_hits, the same SQL
text in DuckDB, and a pure-Python geometry oracle."""

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.index import (
    build_index,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    compile_query, search_hits,
)
from siem_on_amazon_opensearch_service_spark.operators.geo import (
    bbox_sql, haversine_sql, point_in_polygon_sql,
)

N = 240


def _pdf():
    rows = []
    for i in range(N):
        lat = 35.0 + (i * 37 % 200) / 10.0      # 35.0 .. 54.9
        lon = -5.0 + (i * 53 % 300) / 10.0      # -5.0 .. 24.9
        rows.append((i, f"city page w{i % 7}", lat, lon))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lat", "lon"])


@pytest.fixture(scope="module")
def geo_pdf():
    return _pdf()


@pytest.fixture(scope="module")
def geo_ix(spark, geo_pdf):
    sdf = (spark.createDataFrame(geo_pdf)
           .withColumn("location", F.struct(
               F.col("lat").alias("lat"), F.col("lon").alias("lon")))
           .drop("lat", "lon"))
    return build_index(spark, sdf, id_col="doc_id",
                       keep_cols=["location"], salt_threshold=60)


def _hit_ids(geo_ix, geo_filter):
    body = {"query": {"bool": {"filter": [geo_filter]}}, "size": N}
    return sorted(r["doc_id"] for r in
                  search_hits(geo_ix, body).collect())


def _duck_ids(geo_pdf, sql):
    con = duckdb.connect()
    con.register("d", geo_pdf)
    # the engine SQL references location.lat / location.lon
    got = con.execute(
        "SELECT doc_id FROM (SELECT doc_id, lat AS \"location.lat\", "
        "lon AS \"location.lon\" FROM d) "
        f"WHERE {sql.replace('location.lat', chr(34) + 'location.lat' + chr(34)).replace('location.lon', chr(34) + 'location.lon' + chr(34))}"
    ).fetchall()
    con.close()
    return sorted(r[0] for r in got)


BOX = {"top_left": {"lat": 50.0, "lon": 0.0},
       "bottom_right": {"lat": 40.0, "lon": 12.5}}


def test_geo_bounding_box(geo_ix, geo_pdf):
    got = _hit_ids(geo_ix, {"geo_bounding_box": {"location": BOX}})
    exp = sorted(
        int(r.doc_id) for r in geo_pdf.itertuples()
        if 40.0 <= r.lat <= 50.0 and 0.0 <= r.lon <= 12.5)
    assert got == exp and 0 < len(exp) < N
    sql = bbox_sql("location.lat", "location.lon", 50.0, 0.0, 40.0,
                   12.5)
    assert _duck_ids(geo_pdf, sql) == exp


def _hav_km(lat1, lon1, lat2, lon2):
    la1, lo1, la2, lo2 = map(math.radians, (lat1, lon1, lat2, lon2))
    return 2 * 6371.0 * math.asin(math.sqrt(
        math.sin((la1 - la2) / 2) ** 2
        + math.cos(la1) * math.cos(la2)
        * math.sin((lo1 - lo2) / 2) ** 2))


@pytest.mark.parametrize("dist,km", [("500km", 500.0),
                                     ("300mi", 300 * 1.609344),
                                     ("400000m", 400.0)])
def test_geo_distance(geo_ix, geo_pdf, dist, km):
    center = {"lat": 45.0, "lon": 8.0}
    got = _hit_ids(geo_ix, {"geo_distance": {
        "distance": dist, "location": center}})
    exp = sorted(
        int(r.doc_id) for r in geo_pdf.itertuples()
        if _hav_km(r.lat, r.lon, 45.0, 8.0) <= km)
    assert got == exp and 0 < len(exp) < N
    sql = (f"({haversine_sql('location.lat', 'location.lon', 45.0, 8.0)}"
           f" <= {km!r})")
    assert _duck_ids(geo_pdf, sql) == exp


# a non-convex pentagon over the scatter (lat, lon) — exercises the
# parity count beyond simple quads
PENTA = [(38.0, 0.0), (52.0, 2.0), (47.0, 10.0), (53.0, 18.0),
         (39.0, 14.0)]


def _py_in_poly(lat, lon, pts):
    inside = False
    n = len(pts)
    for i in range(n):
        y1, x1 = pts[i]
        y2, x2 = pts[(i + 1) % n]
        if (y1 > lat) != (y2 > lat):
            xcross = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
            if lon < xcross:
                inside = not inside
    return inside


def test_geo_polygon(geo_ix, geo_pdf):
    got = _hit_ids(geo_ix, {"geo_polygon": {"location": {
        "points": [{"lat": la, "lon": lo} for la, lo in PENTA]}}})
    exp = sorted(int(r.doc_id) for r in geo_pdf.itertuples()
                 if _py_in_poly(r.lat, r.lon, PENTA))
    assert got == exp and 0 < len(exp) < N
    sql = point_in_polygon_sql("location.lat", "location.lon", PENTA)
    assert _duck_ids(geo_pdf, sql) == exp


def test_geo_shape_polygon_geojson(geo_ix, geo_pdf):
    # GeoJSON: (lon, lat) coordinates, explicitly closed ring; the
    # compiler drops the closing vertex
    ring = [[lo, la] for la, lo in PENTA] + [[PENTA[0][1], PENTA[0][0]]]
    got = _hit_ids(geo_ix, {"geo_shape": {"location": {
        "shape": {"type": "polygon", "coordinates": [ring]},
        "relation": "intersects"}}})
    exp = sorted(int(r.doc_id) for r in geo_pdf.itertuples()
                 if _py_in_poly(r.lat, r.lon, PENTA))
    assert got == exp


def test_geo_shape_envelope(geo_ix, geo_pdf):
    # GeoJSON envelope: [[minlon, maxlat], [maxlon, minlat]]
    got = _hit_ids(geo_ix, {"geo_shape": {"location": {
        "shape": {"type": "envelope",
                  "coordinates": [[0.0, 50.0], [12.5, 40.0]]}}}})
    exp = sorted(
        int(r.doc_id) for r in geo_pdf.itertuples()
        if 40.0 <= r.lat <= 50.0 and 0.0 <= r.lon <= 12.5)
    assert got == exp and 0 < len(exp) < N


TRI_A = [(36.0, -2.0), (44.0, -2.0), (40.0, 6.0)]
TRI_B = [(48.0, 15.0), (54.0, 15.0), (51.0, 22.0)]


def test_geo_shape_multipolygon(geo_ix, geo_pdf):
    def ring(pts):
        return [[lo, la] for la, lo in pts] + [[pts[0][1], pts[0][0]]]

    got = _hit_ids(geo_ix, {"geo_shape": {"location": {
        "shape": {"type": "multipolygon",
                  "coordinates": [[ring(TRI_A)], [ring(TRI_B)]]}}}})
    exp = sorted(int(r.doc_id) for r in geo_pdf.itertuples()
                 if _py_in_poly(r.lat, r.lon, TRI_A)
                 or _py_in_poly(r.lat, r.lon, TRI_B))
    assert got == exp and 0 < len(exp) < N
    # the two lobes are disjoint: union == sum of the parts
    a = sorted(int(r.doc_id) for r in geo_pdf.itertuples()
               if _py_in_poly(r.lat, r.lon, TRI_A))
    b = sorted(int(r.doc_id) for r in geo_pdf.itertuples()
               if _py_in_poly(r.lat, r.lon, TRI_B))
    assert len(exp) == len(a) + len(b) and a and b


def test_geo_combines_with_text_clause(geo_ix, geo_pdf):
    body = {"query": {"bool": {
        "must": [{"match": {"text": "w3"}}],
        "filter": [{"geo_bounding_box": {"location": BOX}}],
    }}, "size": N}
    got = sorted(r["doc_id"] for r in
                 search_hits(geo_ix, body).collect())
    exp = sorted(
        int(r.doc_id) for r in geo_pdf.itertuples()
        if r.doc_id % 7 == 3
        and 40.0 <= r.lat <= 50.0 and 0.0 <= r.lon <= 12.5)
    assert got == exp and exp


def test_geo_errors():
    with pytest.raises(ValueError, match="bad distance"):
        compile_query({"geo_distance": {
            "distance": "5 parsecs", "location": {"lat": 0, "lon": 0}}})
    with pytest.raises(ValueError, match="polygon"):
        compile_query({"geo_shape": {"location": {
            "shape": {"type": "circle", "coordinates": [0, 0]}}}})
    with pytest.raises(ValueError, match=">= 3"):
        point_in_polygon_sql("lat", "lon", [(0, 0), (1, 1)])


def test_degenerate_all_horizontal_polygon():
    assert point_in_polygon_sql(
        "lat", "lon", [(1.0, 0.0), (1.0, 5.0), (1.0, 9.0)]) == "(1 = 0)"
