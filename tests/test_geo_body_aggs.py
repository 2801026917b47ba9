"""Geo family inside the _search aggs dispatcher: geohash_grid /
geotile_grid / geo_distance buckets and geo_bounds / geo_centroid
metrics, cross-checked vs DuckDB (grid keys share ONE SQL text) and
numpy haversine."""

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    run_aggs,
)
from siem_on_amazon_opensearch_service_spark.operators.geo import (
    geohash_sql,
)
from siem_on_amazon_opensearch_service_spark.operators.aggs import (
    geotile_duck_sql,
)

N = 300


def _pdf():
    # deterministic scatter over central Europe-ish coordinates
    rows = []
    for i in range(N):
        lat = 35.0 + (i * 37 % 200) / 10.0      # 35.0 .. 54.9
        lon = -5.0 + (i * 53 % 300) / 10.0      # -5.0 .. 24.9
        rows.append((i, lat, lon))
    return pd.DataFrame(rows, columns=["doc_id", "lat", "lon"])


@pytest.fixture(scope="module")
def docs(spark):
    pdf = _pdf()
    return (spark.createDataFrame(pdf)
            .withColumn("location", F.struct(
                F.col("lat").alias("lat"), F.col("lon").alias("lon")))
            .drop("lat", "lon"))


def test_geohash_grid_vs_duckdb(docs):
    got = {r["cells"]: r["doc_count"] for r in run_aggs(
        docs, {"cells": {"geohash_grid": {
            "field": "location", "precision": 3}}})["cells"].collect()}
    con = duckdb.connect()
    con.register("d", _pdf())
    want = dict(con.execute(
        f"SELECT {geohash_sql('lat', 'lon', 3)} AS g, count(*) "
        "FROM d GROUP BY 1").fetchall())
    con.close()
    assert got == want
    assert len(got) > 10  # non-vacuous spread


def test_geotile_grid_vs_duckdb(docs):
    got = {r["tiles"]: r["doc_count"] for r in run_aggs(
        docs, {"tiles": {"geotile_grid": {
            "field": "location", "precision": 6}}})["tiles"].collect()}
    con = duckdb.connect()
    con.register("d", _pdf())
    want = dict(con.execute(
        f"SELECT {geotile_duck_sql('lat', 'lon', 6)} AS t, count(*) "
        "FROM d GROUP BY 1").fetchall())
    con.close()
    assert got == want and len(got) > 5


def _hav_km(lat, lon, clat, clon):
    la1, lo1, la2, lo2 = map(math.radians, (lat, lon, clat, clon))
    h = (math.sin((la1 - la2) / 2) ** 2
         + math.cos(la2) * math.cos(la1) * math.sin((lo1 - lo2) / 2) ** 2)
    return 2 * 6371.0 * math.asin(math.sqrt(h))


def test_geo_distance_rings_vs_python(docs):
    origin = {"lat": 48.0, "lon": 11.0}
    out = run_aggs(docs, {"rings": {"geo_distance": {
        "field": "location", "origin": origin, "unit": "km",
        "ranges": [{"to": 300}, {"from": 300, "to": 900},
                   {"from": 900}],
    }}})["rings"]
    got = {r["rings"]: r["doc_count"] for r in out.collect()}
    want: dict = {}
    for _, r in _pdf().iterrows():
        d = _hav_km(r["lat"], r["lon"], 48.0, 11.0)
        key = ("*-300" if d < 300 else
               "300-900" if d < 900 else "900-*")
        want[key] = want.get(key, 0) + 1
    assert got == want
    assert set(got) == {"*-300", "300-900", "900-*"}


def test_geo_bounds_centroid_metrics(docs):
    out = run_aggs(docs, {
        "b": {"geo_bounds": {"field": "location"}},
        "c": {"geo_centroid": {"field": "location"}},
    })["_metrics"].collect()[0]
    pdf = _pdf()
    assert out["b_top"] == pytest.approx(pdf["lat"].max())
    assert out["b_bottom"] == pytest.approx(pdf["lat"].min())
    assert out["b_left"] == pytest.approx(pdf["lon"].min())
    assert out["b_right"] == pytest.approx(pdf["lon"].max())
    assert out["c_lat"] == pytest.approx(pdf["lat"].mean())
    assert out["c_lon"] == pytest.approx(pdf["lon"].mean())
    assert out["c_count"] == N


def test_grid_nests_with_metrics(docs):
    # grid bucket > centroid metric: the tile-map payload shape
    out = run_aggs(docs, {"cells": {
        "geohash_grid": {"field": "location", "precision": 2},
        "aggs": {"c": {"geo_centroid": {"field": "location"}}},
    }})["cells"].toPandas()
    pdf = _pdf()
    con = duckdb.connect()
    con.register("d", pdf)
    want = con.execute(
        f"SELECT {geohash_sql('lat', 'lon', 2)} AS g, count(*) AS n, "
        "avg(lat) AS clat FROM d GROUP BY 1").df().set_index("g")
    con.close()
    assert len(out) == len(want)
    for _, r in out.iterrows():
        w = want.loc[r["cells"]]
        assert r["doc_count"] == w["n"]
        assert r["c_lat"] == pytest.approx(w["clat"])


def test_geohex_grid_three_way(docs):
    from siem_on_amazon_opensearch_service_spark.operators.geo import (
        geohex_py,
        geohex_sql,
    )

    got = {r["hexes"]: r["doc_count"] for r in run_aggs(
        docs, {"hexes": {"geohex_grid": {
            "field": "location", "precision": 5}}})["hexes"].collect()}
    con = duckdb.connect()
    con.register("d", _pdf())
    want = dict(con.execute(
        f"SELECT {geohex_sql('lat', 'lon', 5)} AS h, count(*) "
        "FROM d GROUP BY 1").fetchall())
    con.close()
    assert got == want
    assert len(got) > 10  # non-vacuous spread
    # python twin agrees cell-by-cell
    pdf = _pdf()
    twin: dict[str, int] = {}
    for lat, lon in zip(pdf["lat"], pdf["lon"]):
        k = geohex_py(lat, lon, 5)
        twin[k] = twin.get(k, 0) + 1
    assert got == twin
    # resolution ladder: finer cells partition coarser ones
    coarse = {geohex_py(lat, lon, 2)
              for lat, lon in zip(pdf["lat"], pdf["lon"])}
    assert len(coarse) < len(got)
    # locality: nearby points share a cell, far points do not
    assert geohex_py(48.0, 11.0, 4) == geohex_py(48.01, 11.01, 4)
    assert geohex_py(48.0, 11.0, 4) != geohex_py(50.0, 15.0, 4)
