"""Agg-surface breadth: adjacency_matrix, variable_width_histogram,
boxplot, matrix_stats, geo_line — each pinned to a pure-python/numpy
twin computed from the same rows."""

import json
import math

import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    run_aggs,
)

ROWS = [
    # (doc_id, grp, value, weight, lat, lon, t)
    (0, "a", 1.0, 2.0, 35.0, 139.0, 3.0),
    (1, "a", 2.0, 4.0, 34.0, 135.0, 1.0),
    (2, "b", 3.0, 6.0, 51.0, -0.1, 2.0),
    (3, "b", 4.0, 7.0, 40.0, -74.0, 5.0),
    (4, "b", 5.0, 1.0, 48.0, 2.3, 4.0),
    (5, "c", 6.0, 9.0, 52.0, 13.4, 6.0),
    (6, "c", 7.0, 3.0, 41.0, 12.5, 0.0),
    (7, "a", 8.0, 5.0, 59.0, 18.1, 7.0),
    (8, "b", 9.0, 8.0, 37.0, -122.0, 8.0),
    (9, "c", 10.0, 0.5, 55.0, 37.6, 9.0),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, g, v, w, {"lat": la, "lon": lo}, t)
         for i, g, v, w, la, lo, t in ROWS],
        "doc_id long, grp string, value double, weight double, "
        "loc struct<lat:double,lon:double>, t double")


def test_adjacency_matrix(docs):
    spec = {"adj": {"adjacency_matrix": {"filters": {
        "grp_a": {"term": {"grp": "a"}},
        "big": {"range": {"value": {"gte": 5}}},
        "light": {"range": {"weight": {"lt": 4}}},
    }}}}
    got = {r["adj"]: r["doc_count"]
           for r in run_aggs(docs, spec, "text")["adj"].collect()}
    sets = {
        "grp_a": {i for i, g, v, w, *_ in ROWS if g == "a"},
        "big": {i for i, g, v, w, *_ in ROWS if v >= 5},
        "light": {i for i, g, v, w, *_ in ROWS if w < 4},
    }
    exp = {k: len(s) for k, s in sets.items() if s}
    names = sorted(sets)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            inter = sets[a] & sets[b]
            if inter:
                exp[f"{a}&{b}"] = len(inter)
    assert got == exp
    # custom separator
    spec2 = {"adj": {"adjacency_matrix": {
        "separator": "|", "filters": {
            "grp_a": {"term": {"grp": "a"}},
            "big": {"range": {"value": {"gte": 5}}}}}}}
    got2 = {r["adj"] for r in run_aggs(docs, spec2, "text")["adj"]
            .collect()}
    assert "big|grp_a" in got2


def test_variable_width_histogram(docs):
    spec = {"vw": {"variable_width_histogram":
                   {"field": "value", "buckets": 4},
                   "aggs": {"mn": {"min": {"field": "value"}},
                            "mx": {"max": {"field": "value"}}}}}
    out = {int(r["vw"]): (r["doc_count"], r["mn"], r["mx"])
           for r in run_aggs(docs, spec, "text")["vw"].collect()}
    vals = sorted(v for _i, _g, v, *_ in ROWS)
    splits = list(np.percentile(vals, [25, 50, 75],
                                method="linear"))
    exp = {}
    for v in vals:
        b = sum(v > s for s in splits)
        lo, hi, n = exp.get(b, (math.inf, -math.inf, 0))
        exp[b] = (min(lo, v), max(hi, v), n + 1)
    assert out == {b: (n, lo, hi) for b, (lo, hi, n) in exp.items()}
    # equal-depth: 10 values over 4 buckets -> sizes differ by <= 1
    # around the exact quartile cut
    assert sum(n for n, *_ in out.values()) == len(vals)


def test_boxplot_exact_quartiles(docs):
    spec = {"by": {"terms": {"field": "grp"}, "aggs": {
        "bp": {"boxplot": {"field": "value"}}}}}
    out = {r["by"]: r for r in
           run_aggs(docs, spec, "text")["by"].collect()}
    for g in ("a", "b", "c"):
        vals = [v for _i, gg, v, *_ in ROWS if gg == g]
        r = out[g]
        assert r["bp_min"] == min(vals) and r["bp_max"] == max(vals)
        for col, p in (("bp_q1", 25), ("bp_q2", 50), ("bp_q3", 75)):
            assert r[col] == pytest.approx(
                float(np.percentile(vals, p, method="linear")), abs=1e-12)


def test_matrix_stats_numpy_twin(docs):
    spec = {"ms": {"matrix_stats": {"fields": ["value", "weight"]}}}
    r = run_aggs(docs, spec, "text")["_metrics"].collect()[0]
    v = np.array([x for _i, _g, x, *_ in ROWS])
    w = np.array([x for _i, _g, _v, x, *_ in ROWS])
    for f, arr in (("value", v), ("weight", w)):
        assert r[f"ms_{f}_count"] == len(arr)
        assert r[f"ms_{f}_mean"] == pytest.approx(arr.mean(), abs=1e-12)
        assert r[f"ms_{f}_variance"] == pytest.approx(
            arr.var(ddof=1), abs=1e-12)
        c = arr - arr.mean()
        skew = (c ** 3).mean() / (c ** 2).mean() ** 1.5
        kurt = (c ** 4).mean() / (c ** 2).mean() ** 2 - 3.0
        assert r[f"ms_{f}_skewness"] == pytest.approx(skew, abs=1e-9)
        assert r[f"ms_{f}_kurtosis"] == pytest.approx(kurt, abs=1e-9)
    cov = float(np.cov(v, w, ddof=1)[0, 1])
    cor = float(np.corrcoef(v, w)[0, 1])
    assert r["ms_value_weight_covariance"] == pytest.approx(cov, abs=1e-12)
    assert r["ms_value_weight_correlation"] == pytest.approx(cor, abs=1e-12)


def test_matrix_stats_excludes_docs_missing_any_field(spark):
    df = spark.createDataFrame(
        [(0, 1.0, 10.0), (1, 2.0, None), (2, 3.0, 30.0),
         (3, None, 40.0)],
        "doc_id long, a double, b double")
    r = run_aggs(df, {"ms": {"matrix_stats": {"fields": ["a", "b"]}}},
                 "text")["_metrics"].collect()[0]
    # only docs 0 and 2 carry BOTH fields
    assert r["ms_a_count"] == 2 and r["ms_b_count"] == 2
    assert r["ms_a_mean"] == 2.0 and r["ms_b_mean"] == 20.0


def test_geo_line(docs):
    spec = {"by": {"terms": {"field": "grp"}, "aggs": {
        "path": {"geo_line": {"point": {"field": "loc"},
                              "sort": {"field": "t"}}}}}}
    out = {r["by"]: json.loads(r["path"]) for r in
           run_aggs(docs, spec, "text")["by"].collect()}
    for g in ("a", "b", "c"):
        pts = sorted(((t, lo, la) for _i, gg, _v, _w, la, lo, t in ROWS
                      if gg == g))
        assert out[g] == [[lo, la] for _t, lo, la in pts]
    # desc order + size cap
    spec2 = {"path": {"geo_line": {
        "point": {"field": "loc"}, "sort": {"field": "t"},
        "sort_order": "desc", "size": 3}}}
    r = run_aggs(docs, spec2, "text")["_metrics"].collect()[0]
    pts = sorted(((t, lo, la) for _i, _g, _v, _w, la, lo, t in ROWS),
                 reverse=True)[:3]
    assert json.loads(r["path"]) == [[lo, la] for _t, lo, la in pts]
