"""Seasonal median/MAD anomaly detector (OpenSearch AD contract)."""

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators.anomaly import (
    anomaly_grade, anomaly_score, detect, seasonal_mad_baseline)


@pytest.fixture(scope="module")
def series(spark):
    # entity 'a': hour-of-day slot '03' sees 10,10,10,10,50 over five
    # days (one spike); slot '04' is constant. entity 'b': noisy but
    # in-band.
    rows = []
    for day in range(5):
        rows.append(("a", f"2024-03-{day+1:02d} 03:00:00", "03",
                     50.0 if day == 4 else 10.0))
        rows.append(("a", f"2024-03-{day+1:02d} 04:00:00", "04", 7.0))
        rows.append(("b", f"2024-03-{day+1:02d} 03:00:00", "03",
                     float(20 + day)))
    return spark.createDataFrame(
        rows, "entity string, h string, hod string, n double")


def test_baseline_median_mad(series):
    base = {(r.entity, r.hod): (r.med, r.mad)
            for r in seasonal_mad_baseline(
                series, ["entity"], "hod", "n").collect()}
    assert base[("a", "03")] == (10.0, 0.0)   # median robust to spike
    assert base[("a", "04")] == (7.0, 0.0)
    assert base[("b", "03")] == (22.0, 1.0)


def test_detect_flags_only_the_spike(series):
    hits = detect(series, ["entity"], "hod", "n", threshold=3.0).collect()
    assert len(hits) == 1
    r = hits[0]
    assert (r.entity, r.h) == ("a", "2024-03-05 03:00:00")
    # mad=0 -> eps denominator -> huge score, grade ~ 1
    assert r.score > 1e9 and 0.999 < r.grade < 1.0


def test_grade_shape(spark):
    df = spark.createDataFrame([(1.0,), (3.0,), (6.0,), (30.0,)], "s double")
    out = [r.g for r in df.select(
        anomaly_grade(F.col("s"), 3.0).alias("g")).collect()]
    assert out[0] == 0.0 and out[1] == 0.0          # at/below threshold
    assert out[2] == pytest.approx(0.5)             # 1 - 3/6
    assert out[3] == pytest.approx(0.9)             # 1 - 3/30


def test_score_is_robust_z(spark):
    df = spark.createDataFrame([(16.0, 10.0, 2.0)], "x double, m double, d double")
    s = df.select(anomaly_score(
        F.col("x"), F.col("m"), F.col("d")).alias("s")).collect()[0].s
    assert s == pytest.approx(6.0 / (1.4826 * 2.0), rel=1e-9)
