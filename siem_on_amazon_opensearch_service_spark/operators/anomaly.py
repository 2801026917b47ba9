"""Anomaly detection over aggregation buckets — the OpenSearch
Anomaly Detection plugin surface (the SIEM stack's dashboards feed AD
detectors over date_histogram buckets; high-cardinality AD runs one
model per entity value, e.g. per event.type or per user).

The plugin's model is a Random Cut Forest — streaming, randomized,
and not reproducible across engines. What this module reproduces is
the detector CONTRACT (per-entity seasonal baseline -> anomaly
*score* -> bounded anomaly *grade* in [0,1] -> alertable buckets)
with a deterministic, distribution-robust estimator instead: the
seasonal median / MAD detector (median of the same season slot's
history; scaled MAD as the robust sigma; score = |x - med| / sigma).
Deterministic means every row is value-hash-checkable against the
DuckDB oracle — the property this repo's correctness gate needs and a
forest can't give.

Scale posture: inputs are REDUCED buckets (hours × entities — already
metadata-sized relative to the raw corpus), so both passes here are
aggregations over tiny tables; the baseline table (entities × season
slots) broadcasts. Raw data is touched zero times. At 100 TB the cost
lives entirely in the upstream date_histogram, which is the engine's
bread-and-butter partial+final hash agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: consistency constant making MAD estimate sigma under normality.
MAD_SIGMA = 1.4826


def seasonal_mad_baseline(buckets: DataFrame, entity_cols: list[str],
                          season_col: str, value_col: str) -> DataFrame:
    """Per (entity, season-slot) robust baseline: exact interpolated
    median and MAD (median of |x - median|) of the bucket values.
    Two aggregation passes over the bucket list plus one broadcast
    join — all metadata-sized."""
    keys = [*entity_cols, season_col]
    med = buckets.groupBy(*keys).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med"))
    return (
        buckets.join(F.broadcast(med), keys)
        .groupBy(*keys)
        .agg(
            F.first("med").alias("med"),
            F.expr(f"percentile(abs({value_col} - med), 0.5)").alias("mad"),
        )
    )


def anomaly_score(value: Column, med: Column, mad: Column) -> Column:
    """Robust z-score: |x - med| / (1.4826 * MAD + eps). The eps keeps
    constant series finite (score 0 for x == med)."""
    return F.abs(value - med) / (F.lit(MAD_SIGMA) * mad + F.lit(1e-9))


def anomaly_grade(score: Column, threshold: float = 3.0) -> Column:
    """Map a score to the plugin's [0,1) anomaly grade: 0 at or below
    the threshold, asymptotically 1 as the score grows
    (grade = 1 - threshold/score)."""
    return F.when(score > F.lit(threshold),
                  F.lit(1.0) - F.lit(threshold) / score).otherwise(F.lit(0.0))


def detect(buckets: DataFrame, entity_cols: list[str], season_col: str,
           value_col: str, threshold: float = 3.0) -> DataFrame:
    """End-to-end detector over a bucket table: returns the buckets
    whose anomaly grade is positive, with ``score`` and ``grade``
    columns attached (one row per alertable bucket — what a scheduled
    AD monitor would page on)."""
    keys = [*entity_cols, season_col]
    base = seasonal_mad_baseline(buckets, entity_cols, season_col,
                                 value_col)
    scored = buckets.join(F.broadcast(base), keys).withColumn(
        "score", anomaly_score(F.col(value_col), F.col("med"),
                               F.col("mad")))
    return (
        scored.withColumn("grade", anomaly_grade(F.col("score"), threshold))
        .filter(F.col("grade") > 0)
    )
