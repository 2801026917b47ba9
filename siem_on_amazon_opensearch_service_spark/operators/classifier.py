"""Linear quality classifier over hashed n-gram features.

The standard web-corpus curation move (CCNet, Wenzek et al. 2019;
fineweb-edu): train a cheap linear classifier on labeled examples
("good" vs "bad" pages) and score every document at scale, keeping the
high-scoring tail. The production scorer is a fastText-style linear
model; here the weights come from the closed-form Naive Bayes log-odds
fit — deterministic, one aggregation pass, and exactly expressible in
SQL so the DuckDB oracle can replay the whole fit+score pipeline:

    w_b   = log((c1_b + a) / (T1 + aB)) - log((c0_b + a) / (T0 + aB))
    bias  = log(n1 / n0)
    score(x) = bias + sum_b cnt_b(x) * w_b        (logit; sigmoid>0.5
                                                   <=> logit>0)

where ``c{k}_b`` is the class-k count of hashed bucket ``b``, ``T_k``
the class-k gram total, ``B`` the bucket count, ``n_k`` the class doc
count, and ``a`` the Laplace smoothing. Buckets never seen in training
fall back to ``w_default = log((T0+aB)/(T1+aB))`` (the same formula
with c=0 on both sides).

Spark shape: featurization reuses the DSIR hashed unigram+bigram pass
(one explode + map-side-combinable groupBy); the fit collapses to
``n_buckets`` rows plus four scalars (driver metadata — the "model" is
a broadcastable table, the apply-at-100-TB contract); scoring is ONE
broadcast join vs the weight table and one groupBy(doc). No Python in
any hot path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import (
    N_BUCKETS, duckdb_bucket_counts_sql, ngram_bucket_counts,
)

ALPHA = 1.0


@dataclass
class NBModel:
    """Fitted classifier: bucket weights (<= n_buckets rows) + the
    scalars every scorer needs. ``weights`` is metadata-sized by
    construction — broadcast it."""
    weights: DataFrame          # (bucket, w)
    default_w: float            # weight of a bucket unseen in training
    bias: float                 # log(n1 / n0)
    n_buckets: int


def nb_fit(docs: DataFrame, label_col: str = "label",
           text_col: str = "text", id_col: str = "doc_id",
           n_buckets: int = N_BUCKETS, alpha: float = ALPHA) -> NBModel:
    """Closed-form NB log-odds fit on labeled docs (label 1 = keep)."""
    labels = docs.select(F.col(id_col).alias("id"),
                         F.col(label_col).cast("int").alias("y"))
    counts = ngram_bucket_counts(docs, text_col=text_col, id_col=id_col,
                                 n_buckets=n_buckets)
    joined = counts.join(labels, "id")
    tot = joined.agg(
        F.sum(F.when(F.col("y") == 1, F.col("cnt"))).alias("t1"),
        F.sum(F.when(F.col("y") == 0, F.col("cnt"))).alias("t0"),
    ).collect()[0]
    nrow = labels.agg(
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("n0"),
    ).collect()[0]
    t1, t0 = float(tot["t1"] or 0), float(tot["t0"] or 0)
    d1, d0 = t1 + alpha * n_buckets, t0 + alpha * n_buckets
    per = joined.groupBy("bucket").agg(
        F.coalesce(F.sum(F.when(F.col("y") == 1, F.col("cnt"))),
                   F.lit(0)).alias("c1"),
        F.coalesce(F.sum(F.when(F.col("y") == 0, F.col("cnt"))),
                   F.lit(0)).alias("c0"),
    )
    w = (F.log(F.col("c1") + alpha) - F.lit(math.log(d1))
         - F.log(F.col("c0") + alpha) + F.lit(math.log(d0)))
    # the model IS driver metadata (<= n_buckets rows by design):
    # materialize it so scoring plans carry no fit lineage (otherwise
    # the fit's counts-x-labels join rides into every score job)
    rows = per.select("bucket", w.alias("w")).collect()
    spark = docs.sparkSession
    weights = spark.createDataFrame(
        [(int(r["bucket"]), float(r["w"])) for r in rows],
        "bucket long, w double")
    return NBModel(
        weights=weights,
        default_w=math.log(alpha) - math.log(d1)
        - math.log(alpha) + math.log(d0),
        bias=math.log(float(nrow["n1"])) - math.log(float(nrow["n0"])),
        n_buckets=n_buckets,
    )


def nb_score(docs: DataFrame, model: NBModel, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Per-doc logit + keep decision: ``(id, logit, keep)``. One
    broadcast join against the weight table, one groupBy(doc); docs
    with zero grams ride an ``explode_outer`` sentinel and score
    exactly ``bias`` — NO corpus-side re-join (the naive
    docs-left-join-scores shape is a second full shuffle of the
    corpus at 100 TB)."""
    counts = ngram_bucket_counts(docs, text_col=text_col, id_col=id_col,
                                 n_buckets=model.n_buckets,
                                 keep_empty=True)
    # order-independent scoring sum (same rationale as
    # dsir_logweights): quantize the per-bucket log-odds to exact
    # pico-units with the bitwise-deterministic floor form, sum in
    # INTEGER space, divide once — a doc touches hundreds of buckets
    # and a double sum's partial-merge order would leak into the last
    # ulp of the gated logit.
    wq = F.floor(
        F.coalesce(F.col("w"), F.lit(model.default_w)) * F.lit(1e12)
        + F.lit(0.5))
    return (
        counts.join(F.broadcast(model.weights), "bucket", "left")
        .groupBy("id")
        .agg((F.coalesce(F.sum(F.col("cnt") * wq) / F.lit(1e12),
                         F.lit(0.0))
              + F.lit(model.bias)).alias("logit"))
        .withColumn("keep", F.col("logit") > 0)
    )


def duckdb_nb_sql(train_where: str, alpha: float = ALPHA,
                  n_buckets: int = N_BUCKETS, table: str = "documents",
                  label_expr: str = "CASE WHEN lang = 'en' THEN 1 "
                                    "ELSE 0 END") -> str:
    """DuckDB twin of fit-on-train + score-everything: yields
    ``(id, logit, keep)`` for every doc in ``table``."""
    counts = duckdb_bucket_counts_sql(table=table, n_buckets=n_buckets)
    return f"""
    WITH cnts AS ({counts}),
    lab AS (
      SELECT doc_id AS id, ({label_expr}) AS y FROM {table}
      WHERE {train_where}
    ),
    j AS (SELECT c.id, c.bucket, c.cnt, lab.y
          FROM cnts c JOIN lab USING (id)),
    tot AS (
      SELECT sum(CASE WHEN y = 1 THEN cnt END)::DOUBLE AS t1,
             sum(CASE WHEN y = 0 THEN cnt END)::DOUBLE AS t0
      FROM j),
    nn AS (
      SELECT sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)::DOUBLE AS n1,
             sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)::DOUBLE AS n0
      FROM lab),
    wts AS (
      SELECT bucket,
             ln(coalesce(sum(CASE WHEN y = 1 THEN cnt END), 0) + {alpha})
               - ln((SELECT t1 FROM tot) + {alpha} * {n_buckets})
               - ln(coalesce(sum(CASE WHEN y = 0 THEN cnt END), 0)
                    + {alpha})
               + ln((SELECT t0 FROM tot) + {alpha} * {n_buckets}) AS w
      FROM j GROUP BY bucket),
    dflt AS (
      SELECT ln({alpha}) - ln(t1 + {alpha} * {n_buckets})
             - ln({alpha}) + ln(t0 + {alpha} * {n_buckets}) AS w
      FROM tot),
    s AS (
      -- exact integer-quantized sum (see nb_score): floor pico-unit
      -- quantization, order-independent integer summation
      SELECT c.id,
             sum(c.cnt * floor(coalesce(wts.w, (SELECT w FROM dflt))
                               * 1e12 + 5e-1)::BIGINT) / 1e12 AS s
      FROM cnts c LEFT JOIN wts USING (bucket)
      GROUP BY c.id)
    SELECT d.doc_id AS id,
           coalesce(s.s, 0) + ln((SELECT n1 FROM nn))
             - ln((SELECT n0 FROM nn)) AS logit,
           (coalesce(s.s, 0) + ln((SELECT n1 FROM nn))
             - ln((SELECT n0 FROM nn))) > 0 AS keep
    FROM {table} d LEFT JOIN s ON s.id = d.doc_id
    """
