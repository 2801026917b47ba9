"""DSIR: Data Selection with Importance Resampling.

Public algorithm (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling", arXiv:2302.03169): select raw
web-corpus examples that look like a target distribution by

1. featurizing every document as a HASHED bag of n-grams (unigrams +
   bigrams hashed into ``n_buckets`` buckets),
2. fitting smoothed bag-of-words multinomials on the target set
   (``p``) and the raw set (``q``),
3. scoring each raw example with the log importance weight
   ``log w(x) = sum_b c_b(x) * (log p_b - log q_b)``,
4. sampling without replacement proportionally to ``w`` — the Gumbel
   top-k trick, with the Gumbel noise derived DETERMINISTICALLY from
   the doc id (md5 -> uniform -> -ln(-ln(u))), so the selection is a
   pure function of the data and reproducible across engines.

Spark shape: the featurize pass is one explode + groupBy(doc,bucket)
(map-side combinable); both model fits aggregate to ``n_buckets``
rows (driver-size metadata, default 10k — broadcast); the scoring
join is a broadcast hash join against the log-ratio table followed by
ONE groupBy(doc); selection is TakeOrderedAndProject. Nothing touches
Python rows.

The md5->int64 hashing convention matches the dedup module
(``F.conv(substr(md5, 1, 8), 16, 10)`` == DuckDB
``('0x' || substr(md5, 1, 8))::BIGINT``) so the DuckDB twin is
bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..analysis import duckdb_tokens_sql, tokens_col
from ..detfloat import round_det, round_det_sql

N_BUCKETS = 10_000
ALPHA = 1.0  # Laplace smoothing


def _md5_32(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def ngram_bucket_counts(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        n_buckets: int = N_BUCKETS,
                        keep_empty: bool = False) -> DataFrame:
    """(id, bucket, cnt): hashed unigram+bigram counts per doc.
    One tokenize pass; bigrams assemble natively from the token array
    (zip_with of the array with itself shifted by one).

    ``keep_empty``: emit a ``(id, bucket NULL, cnt 0)`` sentinel row
    for zero-gram docs (``explode_outer``, the same trick the index
    build uses for exact n_docs) so a downstream per-doc aggregate
    covers EVERY doc without re-joining the corpus."""
    toks = tokens_col(text_col)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(toks, bigrams)
    explode = F.explode_outer if keep_empty else F.explode
    exploded = docs.select(
        F.col(id_col).alias("id"), explode(grams).alias("g")
    ).select(
        "id",
        F.when(F.col("g").isNotNull(),
               _md5_32(F.col("g")) % n_buckets).alias("bucket"),
        F.col("g"),
    )
    return exploded.groupBy("id", "bucket").agg(
        F.count("g").alias("cnt"))


def duckdb_bucket_counts_sql(table: str = "documents",
                             text_expr: str = "text",
                             id_col: str = "doc_id",
                             n_buckets: int = N_BUCKETS) -> str:
    toks = duckdb_tokens_sql(text_expr)
    return f"""
    SELECT id, ('0x' || substr(md5(g), 1, 8))::BIGINT % {n_buckets}
             AS bucket,
           count(*) AS cnt
    FROM (
      SELECT {id_col} AS id, unnest(
        list_concat(t, [t[i] || ' ' || t[i+1]
                        FOR i IN range(1, len(t))])) AS g
      FROM (SELECT {id_col}, {toks} AS t FROM {table})
    ) GROUP BY 1, 2
    """


def fit_bow_logprobs(counts: DataFrame, n_buckets: int = N_BUCKETS,
                     alpha: float = ALPHA) -> DataFrame:
    """(bucket, logp): smoothed multinomial over OBSERVED buckets.
    Unobserved buckets share the same smoothed floor
    ``log(alpha / (total + alpha * B))`` — the caller folds that
    constant in (log_ratio_table does)."""
    tot = counts.agg(F.sum("cnt").alias("t")).collect()[0]["t"] or 0
    denom = float(tot) + alpha * n_buckets
    return counts.groupBy("bucket").agg(
        F.log((F.sum("cnt") + F.lit(alpha)) / F.lit(denom)).alias("logp")
    )


def log_ratio_table(target_counts: DataFrame, raw_counts: DataFrame,
                    n_buckets: int = N_BUCKETS,
                    alpha: float = ALPHA) -> DataFrame:
    """(bucket, logr): log p_target(b) - log q_raw(b) for every
    OBSERVED bucket (in either model); buckets observed in neither
    can never be counted by a document scored against the raw model,
    because scoring only touches buckets the doc itself contains —
    and a doc's buckets are raw-observed by construction when the doc
    is part of the raw fit. n_buckets rows max: driver metadata."""
    import math

    t_tot = target_counts.agg(F.sum("cnt")).collect()[0][0] or 0
    r_tot = raw_counts.agg(F.sum("cnt")).collect()[0][0] or 0
    t_floor = math.log(alpha / (float(t_tot) + alpha * n_buckets))
    r_floor = math.log(alpha / (float(r_tot) + alpha * n_buckets))
    tp = fit_bow_logprobs(target_counts, n_buckets, alpha)
    rp = fit_bow_logprobs(raw_counts, n_buckets, alpha)
    return (
        tp.withColumnRenamed("logp", "lt")
        .join(rp.withColumnRenamed("logp", "lr"), "bucket", "full")
        .select(
            "bucket",
            (F.coalesce(F.col("lt"), F.lit(t_floor))
             - F.coalesce(F.col("lr"), F.lit(r_floor))).alias("logr"),
        )
    )


def dsir_logweights(raw_docs: DataFrame, target_docs: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    n_buckets: int = N_BUCKETS,
                    alpha: float = ALPHA) -> DataFrame:
    """(id, logw) for every raw doc: one featurize pass per side, a
    broadcast join against the <=n_buckets-row log-ratio table, one
    groupBy(doc)."""
    raw_counts = ngram_bucket_counts(raw_docs, text_col, id_col, n_buckets)
    tgt_counts = ngram_bucket_counts(target_docs, text_col, id_col,
                                     n_buckets)
    ratios = log_ratio_table(
        tgt_counts.groupBy("bucket").agg(F.sum("cnt").alias("cnt")),
        raw_counts.groupBy("bucket").agg(F.sum("cnt").alias("cnt")),
        n_buckets, alpha,
    )
    # Order-independent scoring sum: a doc touches hundreds of
    # buckets, and sum(cnt * logr) over DOUBLES would depend on the
    # partial-merge order at the last ulp (the class detfloat killed
    # elsewhere). Quantize logr to exact pico-units via the bitwise-
    # deterministic floor form (same op sequence in the DuckDB twin),
    # sum in INTEGER space (exact, associative), divide once at the
    # end. Headroom: |logr| <= ~40 -> |li| <= 4e13; cnt * li summed
    # over a doc's buckets stays far under 2^63 for any real doc.
    li = F.floor(F.col("logr") * F.lit(1e12) + F.lit(0.5))
    return (
        raw_counts.join(F.broadcast(ratios), "bucket")
        .groupBy("id")
        .agg((F.sum(F.col("cnt") * li) / F.lit(1e12)).alias("logw"))
    )


def gumbel_col(id_col: Column, salt: str = "dsir") -> Column:
    """Deterministic Gumbel(0,1) noise from the doc id: md5 -> 32-bit
    uniform in (0,1) -> -ln(-ln(u)). Same derivation in DuckDB."""
    u = (_md5_32(F.concat(id_col.cast("string"), F.lit(salt)))
         .cast("double") + F.lit(1.0)) / F.lit(float((1 << 32) + 1))
    return -F.log(-F.log(u))


def dsir_sample(raw_docs: DataFrame, target_docs: DataFrame, k: int,
                text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = N_BUCKETS, alpha: float = ALPHA,
                salt: str = "dsir") -> DataFrame:
    """Importance-resample k raw docs WITHOUT replacement: Gumbel
    top-k on logw + g_i (equivalent to sampling proportional to w;
    public trick) — TakeOrderedAndProject, deterministic via the
    hashed noise."""
    w = dsir_logweights(raw_docs, target_docs, text_col, id_col,
                        n_buckets, alpha)
    keyed = w.withColumn("key", F.col("logw") + gumbel_col(F.col("id"),
                                                           salt))
    return (
        keyed.orderBy(F.desc("key"), F.asc("id")).limit(k)
        .select("id", round_det("logw", 6).alias("logw"))
    )


def duckdb_dsir_sql(raw_where: str, target_where: str, k: int,
                    table: str = "documents", text_expr: str = "text",
                    id_col: str = "doc_id",
                    n_buckets: int = N_BUCKETS, alpha: float = ALPHA,
                    salt: str = "dsir") -> str:
    """The full DSIR selection as one DuckDB statement (oracle)."""
    bc = duckdb_bucket_counts_sql(
        f"(SELECT * FROM {table} WHERE {{w}})", text_expr, id_col,
        n_buckets)
    return f"""
    WITH raw_bc AS ({bc.format(w=raw_where)}),
    tgt_bc AS ({bc.format(w=target_where)}),
    raw_tot AS (SELECT sum(cnt)::DOUBLE AS t FROM raw_bc),
    tgt_tot AS (SELECT sum(cnt)::DOUBLE AS t FROM tgt_bc),
    rp AS (SELECT bucket, ln((sum(cnt) + {alpha})
                  / ((SELECT t FROM raw_tot) + {alpha} * {n_buckets}))
                  AS lr
           FROM raw_bc GROUP BY bucket),
    tp AS (SELECT bucket, ln((sum(cnt) + {alpha})
                  / ((SELECT t FROM tgt_tot) + {alpha} * {n_buckets}))
                  AS lt
           FROM tgt_bc GROUP BY bucket),
    ratios AS (
      SELECT coalesce(rp.bucket, tp.bucket) AS bucket,
        coalesce(tp.lt, ln({alpha} / ((SELECT t FROM tgt_tot)
                                      + {alpha} * {n_buckets})))
        - coalesce(rp.lr, ln({alpha} / ((SELECT t FROM raw_tot)
                                        + {alpha} * {n_buckets})))
        AS logr
      FROM rp FULL JOIN tp ON rp.bucket = tp.bucket
    ),
    w AS (
      -- exact integer-quantized sum (see dsir_logweights): floor
      -- pico-unit quantization is bitwise identical cross-engine,
      -- integer summation is order-independent
      SELECT id,
             sum(cnt * floor(logr * 1e12 + 5e-1)::BIGINT) / 1e12 AS logw
      FROM raw_bc JOIN ratios USING (bucket) GROUP BY id
    ),
    keyed AS (
      SELECT id, logw,
        logw - ln(-ln((('0x' || substr(md5(id::VARCHAR || '{salt}'),
                                       1, 8))::BIGINT::DOUBLE + 1.0)
                      / {float((1 << 32) + 1)!r})) AS key
      FROM w
    )
    SELECT id, {round_det_sql('logw', 6)} AS logw
    FROM keyed ORDER BY key DESC, id LIMIT {k}
    """
