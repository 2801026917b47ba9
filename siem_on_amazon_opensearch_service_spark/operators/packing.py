"""Training-batch assembly operators: sequence packing, deterministic
sampling, shard assignment — the last mile of a 100 TB training-data
pipeline (corpus → curated docs → packed, sharded training batches).

All deterministic and cross-engine reproducible:

* packing uses a window cumulative sum (no sequential state), the
  standard approximate-greedy: pack_id = floor(cum_before / budget)
  per shard, docs ordered by id. A doc may straddle its pack boundary
  by at most itself (downstream truncation/rollover handles it —
  exact greedy would need per-shard sequential state for a <1%
  packing-efficiency difference).
* sampling thresholds an md5 hex prefix (uniform over 16^4 buckets),
  so Spark, DuckDB and Python agree row-for-row — unlike engine
  `sample()`/`TABLESAMPLE`, which are RNG-implementation-specific.
* shard ids come from the first md5 hex digit(s) via an
  index-in-alphabet trick (``instr``/``strpos``), again engine-neutral.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def pack_sequences(docs: DataFrame, token_col: str, budget: int,
                   shard_col: str | None = None,
                   id_col: str = "doc_id",
                   max_unsharded_rows: int | None = 1_000_000) -> DataFrame:
    """Assign each doc to a pack of ~``budget`` tokens within its
    shard (docs ordered by id — deterministic). Oversize docs
    (tokens > budget) are flagged, not dropped.

    ``shard_col=None`` runs ONE global cumulative-sum window — every
    row through a single task. That is fine for a bounded frame and
    fatal for a corpus, so the unsharded form is guarded by a bounded
    ``limit(N+1).count()`` probe (``max_unsharded_rows``; ``None``
    disables): shard first (:func:`shard_id` or a natural key) at
    scale."""
    keys = [shard_col] if shard_col else []
    if not keys and max_unsharded_rows is not None:
        if docs.limit(max_unsharded_rows + 1).count() > max_unsharded_rows:
            raise ValueError(
                "pack_sequences without shard_col single-partitions "
                f"the corpus through one window task (> "
                f"{max_unsharded_rows} rows); pass shard_col or raise "
                "max_unsharded_rows")
    w = (
        Window.partitionBy(*keys).orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w) - F.col(token_col)  # tokens before me
    return docs.select(
        id_col,
        *(keys),
        F.col(token_col).alias("tokens"),
        F.floor(cum / budget).cast("long").alias("pack_id"),
        (F.col(token_col) > budget).alias("oversize"),
    )


def duckdb_pack_sql(table: str, token_expr: str, budget: int,
                    shard_col: str | None = None,
                    id_col: str = "doc_id") -> str:
    part = f"PARTITION BY {shard_col} " if shard_col else ""
    shard_sel = f"{shard_col}, " if shard_col else ""
    return f"""
    SELECT {id_col}, {shard_sel}tokens,
      floor((cum - tokens) / {budget})::BIGINT AS pack_id,
      tokens > {budget} AS oversize
    FROM (
      SELECT {id_col}, {shard_sel}{token_expr} AS tokens,
        sum({token_expr}) OVER ({part}ORDER BY {id_col}
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM {table})
    """


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------

def hash_sample_pred(key: Column | str, fraction: float,
                     seed: str = "s0") -> Column:
    """Deterministic keep-predicate: md5(seed|key) 4-hex-digit prefix
    below fraction·65536 (row-identical across engines and runs)."""
    c = F.col(key) if isinstance(key, str) else key
    cut = max(0, min(65536, int(round(fraction * 65536))))
    if cut >= 65536:          # keep-all: "10000" would compare wrong
        return F.lit(True)
    if cut <= 0:
        return F.lit(False)
    cut_hex = f"{cut:04x}"
    return F.substring(
        F.md5(F.concat(F.lit(seed + "|"), c.cast("string"))), 1, 4
    ) < F.lit(cut_hex)


def duckdb_hash_sample_sql(key_expr: str, fraction: float,
                           seed: str = "s0") -> str:
    cut = max(0, min(65536, int(round(fraction * 65536))))
    if cut >= 65536:
        return "TRUE"
    if cut <= 0:
        return "FALSE"
    return (
        f"substr(md5('{seed}|' || ({key_expr})::VARCHAR), 1, 4) "
        f"< '{cut:04x}'"
    )


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict[str, float], key_col: str,
                      default: float = 0.0, seed: str = "s0") -> DataFrame:
    """Per-stratum deterministic sampling (the curation move: keep 100%
    of rare languages, downsample the head)."""
    pred = F.lit(False)
    covered = F.lit(False)
    for stratum, frac in fractions.items():
        # null-safe membership: a NULL stratum must fall through to
        # `default` (a plain == makes `covered` NULL and ~covered
        # silently drops the row); a None key targets NULLs directly
        is_s = (F.col(strata_col).isNull() if stratum is None
                else F.col(strata_col).eqNullSafe(F.lit(stratum)))
        pred = F.when(is_s, hash_sample_pred(key_col, frac, seed)).otherwise(pred)
        covered = covered | is_s
    if default > 0:
        pred = F.when(~covered, hash_sample_pred(key_col, default, seed)).otherwise(pred)
    return df.filter(pred)


def mixture_rates(counts: dict[str, int], budget: int,
                  temperature: float = 1.0) -> dict[str, float]:
    """Temperature-weighted mixture rates (the multilingual /
    domain-mixing sampler: p_s ∝ n_s^(1/T), the XLM-R exponent-smoothed
    sampling scheme — T>1 upweights rare sources).  Given per-source
    sizes and a total output budget, rate_s = min(1, p_s·B / n_s):
    without-replacement sampling caps at keeping everything (epoch
    repetition is the packer's job, not the sampler's).

    Pure driver arithmetic over the per-source COUNTS — the rates are
    metadata (a groupBy(source).count() away), never a corpus pass.
    """
    if budget <= 0 or temperature <= 0:
        raise ValueError("budget and temperature must be positive")
    smoothed = {s: n ** (1.0 / temperature)
                for s, n in counts.items() if n > 0}
    # None sorts first (a NULL source is a real stratum in web data);
    # str() keeps every non-None key comparable — `k or ""` turned a
    # falsy non-string key (integer source 0) into "" and then
    # compared strings against ints, a TypeError
    z = sum(smoothed[s] for s in
            sorted(smoothed, key=lambda k: (k is not None, str(k))))
    return {
        s: min(1.0, (smoothed[s] / z) * budget / counts[s])
        for s in smoothed
    }


def mixture_sample(df: DataFrame, source_col: str, key_col: str,
                   budget: int, temperature: float = 1.0,
                   counts: dict[str, int] | None = None,
                   seed: str = "mix") -> DataFrame:
    """Deterministic temperature mixture over sources: ONE small
    groupBy for the per-source counts (skippable by passing ``counts``
    from the catalog), rates folded into per-source literal hash cuts
    (:func:`hash_sample_pred`), one narrow filter pass keeps ~budget
    rows at the smoothed proportions.  Row-identical across runs and
    engines for fixed (seed, key)."""
    if counts is None:
        counts = {
            r["s"]: int(r["n"])
            for r in df.groupBy(F.col(source_col).alias("s"))
            .agg(F.count("*").alias("n")).collect()
        }
    rates = mixture_rates(counts, budget, temperature)
    return stratified_sample(df, source_col, rates, key_col, seed=seed)


# ---------------------------------------------------------------------------
# shard assignment
# ---------------------------------------------------------------------------

def shard_id(key: Column | str, n_shards: int = 16,
             seed: str = "sh") -> Column:
    """Deterministic shard in [0, n_shards): FOUR md5 hex digits (65536
    buckets) mapped via index-in-alphabet (cross-engine). Two digits
    (256 buckets) skewed any n_shards not dividing 256 by up to ~50%
    (e.g. 96 shards: 64 of them get 3/256 of keys, 32 get 2/256) —
    with 65536 buckets the worst-case imbalance is < 0.4% at 256
    shards, honoring write_training_shards' evenly-sized contract."""
    assert 1 <= n_shards <= 65536
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(seed + "|"), c.cast("string")))
    bucket = F.lit(0)
    for i in range(1, 5):
        d = F.instr(F.lit(HEX), F.substring(h, i, 1)) - 1
        bucket = bucket * 16 + d
    return (bucket % n_shards).cast("int")


def duckdb_shard_sql(key_expr: str, n_shards: int = 16,
                     seed: str = "sh") -> str:
    hexpr = f"md5('{seed}|' || ({key_expr})::VARCHAR)"
    digit = (lambda i:
             f"(strpos('{HEX}', substr({hexpr}, {i}, 1)) - 1)")
    return (
        f"((({digit(1)} * 4096 + {digit(2)} * 256 + {digit(3)} * 16"
        f" + {digit(4)})) % {n_shards})::INT"
    )


def write_training_shards(df: DataFrame, path: str, key_col: str,
                          n_shards: int = 16,
                          max_records_per_file: int | None = None) -> None:
    """Physical export: repartition by deterministic shard id and
    write parquet partitioned by shard (each shard a stable, evenly
    sized slice — the training-loader contract)."""
    out = df.withColumn("shard", shard_id(key_col, n_shards))
    writer = out.repartition(n_shards, "shard").write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy("shard").parquet(path)


# ---------------------------------------------------------------------------
# document chunking (sliding token windows)
# ---------------------------------------------------------------------------

def chunk_documents(docs: DataFrame, chunk: int, overlap: int = 0,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Sliding-window chunking: split each document into ``chunk``-
    token windows advancing by ``chunk - overlap`` tokens — the
    context-window assembly step every retrieval / training pipeline
    needs (fixed windows with overlap so no boundary-spanning content
    is lost; the trailing chunk may be shorter).

    Returns (id, chunk_id, start, n_tokens, text_chunk) with 1-based
    token ``start``.  Pure narrow work: tokens derive in place, the
    explode multiplies rows per doc by its chunk count — no shuffle
    at all, so the pass is scan-bound at any corpus size. Zero-token
    docs emit no chunks. Tokenization is the ONE shared analyzer, so
    chunk text re-tokenizes byte-identically downstream."""
    from ..analysis import tokens_sql

    if not 0 <= overlap < chunk:
        raise ValueError(f"need 0 <= overlap < chunk, got "
                         f"overlap={overlap} chunk={chunk}")
    stride = chunk - overlap
    base = (docs.select(F.col(id_col).alias("id"),
                        F.expr(tokens_sql(text_col)).alias("_tk"))
            .withColumn("_n", F.size("_tk"))
            .filter(F.col("_n") > 0))
    # last useful start: a window starting past (_n - chunk + stride)
    # is a strict subset of its predecessor (the predecessor already
    # reaches the end) — cap the start sequence there so overlap > 0
    # never duplicates a fully-covered tail chunk
    last_start = F.greatest(F.lit(1), F.col("_n") - F.lit(chunk - stride))
    ex = base.select(
        "id", "_tk",
        F.explode(F.sequence(F.lit(1), last_start,
                             F.lit(stride))).alias("start"))
    piece = F.slice("_tk", F.col("start"), chunk)
    return ex.select(
        "id",
        ((F.col("start") - 1) / stride).cast("int").alias("chunk_id"),
        "start",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("text_chunk"),
    )


def duckdb_chunk_sql(table: str, chunk: int, overlap: int = 0,
                     text_expr: str = "text",
                     id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`chunk_documents` (same analyzer, same
    window arithmetic)."""
    from ..analysis import duckdb_tokens_sql

    stride = chunk - overlap
    return f"""
    SELECT {id_col} AS id, ((s - 1) // {stride})::INT AS chunk_id,
           s::INT AS start,
           len(list_slice(toks, s, s + {chunk} - 1))::INT AS n_tokens,
           array_to_string(list_slice(toks, s, s + {chunk} - 1), ' ')
             AS text_chunk
    FROM (SELECT {id_col}, {duckdb_tokens_sql(text_expr)} AS toks
          FROM {table}) t,
         unnest(generate_series(
           1, greatest(1, len(toks) - {chunk - stride}), {stride})) AS u(s)
    WHERE len(toks) > 0
    """
