"""Sparse-vector retrieval — the ``rank_features`` field type and the
``neural_sparse`` query (OpenSearch neural sparse search / Lucene
``FeatureField``), re-expressed as a weighted-postings index.

A learned sparse encoder (SPLADE-family) maps a document to a
token -> weight map; retrieval scores a query token -> weight map by
the dot product over shared tokens. Structurally that is EXACTLY the
engine's BM25 problem with the (tf, dl, idf) scoring collapsed into a
stored per-posting weight, so the implementation reuses the proven
plan shape end-to-end (``index/query.py:bm25_topk``):

    parquet scan with ``term IN (query tokens)`` pushed (row-group
    skipping on the term-sorted layout) -> native ``q_w * weight``
    product with the query weights folded into a LITERAL map (no join)
    -> ONE partial+final hash aggregate on doc_id -> TakeOrdered k.

Zero joins, one shuffle, whole-stage codegen throughout; at 100 TB the
scan cost is proportional to the query tokens' posting lists, never
the corpus.

Encoders. The real SPLADE encoder is transformer inference — that
belongs in a ``mapInPandas`` batch seam exactly like the multimodal
decoders (``encode_with_model``; the model itself is not in this
container). For hash-checkable cross-engine tests the default encoder
is the deterministic ``log(1 + tf)`` saturation over the shared
analyzer (``sparse_encode`` — the classical SPLADE-doc / tf-sat
baseline), with a DuckDB twin emitting identical rows. Precomputed
model weights arrive via ``sparse_from_maps`` (a ``map<string,float>``
column, the wire shape of the ``rank_features`` field).

Two-phase search. ``neural_sparse_topk_two_phase`` mirrors the
neural-sparse two-phase processor (OpenSearch 2.15): phase one scores
only the high-weight query tokens (``q_w >= prune_ratio * max q_w``)
and keeps an expanded candidate list; phase two rescores ONLY those
candidates with the full token set (candidate ids are k-scaled
metadata, broadcast into the second scan's semi-join). Returned
scores are exact; like upstream, the cut is approximate — a true
top-k doc is missed only if it scores into the top purely through
low-weight tokens.

Reference anchor: the SIEM reference ships OpenSearch index templates
and dashboards over `type: text` fields (deploy_es/data.ini) and
leaves vector/sparse features to the OpenSearch neural plugins; this
module supplies that plugin surface engine-side.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis import duckdb_tokens_sql, tokens_col

#: features table schema — the sparse analog of POSTINGS_SCHEMA.
FEATURES_SCHEMA = "term string, doc_id long, weight double"


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------


def sparse_encode(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic sparse encoding: weight = ln(1 + tf) per
    (doc, token) over the shared analyzer. Native expressions only
    (explode + one groupBy whose key includes doc_id, so hot terms
    cannot skew the shuffle); the classical saturated-tf baseline the
    SPLADE papers regularize toward."""
    tok = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("term"),
    )
    return (
        tok.groupBy("term", "doc_id")
        .agg(F.log1p(F.count("*").cast("double")).alias("weight"))
    )


def sparse_encode_duckdb_sql(table: str = "documents",
                             text_expr: str = "text",
                             id_expr: str = "doc_id") -> str:
    """DuckDB twin of :func:`sparse_encode` (identical rows)."""
    return f"""
    SELECT term, doc_id, ln(1 + count(*)::DOUBLE) AS weight FROM (
      SELECT {id_expr}::BIGINT AS doc_id,
             unnest({duckdb_tokens_sql(text_expr)}) AS term
      FROM {table}
    ) tok GROUP BY term, doc_id
    """


def sparse_from_maps(docs: DataFrame, map_col: str,
                     id_col: str = "doc_id") -> DataFrame:
    """Features from a precomputed ``map<string,float>`` column (the
    ``rank_features`` wire shape / an offline model-inference pass):
    one explode, zero Python. Non-positive weights are dropped —
    Lucene's FeatureField stores strictly positive values."""
    rows = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.col(map_col)).alias("term", "weight"),
    )
    return (rows.filter(F.col("weight") > 0)
            .select("term", "doc_id", F.col("weight").cast("double")))


def encode_with_model(docs: DataFrame, batch_fn, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Model-inference seam: ``batch_fn(pandas.Series of text) ->
    list[dict[str, float]]`` runs Arrow-batched inside ``mapInPandas``
    (one model load per executor batch stream, never per row). The
    actual SPLADE checkpoint is not in this container — callers pass
    the loaded model's encode; tests pass a deterministic fake."""
    cols = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       F.col(text_col).alias("_text"))

    def run(batches):
        import pandas as pd

        for b in batches:
            if b.empty:
                continue
            maps = batch_fn(b["_text"])
            out_id, out_t, out_w = [], [], []
            for did, m in zip(b["doc_id"], maps):
                for t, w in m.items():
                    if w > 0:
                        out_id.append(did)
                        out_t.append(t)
                        out_w.append(float(w))
            yield pd.DataFrame(
                {"term": out_t, "doc_id": out_id, "weight": out_w})

    return cols.mapInPandas(run, schema=FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# index handle
# ---------------------------------------------------------------------------


@dataclass
class SparseIndex:
    """Weighted-postings index over one ``rank_features`` field."""

    features: DataFrame    # FEATURES_SCHEMA, term-sorted layout on disk
    stats: DataFrame       # term, df, max_weight (pruning metadata)
    n_docs: int
    field: str = "sparse_embedding"

    def save(self, spark: SparkSession, path: str,
             buckets: int = 32) -> None:
        """Persist laid out for term-pruned scans — repartition by
        term + sortWithinPartitions(term) gives parquet min/max
        row-group statistics the pushed ``term IN`` predicate skips
        on, the same layout contract as PostingsIndex.save."""
        (self.features.repartition(buckets, "term")
         .sortWithinPartitions("term", "doc_id")
         .write.mode("overwrite").parquet(f"{path}/features"))
        self.stats.write.mode("overwrite").parquet(f"{path}/stats")
        spark.createDataFrame(
            [(self.n_docs, self.field)], "n_docs long, field string"
        ).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SparseIndex":
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        return cls(
            features=spark.read.parquet(f"{path}/features"),
            stats=spark.read.parquet(f"{path}/stats"),
            n_docs=int(meta["n_docs"]), field=str(meta["field"]),
        )


def build_sparse_index(features: DataFrame, n_docs: int | None = None,
                       field: str = "sparse_embedding") -> SparseIndex:
    """Features -> handle; stats is one aggregation producing
    vocabulary-sized metadata (df + max_weight per term — the
    block-max analog the two-phase cut and future WAND pruning read)."""
    stats = features.groupBy("term").agg(
        F.count("*").alias("df"),
        F.max("weight").alias("max_weight"),
    )
    if n_docs is None:
        n_docs = features.select("doc_id").distinct().count()
    return SparseIndex(features=features, stats=stats,
                       n_docs=int(n_docs), field=field)


# ---------------------------------------------------------------------------
# query
# ---------------------------------------------------------------------------


def _weight_map(query_tokens: dict[str, float]) -> Column:
    pairs: list[Column] = []
    for t, w in query_tokens.items():
        pairs.extend([F.lit(t), F.lit(float(w))])
    return F.create_map(*pairs)


def neural_sparse_scores(sx: SparseIndex,
                         query_tokens: dict[str, float]) -> DataFrame:
    """(doc_id, score) for EVERY matching doc: score = sum over shared
    tokens of q_w * stored weight. One pushed scan, query weights as a
    literal map (no join), one hash aggregate."""
    spark = sx.features.sparkSession
    toks = {t: float(w) for t, w in query_tokens.items() if w > 0}
    if not toks:
        return spark.createDataFrame([], "doc_id long, score double")
    hits = sx.features.filter(F.col("term").isin(list(toks)))
    contrib = _weight_map(toks)[F.col("term")] * F.col("weight")
    return (hits.groupBy("doc_id")
            .agg(F.sum(contrib).alias("score")))


def neural_sparse_topk(sx: SparseIndex, query_tokens: dict[str, float],
                       k: int = 10) -> DataFrame:
    """Exhaustive top-k (exact): scores + TakeOrderedAndProject with
    the engine-wide (score desc, doc_id asc) tie rule."""
    return (neural_sparse_scores(sx, query_tokens)
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def neural_sparse_topk_two_phase(
    sx: SparseIndex, query_tokens: dict[str, float], k: int = 10,
    prune_ratio: float = 0.4, expand: int = 5,
) -> DataFrame:
    """Two-phase neural sparse search (the 2.15 search-pipeline
    processor): phase one ranks with only the high-weight query tokens
    and keeps ``k * expand`` candidates; phase two rescores exactly
    those candidates with ALL tokens. The candidate id list is
    k-scaled driver metadata, so the second scan is the ordinary
    pushed term scan plus a literal ``doc_id IN`` — no shuffle join.
    Degenerate prune (no token below the bar) collapses to the
    exhaustive plan."""
    toks = {t: float(w) for t, w in query_tokens.items() if w > 0}
    if not toks:
        return neural_sparse_topk(sx, toks, k)
    bar = prune_ratio * max(toks.values())
    hi = {t: w for t, w in toks.items() if w >= bar}
    if len(hi) == len(toks):
        return neural_sparse_topk(sx, toks, k)
    cand = [
        int(r["doc_id"])
        for r in neural_sparse_topk(sx, hi, k * expand).collect()
    ]
    if not cand:
        return neural_sparse_topk(sx, toks, k)
    hits = sx.features.filter(
        F.col("term").isin(list(toks)) & F.col("doc_id").isin(cand))
    contrib = _weight_map(toks)[F.col("term")] * F.col("weight")
    return (hits.groupBy("doc_id").agg(F.sum(contrib).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


#: cost-based dispatch bound, mirroring plans/pruning.py: below this
#: many candidate feature rows (sum of query-term dfs) the θ job costs
#: more than the scan it saves — run the single-job exhaustive plan.
PRUNE_MIN_ROWS = 100_000


def neural_sparse_topk_pruned(
    sx: SparseIndex, query_tokens: dict[str, float], k: int = 10,
    min_rows: int | None = None, stats_out: dict | None = None,
) -> DataFrame:
    """MaxScore-pruned sparse top-k — rank-identical to
    :func:`neural_sparse_topk` (Turtle & Flood 1995, the same
    distributed-exact restatement as ``plans/pruning.py`` for BM25,
    with the saturation bound collapsed to the stored weight):

    1. θ = the k-th best single-term score of the highest-upper-bound
       token (``UB_t = q_w · max_weight_t`` from the stats table —
       driver metadata, no corpus pass);
    2. the maximal low-UB token suffix with ``Σ UB < θ`` is
       non-essential: a doc matching ONLY those tokens scores < θ and
       can never reach the top-k;
    3. essential tokens scan as usual; non-essential rows join the
       essential candidate set (contribution restriction, AQE picks
       the join strategy) so every surviving doc's score stays exact.

    Learned sparse expansions are long and Zipf-tailed (SPLADE emits
    hundreds of low-weight tokens per query) — exactly the regime
    where the non-essential tail dominates posting volume. Pass
    ``stats_out={}`` to receive ``{"theta", "essential"}`` and force
    the pruned plan regardless of size."""
    toks = {t: float(w) for t, w in query_tokens.items() if w > 0}
    spark = sx.features.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not toks:
        return empty
    rows = sx.stats.filter(F.col("term").isin(list(toks))).collect()
    if not rows:
        return empty
    if min_rows is None:
        min_rows = PRUNE_MIN_ROWS
    if stats_out is None and \
            sum(int(r["df"]) for r in rows) < min_rows:
        return neural_sparse_topk(sx, toks, k)
    ub = {r["term"]: toks[r["term"]] * float(r["max_weight"])
          for r in rows}
    present = list(ub)

    # θ: k-th best single-token score of the best token (exact lower
    # bound on the final k-th best total — all contributions are > 0)
    best = max(present, key=lambda t: ub[t])
    best_scores = (
        sx.features.filter(F.col("term") == best)
        .select((F.lit(toks[best]) * F.col("weight")).alias("_s"))
        .orderBy(F.desc("_s")).limit(k).collect()
    )
    theta = float(best_scores[-1]["_s"]) if len(best_scores) >= k \
        else 0.0

    nonessential: list[str] = []
    acc = 0.0
    for t in sorted(present, key=lambda t: ub[t]):
        if acc + ub[t] < theta and len(nonessential) < len(present) - 1:
            acc += ub[t]
            nonessential.append(t)
        else:
            break
    essential = [t for t in present if t not in nonessential]
    if stats_out is not None:
        stats_out["theta"] = theta
        stats_out["essential"] = list(essential)

    contrib = _weight_map(toks)[F.col("term")] * F.col("weight")
    ess = sx.features.filter(F.col("term").isin(essential))
    if nonessential:
        cand = ess.select("doc_id").distinct()
        non = (sx.features.filter(F.col("term").isin(nonessential))
               .join(cand, "doc_id"))
        hits = ess.unionByName(non)
    else:
        hits = ess
    return (hits.groupBy("doc_id").agg(F.sum(contrib).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


# ---------------------------------------------------------------------------
# rank_features map-field scoring
# ---------------------------------------------------------------------------


def rank_feature_value(map_col: Column | str, key: str,
                       fn: str = "saturation", *, pivot: float = 1.0,
                       scaling_factor: float = 1.0,
                       exponent: float = 1.0) -> Column:
    """``rank_feature`` query over a ``rank_features`` MAP field
    (``{"rank_feature": {"field": "features.<key>"}}``): the three
    Lucene FeatureField score functions over ``element_at(map, key)``,
    missing/non-positive keys scoring 0 — one native expression,
    composable as a should-clause boost exactly like the scalar
    rank_feature path (``querystring._func_value``)."""
    m = F.col(map_col) if isinstance(map_col, str) else map_col
    v = F.coalesce(F.element_at(m, F.lit(key)).cast("double"), F.lit(0.0))
    if fn == "saturation":
        s = v / (v + F.lit(float(pivot)))
    elif fn == "log":
        s = F.log(F.lit(float(scaling_factor)) + v)
    elif fn == "sigmoid":
        e = float(exponent)
        s = F.pow(v, e) / (F.pow(v, e) + F.lit(float(pivot) ** e))
    else:
        raise ValueError(f"unsupported rank_feature function {fn!r}")
    return F.when(v > 0, s).otherwise(F.lit(0.0))


def load_or_build(spark: SparkSession, docs: DataFrame, path: str,
                  text_col: str = "text", id_col: str = "doc_id",
                  field: str = "sparse_embedding",
                  buckets: int = 32) -> SparseIndex:
    """Materialize-once helper: encode + build + save on first call,
    load the term-sorted layout afterwards (queries against the lazy
    encode DAG would re-run it per action)."""
    if not os.path.isdir(os.path.join(path, "meta")):
        feats = sparse_encode(docs, text_col, id_col)
        sx = build_sparse_index(feats, n_docs=docs.count(), field=field)
        sx.save(spark, path, buckets=buckets)
    return SparseIndex.load(spark, path)
