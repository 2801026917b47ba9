"""Hybrid retrieval: BM25 + vector similarity fused by Reciprocal
Rank Fusion (RRF).

Parity target: OpenSearch 2.x hybrid / neural search -- a `hybrid`
query runs a lexical (BM25) sub-query and a k-NN sub-query and fuses
the result lists; the default fusion is RRF (Cormack, Clarke &
Buettcher, SIGIR 2009):

    rrf(d) = sum_lists 1 / (rank_const + rank_list(d))

with rank_const = 60 by convention. Rank-based fusion needs no score
normalization across heterogeneous scales (BM25 vs cosine), which is
exactly why the engines use it.

Spark shape: both sub-queries are existing engine paths (bm25_scores
over the postings index; cosine over the embeddings table); each side
keeps only its top ``depth`` candidates (TakeOrdered -- fusion only
ever sees two metadata-sized lists, so ranks + fusion run on
broadcast-sized data regardless of corpus size). Ties inside a list
break by ascending id, the engine-wide rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.build import PostingsIndex
from ..index.query import bm25_scores
from .similarity import cosine_topk

RRF_K = 60


def _ranked(df: DataFrame, id_col: str, score_col: str) -> DataFrame:
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.row_number().over(w).alias("rank"),
    )


def rrf_fuse(lists: list[DataFrame], k: int = 10,
             rank_const: int = RRF_K) -> DataFrame:
    """Fuse (doc_id, rank) lists by RRF; returns (doc_id, rrf_score)
    top-k. Input lists are top-``depth`` cuts, so this is driver-light
    metadata work expressed as DataFrames for composability."""
    tagged = lists[0]
    for nxt in lists[1:]:
        tagged = tagged.unionByName(nxt)
    fused = tagged.groupBy("doc_id").agg(
        F.sum(1.0 / (F.lit(float(rank_const)) + F.col("rank")))
        .alias("rrf_score")
    )
    return (
        fused.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(k)
    )


def hybrid_topk(
    ix: PostingsIndex,
    vecs: DataFrame,
    query: str,
    query_vec: list[float],
    k: int = 10,
    depth: int = 50,
    rank_const: int = RRF_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """OpenSearch-style hybrid query: lexical BM25 over the inverted
    index + brute/ANN cosine over the embeddings table, RRF-fused.
    Assumes doc_id and ``id_col`` share the id space (the embeddings
    table is the docs table's vector column at scale)."""
    lex = _ranked(
        bm25_scores(ix, query)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(depth),
        "doc_id", "score",
    )
    vec = _ranked(
        cosine_topk(vecs, query_vec, k=depth, id_col=id_col,
                    vec_col=vec_col),
        id_col, "cosine",
    )
    return rrf_fuse([lex, vec], k=k, rank_const=rank_const)


def normalized_fuse(
    lists: list[DataFrame],
    k: int = 10,
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
    weights: list[float] | None = None,
) -> DataFrame:
    """The OpenSearch normalization-processor fusion (the 2.x hybrid
    DEFAULT; RRF is the score-ranker alternative): per-list score
    normalization (``min_max`` or ``l2``) then weighted combination
    (``arithmetic_mean`` over ALL sub-queries with a missing score
    counting 0, ``geometric_mean`` / ``harmonic_mean`` over the
    PRESENT scores -- the processor's documented treatment of zeros).

    Inputs are (doc_id, score) top-``depth`` cuts, so the per-list
    min/max/norm stats are 1-row aggregates cross-joined back
    (metadata-sized, the engine's stats-fold idiom) and the fusion
    shuffle carries at most ``len(lists) * depth`` rows."""
    n = len(lists)
    if weights is None:
        weights = [1.0] * n
    if len(weights) != n:
        raise ValueError("one weight per sub-query list")
    total_w = float(sum(weights))

    parts = []
    for i, df in enumerate(lists):
        sc = F.col("score").cast("double")
        if normalization == "min_max":
            stats = df.agg(F.min(sc).alias("_lo"), F.max(sc).alias("_hi"))
            norm = df.crossJoin(stats).select(
                "doc_id",
                F.when(
                    F.col("_hi") > F.col("_lo"),
                    (sc - F.col("_lo")) / (F.col("_hi") - F.col("_lo")),
                ).otherwise(F.lit(1.0)).alias("s"),
            )
        elif normalization == "l2":
            stats = df.agg(F.sqrt(F.sum(sc * sc)).alias("_n"))
            norm = df.crossJoin(stats).select(
                "doc_id",
                F.when(F.col("_n") > 0, sc / F.col("_n"))
                .otherwise(F.lit(0.0)).alias("s"),
            )
        else:
            raise ValueError(f"bad normalization {normalization!r}")
        parts.append(norm.select(
            "doc_id", "s", F.lit(float(weights[i])).alias("w")))

    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    g = allp.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("s")).alias("_ws"),
        F.sum("w").alias("_wp"),  # weight present
        F.sum(F.col("w") * F.log(
            F.when(F.col("s") > 0, F.col("s")))).alias("_wlns"),
        F.sum(F.when(F.col("s") > 0, F.col("w"))).alias("_wpos"),
        F.sum(F.when(F.col("s") > 0,
                     F.col("w") / F.col("s"))).alias("_winv"),
    )
    if combination == "arithmetic_mean":
        score = F.col("_ws") / F.lit(total_w)
    elif combination == "geometric_mean":
        score = F.when(
            F.col("_wpos").isNotNull() & (F.col("_wpos") > 0),
            F.exp(F.col("_wlns") / F.col("_wpos")),
        ).otherwise(F.lit(0.0))
    elif combination == "harmonic_mean":
        score = F.when(
            F.col("_winv").isNotNull() & (F.col("_winv") > 0),
            F.col("_wpos") / F.col("_winv"),
        ).otherwise(F.lit(0.0))
    else:
        raise ValueError(f"bad combination {combination!r}")
    return (
        g.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
