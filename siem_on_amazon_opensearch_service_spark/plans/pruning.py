"""Top-k pruning: distributed MaxScore with block-max metadata.

The reference delegates top-k pruning to Lucene's block-max WAND
(behavior target only -- it lives behind the `_bulk`/`_search` calls,
reference es_loader/index.py:345; no repo code). Classic BMW is a
doc-at-a-time sequential traversal with a shared heap -- inherently
single-threaded state, the wrong shape for Spark. The distributed-
exact family used here is **MaxScore** (Turtle & Flood, "Query
evaluation: strategies and optimizations", IP&M 1995) combined with
per-block impact bounds in the spirit of **Block-Max WAND** (Ding &
Suel, "Faster top-k document retrieval using block-max indexes",
SIGIR 2011); both public algorithms, restated as set-at-a-time
DataFrame ops that keep results rank-identical with exhaustive
scoring:

1. cheap θ: the k-th best *single-term* score over the highest-
   upper-bound query term is a lower bound on the final k-th best
   total score (all BM25 components are non-negative);
2. term split: sort query terms by score upper bound
   ``UB_t = qtf · idf_t · max_tf/(max_tf + k1(1-b))`` (block-max
   metadata ``max_tf`` from term_stats); the maximal suffix with
   ``Σ UB < θ`` is *non-essential* -- a doc containing only
   non-essential terms scores < θ and can never enter the top-k;
3. candidates = docs appearing in ≥1 essential term's postings; only
   those postings rows of non-essential terms that join a candidate
   are decoded into the scoring aggregate.

Physical effect: the expensive wide stage (groupBy doc_id) receives
only candidate docs' contributions instead of every posting of every
stopword in the query. For Zipfian web text with stopword-laden
queries that is the bulk of the data (the per-block ``max_tf`` bound
also prunes at parquet row-group level via min/max stats on the
term-sorted layout). Exactness (== exhaustive top-k) is asserted by
tests/test_pruning.py over stopword-heavy queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..bm25 import idf, upper_bound
from ..index.build import PostingsIndex
from ..index.query import (_query_weights, decode_blocks,
                           tf_norm_col)


#: below this many candidate postings (sum of query-term dfs) the θ
#: phase's extra job costs more than the decode it saves -- dispatch
#: to the single-job exhaustive plan instead. Lucene gates WAND the
#: same way (cost-based); both plans are exact, so rank identity is
#: unaffected either way.
PRUNE_MIN_POSTINGS = 100_000


def bm25_topk_pruned(ix: PostingsIndex, query: str, k: int = 10,
                     stats_out: dict | None = None,
                     min_postings: int | None = None) -> DataFrame:
    """MaxScore + block-max pruned BM25 top-k; rank-identical to
    bm25_topk. Pass ``stats_out={}`` to receive
    ``{"blocks_total", "blocks_scanned", "essential", "theta"}``
    (costs two extra count jobs — debugging/tests only; also forces
    the pruned plan regardless of size). ``min_postings`` overrides
    the cost-based dispatch threshold (0 = always prune)."""
    weights = _query_weights(query)
    spark = ix.postings.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not weights:
        return empty

    rows = ix.term_stats.filter(F.col("term").isin(list(weights))).collect()

    # cost-based dispatch: term_stats rows are already on the driver,
    # so the size check is free. Small match sets run the one-job
    # exhaustive plan (same results); the pruning machinery engages
    # when posting volume is what dominates.
    if min_postings is None:
        min_postings = PRUNE_MIN_POSTINGS
    if stats_out is None and sum(int(r["df"]) for r in rows) < min_postings:
        from ..index.query import bm25_topk

        return bm25_topk(ix, query, k=k)
    stats = {r["term"]: (int(r["df"]), int(r["max_tf"])) for r in rows}
    # stored block-max impact (tight: uses tf AND dl); fall back to the
    # dl→0 analytic bound for indexes written before the column existed.
    impact = {
        r["term"]: (
            float(r["max_impact"])
            if "max_impact" in r.asDict() and r["max_impact"] is not None
            else upper_bound(int(r["max_tf"]), 1.0)
        )
        for r in rows
    }
    present = [t for t in weights if t in stats]
    if not present:
        return empty

    idfs = {t: idf(ix.n_docs, stats[t][0]) for t in present}
    ub = {t: weights[t] * idfs[t] * impact[t] for t in present}
    has_impact = "max_impact" in ix.postings.columns

    # --- phase 1: θ lower bound from the TOP-IMPACT blocks of the
    # best term only. Any subset of docs under-estimates the k-th best
    # single-term score, and a smaller θ only weakens pruning, never
    # exactness -- so instead of decoding the best term's whole
    # posting list (the old two-full-job shape that made the pruned
    # path slower than exhaustive on small indexes), the block-max
    # metadata picks a handful of highest-bound blocks (enough to hold
    # >= k docs with headroom), and only those are decoded. Scoring is
    # a single native expression (idf folded as a literal; no join).
    from ..bm25 import B, K1
    from ..index.build import BLOCK_SIZE

    best = max(present, key=lambda t: ub[t])
    n_theta_blocks = max(2, -(-k // BLOCK_SIZE) + 4)
    order = F.desc("max_impact") if has_impact else F.desc("max_tf")
    best_blocks = (
        ix.postings.filter(F.col("term") == best)
        .orderBy(order)
        .limit(n_theta_blocks)
    )
    tf_c = F.col("tf").cast("double")
    dl_c = F.col("dl").cast("double")
    single = F.lit(float(weights[best] * idfs[best])) * tf_c / (
        tf_c + K1 * (1.0 - B + B * dl_c / F.lit(ix.avgdl))
    )
    best_scores = (
        decode_blocks(best_blocks)
        .withColumn("_s", single)
        .orderBy(F.desc("_s"))
        .limit(k)
        .select("_s")
        .collect()
    )
    theta = float(best_scores[-1]["_s"]) if len(best_scores) >= k else 0.0

    # --- term split: maximal low-UB suffix with Σ UB strictly < θ ---
    by_ub = sorted(present, key=lambda t: ub[t])  # ascending
    nonessential: list[str] = []
    acc = 0.0
    for t in by_ub:
        if acc + ub[t] < theta and len(nonessential) < len(present) - 1:
            acc += ub[t]
            nonessential.append(t)
        else:
            break
    essential = [t for t in present if t not in nonessential]

    # --- BLOCK-MAX skip (exact): drop block b of term t when
    #       UB_block(t, b) + Σ_{t'≠t} UB_global(t')  <  θ.
    # Any doc in such a block totals < θ, so it cannot reach the
    # top-k; and no true top-k doc's block can satisfy the condition
    # (its own score would contradict the strict bound) — so every
    # surviving doc's score stays exact. Implemented as a native
    # predicate over block metadata (max_tf) with a per-term
    # complement broadcast map; skipped blocks are never decoded.
    total_ub = sum(ub.values())
    complement = {t: theta - (total_ub - ub[t]) for t in present}

    def blocks_pruned(terms: list[str]) -> DataFrame:
        blk = ix.postings.filter(F.col("term").isin(terms))
        idf_map = F.create_map(
            *[F.lit(x) for t in terms for x in (t, float(idfs[t] * weights[t]))]
        )
        comp_map = F.create_map(
            *[F.lit(x) for t in terms for x in (t, float(complement[t]))]
        )
        if has_impact:
            block_ub = idf_map[F.col("term")] * F.col("max_impact")
        else:
            from ..bm25 import B, K1

            mt = F.col("max_tf").cast("double")
            block_ub = idf_map[F.col("term")] * mt / (mt + K1 * (1.0 - B))
        return blk.filter(block_ub >= comp_map[F.col("term")])

    if stats_out is not None:
        stats_out["blocks_total"] = ix.postings.filter(
            F.col("term").isin(present)
        ).count()
        stats_out["blocks_scanned"] = (
            blocks_pruned(essential).count()
            + (blocks_pruned(nonessential).count() if nonessential else 0)
        )
        stats_out["essential"] = list(essential)
        stats_out["theta"] = theta

    dec_ess = decode_blocks(blocks_pruned(essential))
    if nonessential:
        # dec_ess feeds BOTH the candidate set and the union: persist
        # so the essential blocks decode once, not twice — on the
        # stopword-heavy queries this path exists for, that decode is
        # the bulk of the work (ContextCleaner reclaims the cache)
        dec_ess = dec_ess.persist()
        cand = dec_ess.select("doc_id").distinct()
        dec_non = decode_blocks(blocks_pruned(nonessential)).join(
            cand, "doc_id"
        )  # contribution restriction, AQE picks strategy
        decoded = dec_ess.unionByName(dec_non)
    else:
        decoded = dec_ess

    # per-term weight*idf folded into ONE literal map (the exact
    # expression bm25_scores uses, so pruned == exhaustive holds
    # bitwise): no term_stats re-scan, no qtf/df broadcast joins.
    wmap = F.create_map(
        *[F.lit(x) for t in present
          for x in (t, float(weights[t] * idfs[t]))]
    )
    scored = decoded.withColumn(
        "_s", wmap[F.col("term")] * tf_norm_col(ix.avgdl))
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("_s").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
