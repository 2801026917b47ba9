"""BM25 top-k retrieval over the postings index.

Two paths, verified equal by tests:

* :func:`bm25_topk` -- exhaustive: filter postings to the query terms
  (parquet row-group pruning via the term-sorted layout), decode the
  varbyte blocks with a vectorized ``mapInPandas``, score with NATIVE
  column expressions (whole-stage codegen), ``groupBy(doc_id)`` sum,
  ``ORDER BY score DESC, doc_id LIMIT k`` (Spark plans
  TakeOrderedAndProject -- per-partition heaps + driver merge, the
  same shape as OpenSearch's per-shard top-k + coordinating-node
  merge, SURVEY.md section 3.3).

* :func:`plans.pruning.bm25_topk_pruned` -- block-max pruned variant.

Scoring needs no join to the docs table: per-posting doc length rides
inside the block (``dls_vb``, the Lucene norms analog), and per-term
idf comes from a tiny broadcast of term_stats rows for the query
terms only.

Ties break (score desc, doc_id asc) -- fixed rule shared with the
oracle (SURVEY.md section 7.3 item 1).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import tokenize_py
from ..bm25 import B, K1
from .build import PostingsIndex

DECODED_SCHEMA = "term string, doc_id long, tf int, dl int"


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """Block rows -> (term, doc_id, tf, dl) posting rows (vectorized)."""
    cols = blocks.select("term", "doc_ids_vb", "tfs_vb", "dls_vb")

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..codec import vb_decode, delta_decode

        for b in batches:
            if b.empty:
                continue
            terms, dids, tfs, dls = [], [], [], []
            for term, dvb, tvb, lvb in zip(
                b["term"], b["doc_ids_vb"], b["tfs_vb"], b["dls_vb"]
            ):
                d = delta_decode(vb_decode(dvb)).astype(np.int64)
                terms.append(np.full(d.size, term, dtype=object))
                dids.append(d)
                tfs.append(vb_decode(tvb).astype(np.int32))
                dls.append(vb_decode(lvb).astype(np.int32))
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms),
                    "doc_id": np.concatenate(dids),
                    "tf": np.concatenate(tfs),
                    "dl": np.concatenate(dls),
                }
            )

    return cols.mapInPandas(dec, schema=DECODED_SCHEMA)


def score_col(avgdl: float, n_docs: int) -> F.Column:
    """Native BM25 expression over (tf, dl, df) columns -- codegen'd,
    identical formula text to bm25.score_sql."""
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    df_ = F.col("df").cast("double")
    idf = F.log(1.0 + (F.lit(float(n_docs)) - df_ + 0.5) / (df_ + 0.5))
    return idf * tf / (tf + K1 * (1.0 - B + B * dl / F.lit(avgdl)))


def _query_weights(query: str, tokenizer_py=None) -> dict[str, int]:
    """Term -> occurrence count in the query (Lucene: a repeated term
    is a repeated clause, scoring once per occurrence).
    ``tokenizer_py`` must match the analyzer the index was built with
    (defaults to the shared core analyzer)."""
    w: dict[str, int] = {}
    for t in (tokenizer_py or tokenize_py)(query):
        w[t] = w.get(t, 0) + 1
    return w


def tf_norm_col(avgdl: float) -> F.Column:
    """The BM25 tf normalization ``tf / (tf + K1*(1-B+B*dl/avgdl))``
    over decoded (tf, dl) columns — defined ONCE so the scoring,
    batch, explain and pruned paths cannot drift apart (the (k1+1)
    caveat in the module docstring applies to all of them equally)."""
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    return tf / (tf + K1 * (1.0 - B + B * dl / F.lit(float(avgdl))))


def term_dfs(ix: PostingsIndex, terms: list[str]) -> dict[str, int]:
    """term -> document frequency for a query's terms: one driver-side
    metadata collect over term_stats (|terms| rows)."""
    return {
        r["term"]: int(r["df"])
        for r in ix.term_stats.filter(F.col("term").isin(list(terms)))
        .select("term", "df").collect()
    }


def bm25_scores(ix: PostingsIndex, query: str,
                tokenizer_py=None) -> DataFrame:
    """(doc_id, score) for EVERY matching doc — the unlimited match
    set, for filter-context composition or downstream joins. Plan:
    scan (term pushdown) → decode → native score → one shuffle
    (partial+final sum). No joins: per-term idf·qtf is metadata,
    collected once and folded into a literal map.
    """
    from ..bm25 import idf as _idf

    weights = _query_weights(query, tokenizer_py)
    terms = list(weights)
    spark = ix.postings.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not terms:
        return empty

    dfs = term_dfs(ix, terms)
    present = [t for t in terms if t in dfs]
    if not present:
        return empty
    wmap = F.create_map(
        *[
            F.lit(x)
            for t in present
            for x in (t, float(weights[t] * _idf(ix.n_docs, dfs[t])))
        ]
    )

    blocks = ix.postings.filter(F.col("term").isin(present))
    decoded = decode_blocks(blocks)
    scored = decoded.withColumn(
        "_s", wmap[F.col("term")] * tf_norm_col(ix.avgdl),
    )
    return scored.groupBy("doc_id").agg(F.sum("_s").alias("score"))


def bm25_topk(ix: PostingsIndex, query: str, k: int = 10,
              with_url: bool = False, tokenizer_py=None) -> DataFrame:
    """Top-k docs for one query string. Returns (doc_id, score[, url]).
    TakeOrderedAndProject over :func:`bm25_scores` — per-partition
    heaps + driver merge, never a global sort."""
    topk = (
        bm25_scores(ix, query, tokenizer_py)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    if with_url and "url" in ix.docs.columns:
        # k rows join docs: broadcast the tiny top-k side.
        docs = ix.docs.select("doc_id", "url")
        topk = (
            docs.join(F.broadcast(topk), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
    return topk


def bm25_topk_df(docs: DataFrame, text_col: str, id_col: str, query: str,
                 k: int = 10) -> DataFrame:
    """BM25 top-k straight from a documents DataFrame -- the
    uncompressed one-stage plan (SURVEY.md section 7.1 M1). Same
    semantics as :func:`bm25_topk` without materializing an index;
    used for small corpora and as a semantic cross-check of the
    compressed path."""
    from ..analysis import tokens_col

    spark = docs.sparkSession
    weights = _query_weights(query)
    if not weights:
        return spark.createDataFrame([], f"{id_col} long, score double")

    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(text_col).alias("_toks"),
    )
    # greatest(size, 0): NULL-text docs must enter the corpus stats
    # with doclen 0, same guard (and reason) as build.py's tokenize
    # pass — otherwise avgdl here diverges from the index path this
    # function is documented to cross-check.
    dl_guarded = F.greatest(F.size("_toks"), F.lit(0))
    tokens = base.select(
        "doc_id", dl_guarded.alias("dl"), F.explode("_toks").alias("term")
    )
    tf = tokens.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))

    srow = base.select(dl_guarded.alias("dl")).agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(srow["n"]), float(srow["avgdl"] or 0.0)

    terms = list(weights)
    dft = (
        tf.filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    wdf = spark.createDataFrame(
        [(t, int(c)) for t, c in weights.items()], "term string, qtf int"
    )
    scored = (
        tf.filter(F.col("term").isin(terms))
        .join(F.broadcast(dft), "term")
        .join(F.broadcast(wdf), "term")
        .withColumn(
            "_s", score_col(avgdl, n_docs) * F.col("qtf").cast("double")
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("_s").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_batch(ix: PostingsIndex, queries: DataFrame, k_col: str = "k",
                    tokenizer=None) -> DataFrame:
    """Batch retrieval: queries(qid int, query string, k int) ->
    (qid, rank, doc_id, score). One Spark job for the whole query set:

      explode query -> terms (same analyzer, native split)
      broadcast semi-join postings on term (only query-term blocks read)
      decode once per block even if shared by many queries
      score per (qid, doc_id), window row_number per qid <= k.

    ``tokenizer``: Column -> token-array Column, matching the analyzer
    the index was built with (the build_index seam) — default is the
    shared core analyzer.
    """
    from pyspark.sql import Window

    from ..analysis import tokens_col

    from ..bm25 import idf as _idf

    spark = ix.postings.sparkSession
    # the query set is metadata-sized: collect it once, fold per-term
    # idf in driver-side, broadcast ONE (term, qid, weight, k) table —
    # the only join left is the genuine postings→queries fan-out.
    tokenizer = tokenizer or tokens_col
    qrows = (
        queries.select(
            "qid", F.col(k_col).alias("k"),
            F.explode(tokenizer(F.col("query"))).alias("term")
        )
        .groupBy("qid", "k", "term")
        .agg(F.count("*").alias("qtf"))
        .collect()
    )
    if not qrows:
        return spark.createDataFrame([], "qid int, rank int, doc_id long, score double")
    needed = sorted({r["term"] for r in qrows})
    dfs = term_dfs(ix, needed)
    wrows = [
        (int(r["qid"]), int(r["k"]), r["term"],
         float(r["qtf"] * _idf(ix.n_docs, dfs[r["term"]])))
        for r in qrows if r["term"] in dfs
    ]
    if not wrows:
        return spark.createDataFrame([], "qid int, rank int, doc_id long, score double")
    wdf = spark.createDataFrame(wrows, "qid int, k int, term string, w double")

    matched_terms = sorted({r[2] for r in wrows})
    decoded = decode_blocks(ix.postings.filter(F.col("term").isin(matched_terms)))
    scored = (
        decoded.join(F.broadcast(wdf), "term")  # fan out postings to queries
        .withColumn("_s", F.col("w") * tf_norm_col(ix.avgdl))
        .groupBy("qid", "k", "doc_id")
        .agg(F.sum("_s").alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("qid", "rank", "doc_id", "score")
    )


def search_after(scored: DataFrame, after_score: float, after_doc: int,
                 size: int = 10) -> DataFrame:
    """OpenSearch ``search_after`` deep pagination over the engine's
    (score desc, doc_id asc) sort: ``after_*`` is the last hit of the
    previous page (the cursor), and the next page is every hit
    strictly after it in sort order, cut to ``size``.

    The cursor is a plain filter BEFORE the top-k, so the plan stays
    Filter -> TakeOrderedAndProject: no global sort, no offset skip,
    and earlier pages are never re-materialized — precisely why
    OpenSearch recommends search_after over from/size for deep pages.
    ``scored`` is any (doc_id, score) match set (e.g.
    :func:`bm25_scores`), pre-round: the cursor compares the exact
    double the sort uses.

    Page-coherence caveat (same as OpenSearch's): if ``scored`` is
    re-EXECUTED between pages, a multi-term doc's float score can
    move by an ulp with partial-sum merge order and straddle the
    cursor. For guaranteed coherent deep paging, snapshot the match
    set first — that is exactly what PIT (`index/pit.py`) exists
    for; upstream likewise recommends search_after WITH a
    point-in-time."""
    cursor = (
        (F.col("score") < F.lit(float(after_score)))
        | ((F.col("score") == F.lit(float(after_score)))
           & (F.col("doc_id") > F.lit(int(after_doc))))
    )
    return (
        scored.filter(cursor)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(size)
    )


def collapse_topk(scored: DataFrame, keys: DataFrame, field: str,
                  k: int = 10) -> DataFrame:
    """OpenSearch ``collapse``: deduplicate hits on ``field``, keeping
    only each group's best hit (score desc, doc_id asc — the engine
    sort), then the usual top-k over the survivors.

    ``keys`` maps doc_id -> field (e.g. ``ix.docs``). One shuffle on
    the collapse field for the per-group row_number, then
    TakeOrderedAndProject; the window input is the match set, not the
    corpus. Returns (doc_id, score, <field>)."""
    from pyspark.sql import Window

    # LEFT join: hits without a keys row fall into the NULL group
    # (same as a NULL field value) instead of silently vanishing
    joined = scored.join(keys.select("doc_id", field), "doc_id", "left")
    w = Window.partitionBy(field).orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (
        joined.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


_FS_MODIFIERS = ("none", "log1p", "sqrt", "square")
_FS_BOOST_MODES = ("multiply", "sum", "replace")


def function_score(scored: DataFrame, docs: DataFrame, factor_field: str,
                   factor: float = 1.0, modifier: str = "log1p",
                   boost_mode: str = "multiply") -> DataFrame:
    """OpenSearch ``function_score`` with a ``field_value_factor``
    function: fold a document attribute into the relevance score —
    ``new = combine(score, modifier(factor * doc[field]))``.

    The factor join is doc-keyed against ``docs`` (the doc side-table,
    broadcast-or-shuffle per AQE) and the arithmetic is one native
    expression — no reranking pass, the modified score flows straight
    into whatever top-k follows. Returns (doc_id, score)."""
    if modifier not in _FS_MODIFIERS:
        raise ValueError(f"unknown modifier: {modifier}")
    if boost_mode not in _FS_BOOST_MODES:
        raise ValueError(f"unknown boost_mode: {boost_mode}")
    fv = F.coalesce(F.col(factor_field).cast("double"), F.lit(0.0)) \
        * F.lit(float(factor))
    fx = {
        "none": fv,
        # OpenSearch log1p is the COMMON logarithm of (1 + x)
        "log1p": F.log10(fv + F.lit(1.0)),
        "sqrt": F.sqrt(fv),
        "square": fv * fv,
    }[modifier]
    combined = {
        "multiply": F.col("score") * fx,
        "sum": F.col("score") + fx,
        "replace": fx,
    }[boost_mode]
    # LEFT join: a hit with no row in the side-table scores with a
    # missing factor of 0 (the coalesce above), it does not vanish —
    # OpenSearch field_value_factor with missing:0 keeps such hits.
    return (
        scored.join(docs.select("doc_id", factor_field), "doc_id", "left")
        .select("doc_id", combined.alias("score"))
    )


def rescore_topk(scored: DataFrame, rescorer: DataFrame,
                 window_size: int = 50, query_weight: float = 1.0,
                 rescore_query_weight: float = 1.0, k: int = 10) -> DataFrame:
    """OpenSearch ``rescore``: re-rank only the top ``window_size``
    hits of the primary query with a (typically more expensive)
    secondary query — combined = query_weight * primary +
    rescore_query_weight * secondary (0 when the secondary doesn't
    match), the default ``score_mode: total``.

    The window cut is a TakeOrderedAndProject (window_size rows to one
    partition — metadata-sized), so the secondary scoring joins
    against a tiny broadcastable set; docs outside the window are
    never rescored, which is the entire point of the feature at 100 TB
    (the expensive scorer touches window_size docs, not the match
    set). Returns top-k (doc_id, score) by combined score; when
    ``k > window_size`` the positions past the window are filled by
    the remaining hits in primary order with ``query_weight *
    primary`` scores (the OpenSearch behavior — rescore re-ranks the
    window, it never shrinks the result set)."""
    win = (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(window_size)
    )
    joined = win.join(
        rescorer.select("doc_id", F.col("score").alias("_rs")),
        "doc_id", "left",
    )
    comb = (F.lit(float(query_weight)) * F.col("score")
            + F.lit(float(rescore_query_weight))
            * F.coalesce(F.col("_rs"), F.lit(0.0)))
    rescored = (
        joined.select("doc_id", comb.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    if k <= window_size:
        return rescored
    # positions past the window: next-best hits by PRIMARY order
    # (anti-join against the window_size-row window broadcasts; the
    # cut stays a TakeOrderedAndProject — no global sort appears)
    tail = (
        scored.join(F.broadcast(win.select("doc_id")),
                    "doc_id", "left_anti")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k - window_size)
        .select("doc_id",
                (F.lit(float(query_weight)) * F.col("score"))
                .alias("score"))
    )
    return rescored.unionByName(tail)


def bm25_explain(ix: PostingsIndex, query: str, k: int = 10,
                 tokenizer_py=None) -> DataFrame:
    """Score breakdown for the top-k docs — the ``explain=true``
    response OpenSearch attaches per hit (Lucene's Explanation tree,
    flattened to one row per (doc, term) contribution).

    Columns: doc_id, term, tf, dl, df, idf, qtf, contribution
    (idf * qtf * tf_norm), score (the doc's total — the bm25_topk
    value, so ``sum(contribution) over doc == score`` holds by
    construction and is pinned by tests).

    Plan: the usual decode + native-scoring pass produces per-posting
    contributions; doc totals reduce in the same shuffle shape as
    bm25_topk; the top-k cut is a TakeOrderedAndProject whose k-row
    result broadcasts back onto the per-posting rows — the expensive
    breakdown surfaces only for the k docs a user asked to have
    explained, never for the whole match set."""
    from ..bm25 import idf as _idf

    weights = _query_weights(query, tokenizer_py)
    terms = list(weights)
    spark = ix.postings.sparkSession
    empty_schema = ("doc_id long, term string, tf int, dl int, df long, "
                    "idf double, qtf int, contribution double, score double")
    if not terms:
        return spark.createDataFrame([], empty_schema)
    dfs = term_dfs(ix, terms)
    present = [t for t in terms if t in dfs]
    if not present:
        return spark.createDataFrame([], empty_schema)

    df_map = F.create_map(
        *[F.lit(x) for t in present for x in (t, dfs[t])])
    idf_map = F.create_map(
        *[F.lit(x) for t in present for x in (t, _idf(ix.n_docs, dfs[t]))])
    qtf_map = F.create_map(
        *[F.lit(x) for t in present for x in (t, weights[t])])

    decoded = decode_blocks(ix.postings.filter(F.col("term").isin(present)))
    per = decoded.withColumn(
        "contribution",
        idf_map[F.col("term")] * qtf_map[F.col("term")].cast("double")
        * tf_norm_col(ix.avgdl),
    # totals AND the final join both consume `per`: persist so the
    # postings decode runs once, not twice (ContextCleaner reclaims
    # the cache when the response frame is dropped)
    ).persist()
    totals = (
        per.groupBy("doc_id").agg(F.sum("contribution").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    return (
        per.join(F.broadcast(totals), "doc_id")
        .select(
            "doc_id", "term", "tf", "dl",
            df_map[F.col("term")].cast("long").alias("df"),
            idf_map[F.col("term")].alias("idf"),
            qtf_map[F.col("term")].alias("qtf"),
            "contribution", "score",
        )
        .orderBy(F.desc("score"), F.asc("doc_id"), F.asc("term"))
    )


def explain_doc(ix: PostingsIndex, query: str, doc_id: int,
                tokenizer_py=None) -> dict:
    """``GET /{index}/_explain/{id}``: why does (or doesn't) ONE
    document match the query — for an ARBITRARY doc id, not just the
    top-k window that :func:`bm25_explain` covers.

    Returns ``{"_id", "matched", "score", "details": [{term, tf, dl,
    df, idf, qtf, contribution}, ...]}`` (sum of contributions ==
    score, the flattened Lucene Explanation tree).

    Plan: block metadata carries (min_doc_id, max_doc_id), so besides
    the pushed ``term IN (...)`` the scan prunes to blocks whose id
    RANGE covers the doc — on the (term, salt, block)-sorted layout a
    single-doc explain decodes a handful of blocks, never a term's
    full posting list. The result is ≤ |query terms| rows."""
    from ..bm25 import idf as _idf

    weights = _query_weights(query, tokenizer_py)
    out: dict = {"_id": int(doc_id), "matched": False, "score": 0.0,
                 "details": []}
    if not weights:
        return out
    dfs = term_dfs(ix, list(weights))
    present = [t for t in weights if t in dfs]
    if not present:
        return out
    blocks = ix.postings.filter(
        F.col("term").isin(present)
        & (F.col("min_doc_id") <= int(doc_id))
        & (F.col("max_doc_id") >= int(doc_id))
    )
    rows = (
        decode_blocks(blocks)
        .filter(F.col("doc_id") == int(doc_id))
        .select("term", "tf", "dl")
        .collect()
    )
    if not rows:
        return out
    for r in sorted(rows, key=lambda r: r["term"]):
        t, tf, dl = r["term"], float(r["tf"]), float(r["dl"])
        idf = _idf(ix.n_docs, dfs[t])
        contribution = (
            idf * weights[t]
            * tf / (tf + K1 * (1.0 - B + B * dl / ix.avgdl))
        )
        out["details"].append({
            "term": t, "tf": int(tf), "dl": int(dl), "df": dfs[t],
            "idf": idf, "qtf": weights[t],
            "contribution": contribution,
        })
        out["score"] += contribution
    out["matched"] = True
    return out


def explain_for_docs(ix: PostingsIndex, query: str,
                     doc_ids: list[int], tokenizer_py=None) -> DataFrame:
    """Per-(doc, term) contributions for an EXPLICIT id list — the
    request-body ``explain: true`` path, where the ids are the hits
    page (page-sized, never the corpus). Same construction as
    :func:`bm25_explain` with the id restriction replacing the top-k
    cut; ``sum(contribution) over doc == the hit's score`` holds by
    construction."""
    from ..bm25 import idf as _idf

    weights = _query_weights(query, tokenizer_py)
    terms = list(weights)
    spark = ix.postings.sparkSession
    empty_schema = ("doc_id long, term string, idf double, qtf int, "
                    "contribution double")
    if not terms or not doc_ids:
        return spark.createDataFrame([], empty_schema)
    dfs = term_dfs(ix, terms)
    present = [t for t in terms if t in dfs]
    if not present:
        return spark.createDataFrame([], empty_schema)
    idf_map = F.create_map(
        *[F.lit(x) for t in present for x in (t, _idf(ix.n_docs, dfs[t]))])
    qtf_map = F.create_map(
        *[F.lit(x) for t in present for x in (t, weights[t])])
    decoded = decode_blocks(
        ix.postings.filter(F.col("term").isin(present))
    ).filter(F.col("doc_id").isin([int(i) for i in doc_ids]))
    return decoded.select(
        "doc_id", "term",
        idf_map[F.col("term")].alias("idf"),
        qtf_map[F.col("term")].alias("qtf"),
        (idf_map[F.col("term")] * qtf_map[F.col("term")].cast("double")
         * tf_norm_col(ix.avgdl)).alias("contribution"),
    )
