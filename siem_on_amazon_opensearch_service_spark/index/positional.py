"""Positional postings + phrase queries.

The reference's query surface is OpenSearch DSL; its dashboards use
``query_string``/``match_phrase`` searches that require term
positions (Lucene stores positions for every ``text`` field by
default — ``index_options: positions``). This module adds the
positional variant of the index:

* build: same one-wide-shuffle pipeline as ``build.py``, but the tf
  aggregate carries each posting's sorted position list
  (``posexplode`` + ``collect_list``); the block encoder appends a
  ``pos_vb`` column — per-posting position deltas varbyte-packed,
  concatenated across the block (per-posting counts == tfs, so no
  extra length table is needed to split them).
* phrase matching is pure DataFrame algebra: decoded positions become
  rows ``(doc, pos - term_index_in_phrase)``; a doc has a phrase
  occurrence at every adjusted position covered by ALL phrase terms
  — ``groupBy(doc, adj).count() == n_terms`` — and the phrase
  frequency is the number of such positions.
* scoring follows Lucene's PhraseQuery shape: the phrase acts as a
  pseudo-term with ``tf = phrase_freq`` and ``idf = Σ idf(term)``.

At scale the positional index is ~2-4× the size of the frequency
index (positions dominate); building it is opt-in, exactly like
Lucene's per-field ``index_options``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis import tokenize_py, tokens_col
from ..bm25 import B, K1, idf
from ..codec import delta_decode, delta_encode, vb_decode, vb_encode
from .build import BLOCK_SIZE, PostingsIndex

POS_SCHEMA = (
    "term string, salt int, block_id int, doc_count int, max_tf int, "
    "min_doc_id long, max_doc_id long, "
    "doc_ids_vb binary, tfs_vb binary, dls_vb binary, pos_vb binary"
)


def _encode_pos_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sorted complete (term, salt) groups -> positional block rows."""
    term = pdf["term"].to_numpy()
    salt = pdf["salt"].to_numpy()
    doc_ids = pdf["doc_id"].to_numpy(np.int64)
    tfs = pdf["tf"].to_numpy(np.int64)
    dls = pdf["doclen"].to_numpy(np.int64)
    poss = pdf["positions"].to_numpy()  # object array of int lists

    n = len(term)
    change = np.empty(n, dtype=bool)
    change[0] = True
    if n > 1:
        change[1:] = (term[1:] != term[:-1]) | (salt[1:] != salt[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    rows = []
    for s, e in zip(starts, ends):
        t, sa = term[s], int(salt[s])
        for b, bs in enumerate(range(0, e - s, BLOCK_SIZE)):
            be = min(bs + BLOCK_SIZE, e - s)
            sl = slice(s + bs, s + be)
            d, tt, ll = doc_ids[sl], tfs[sl], dls[sl]
            # per-posting position deltas, concatenated over the block
            pos_parts = [
                delta_encode(np.asarray(p, dtype=np.uint64))
                for p in poss[sl]
            ]
            flat = (
                np.concatenate(pos_parts) if pos_parts
                else np.zeros(0, dtype=np.uint64)
            )
            rows.append(
                (
                    t, sa, b, int(be - bs), int(tt.max()),
                    int(d[0]), int(d[-1]),
                    vb_encode(delta_encode(d.astype(np.uint64))),
                    vb_encode(tt.astype(np.uint64)),
                    vb_encode(ll.astype(np.uint64)),
                    vb_encode(flat),
                )
            )
    return pd.DataFrame(
        rows,
        columns=["term", "salt", "block_id", "doc_count", "max_tf",
                 "min_doc_id", "max_doc_id", "doc_ids_vb", "tfs_vb",
                 "dls_vb", "pos_vb"],
    )


def build_positional_index(
    spark: SparkSession,
    pages: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt_threshold: int = 100_000,
) -> PostingsIndex:
    """Positional variant of ``build.build_index`` (same shuffle
    shape; postings rows additionally carry sorted position lists)."""
    base = pages.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(text_col).alias("_toks"),
    )
    tokens = base.select(
        "doc_id", F.size("_toks").alias("doclen"),
        F.posexplode("_toks").alias("pos", "term"),
    )
    tf = tokens.groupBy("doc_id", "doclen", "term").agg(
        F.count("*").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )
    from pyspark import StorageLevel

    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)

    n_docs = pages.count()
    drow = tf.agg(F.sum("tf").alias("dl")).collect()[0]
    avgdl = (int(drow["dl"] or 0)) / n_docs if n_docs else 0.0

    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    hot = df_tbl.filter(F.col("df") > salt_threshold).select(
        "term",
        F.ceil(F.col("df") / F.lit(salt_threshold)).cast("int").alias("n_salts"),
    )
    salted = (
        tf.join(F.broadcast(hot), "term", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("n_salts").isNotNull(),
                F.pmod(F.xxhash64("doc_id"), F.col("n_salts")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("n_salts")
    )
    parts = salted.repartition("term", "salt").sortWithinPartitions(
        "term", "salt", "doc_id"
    ).select("term", "salt", "doc_id", "tf", "doclen", "positions")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for b in batches:
            if carry is not None and len(carry):
                b = pd.concat([carry, b], ignore_index=True)
            if b.empty:
                continue
            t = b["term"].to_numpy()
            s = b["salt"].to_numpy()
            last = (t == t[-1]) & (s == s[-1])
            cut = len(b) - int(last[::-1].argmin()) if not last.all() else 0
            if cut == 0:
                carry = b
                continue
            head, carry = b.iloc[:cut], b.iloc[cut:].reset_index(drop=True)
            yield _encode_pos_batch(head)
        if carry is not None and len(carry):
            yield _encode_pos_batch(carry)

    postings = parts.mapInPandas(encode, schema=POS_SCHEMA)
    docs = base.select("doc_id", F.size("_toks").alias("doclen"))
    term_stats = postings.groupBy("term").agg(
        F.sum("doc_count").alias("df"), F.max("max_tf").alias("max_tf")
    )
    return PostingsIndex(docs=docs, postings=postings, term_stats=term_stats,
                         n_docs=n_docs, avgdl=avgdl)


DECODED_POS_SCHEMA = "term string, doc_id long, tf int, dl int, pos int"


def decode_blocks_positions(blocks: DataFrame) -> DataFrame:
    """Positional block rows -> one row per (term, doc, position)."""
    cols = blocks.select("term", "doc_ids_vb", "tfs_vb", "dls_vb", "pos_vb")

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            out_t, out_d, out_tf, out_dl, out_p = [], [], [], [], []
            for term, dvb, tvb, lvb, pvb in zip(
                b["term"], b["doc_ids_vb"], b["tfs_vb"], b["dls_vb"], b["pos_vb"]
            ):
                d = delta_decode(vb_decode(dvb)).astype(np.int64)
                tfv = vb_decode(tvb).astype(np.int64)
                dlv = vb_decode(lvb).astype(np.int64)
                flat = vb_decode(pvb).astype(np.int64)
                # un-delta per posting: positions of posting i occupy
                # flat[off_i : off_i + tf_i]
                offs = np.zeros(len(tfv) + 1, dtype=np.int64)
                np.cumsum(tfv, out=offs[1:])
                # absolute positions: cumsum within each posting ==
                # global cumsum minus carry before the posting start
                g = np.cumsum(flat)
                carry = np.repeat(
                    np.concatenate(([0], g[offs[1:-1] - 1])) if len(tfv) > 1
                    else np.array([0], dtype=np.int64),
                    tfv,
                )
                absp = g - carry
                out_t.append(np.full(flat.size, term, dtype=object))
                out_d.append(np.repeat(d, tfv))
                out_tf.append(np.repeat(tfv, tfv))
                out_dl.append(np.repeat(dlv, tfv))
                out_p.append(absp)
            if not out_t:
                continue
            yield pd.DataFrame({
                "term": np.concatenate(out_t),
                "doc_id": np.concatenate(out_d),
                "tf": np.concatenate(out_tf).astype(np.int32),
                "dl": np.concatenate(out_dl).astype(np.int32),
                "pos": np.concatenate(out_p).astype(np.int32),
            })

    return cols.mapInPandas(dec, schema=DECODED_POS_SCHEMA)


def phrase_scores(ix: PostingsIndex, phrase: str) -> DataFrame:
    """(doc_id, score) over the FULL phrase match set (Lucene
    PhraseQuery shape: pseudo-term with tf = phrase frequency, idf =
    Σ term idfs) -- for composition into bool / query_string DAGs.

    Plan: decode positions for the phrase terms only (term-pruned
    scan) → adjusted position rows (pos - index-in-phrase) →
    groupBy(doc, adj): docs where every phrase slot is covered →
    phrase_freq per doc → BM25.
    """
    spark = ix.postings.sparkSession
    terms = tokenize_py(phrase)
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not terms:
        return empty
    uniq = list(dict.fromkeys(terms))

    srows = ix.term_stats.filter(F.col("term").isin(uniq)).collect()
    dfs = {r["term"]: int(r["df"]) for r in srows}
    if any(t not in dfs for t in uniq):
        return empty
    idf_sum = float(sum(idf(ix.n_docs, dfs[t]) for t in terms))

    decoded = decode_blocks_positions(
        ix.postings.filter(F.col("term").isin(uniq))
    )
    # one row per phrase slot (term may repeat -> one entry per slot)
    slots = spark.createDataFrame(
        [(i, t) for i, t in enumerate(terms)], "slot int, term string"
    )
    adj = (
        decoded.join(F.broadcast(slots), "term")
        .select(
            "doc_id", "dl",
            (F.col("pos") - F.col("slot")).alias("adj"),
            "slot",
        )
    )
    n_slots = len(terms)
    covered = (
        adj.groupBy("doc_id", "dl", "adj")
        .agg(F.countDistinct("slot").alias("n"))
        .filter((F.col("n") == n_slots) & (F.col("adj") >= 0))
    )
    freq = covered.groupBy("doc_id", "dl").agg(
        F.count("*").alias("ptf")
    )
    ptf = F.col("ptf").cast("double")
    dl = F.col("dl").cast("double")
    score = (
        F.lit(idf_sum) * ptf
        / (ptf + K1 * (1.0 - B + B * dl / F.lit(ix.avgdl)))
    )
    return freq.select("doc_id", score.alias("score"))


def phrase_topk(ix: PostingsIndex, phrase: str, k: int = 10) -> DataFrame:
    """Top-k phrase query: TakeOrdered over :func:`phrase_scores`."""
    return (
        phrase_scores(ix, phrase)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def proximity_scores(ix: PostingsIndex, phrase: str,
                     slop: int = 0) -> DataFrame:
    """Sloppy (proximity) phrase: the OpenSearch ``match_phrase`` with
    ``slop`` / query_string ``"a b"~N`` form (reference dashboards'
    filter bar accepts the full Lucene syntax).

    Documented semantics (deterministic, engine- and oracle-shared):
    a match is an ORDERED position tuple ``p_0 < p_1 < ... < p_{n-1}``
    -- one position per phrase slot, slot i's term at ``p_i`` -- whose
    total gap ``(p_{n-1} - p_0) - (n - 1)`` is ``<= slop``.  Each
    match weighs ``1 / (1 + gap)`` (Lucene SloppyPhraseScorer's
    ``sloppyFreq = 1 / (distance + 1)`` shape); the doc's sloppy
    frequency is the sum over all matches.  ``slop=0`` degenerates to
    exact :func:`phrase_scores` (every match is consecutive, weight
    1).  Scoring is the same pseudo-term BM25: tf = sloppy frequency,
    idf = sum of slot idfs.

    Plan (100 TB posture): positions decode once from the term-pruned
    postings scan (``In(term, ...)`` reaches parquet); slots then
    chain-join on ``doc_id`` with the window predicate
    ``p_i > p_{i-1} AND p_i <= p_0 + (n-1) + slop`` -- every join key
    is doc_id, so with doc-partitioned decode output all n-1 joins
    co-locate on one shuffle; per-doc candidate tuples are bounded by
    the window width, never all-pairs.
    """
    spark = ix.postings.sparkSession
    terms = tokenize_py(phrase)
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not terms:
        return empty
    uniq = list(dict.fromkeys(terms))

    srows = ix.term_stats.filter(F.col("term").isin(uniq)).collect()
    dfs = {r["term"]: int(r["df"]) for r in srows}
    if any(t not in dfs for t in uniq):
        return empty
    idf_sum = float(sum(idf(ix.n_docs, dfs[t]) for t in terms))

    decoded = decode_blocks_positions(
        ix.postings.filter(F.col("term").isin(uniq))
    )
    n = len(terms)
    window = n - 1 + slop
    cur = (
        decoded.filter(F.col("term") == terms[0])
        .select("doc_id", "dl", F.col("pos").alias("p0"))
    )
    for i in range(1, n):
        si = (
            decoded.filter(F.col("term") == terms[i])
            .select("doc_id", F.col("pos").alias(f"p{i}"))
        )
        cur = cur.join(si, "doc_id").filter(
            (F.col(f"p{i}") > F.col(f"p{i-1}"))
            & (F.col(f"p{i}") <= F.col("p0") + F.lit(window))
        )
    if n == 1:
        gap = F.lit(0)
    else:
        gap = (F.col(f"p{n-1}") - F.col("p0")) - F.lit(n - 1)
    weight = F.lit(1.0) / (F.lit(1.0) + gap.cast("double"))
    freq = cur.groupBy("doc_id", "dl").agg(F.sum(weight).alias("ptf"))
    ptf = F.col("ptf")
    dl = F.col("dl").cast("double")
    score = (
        F.lit(idf_sum) * ptf
        / (ptf + K1 * (1.0 - B + B * dl / F.lit(ix.avgdl)))
    )
    return freq.select("doc_id", score.alias("score"))


def proximity_topk(ix: PostingsIndex, phrase: str, slop: int = 0,
                   k: int = 10) -> DataFrame:
    """Top-k sloppy phrase: TakeOrdered over :func:`proximity_scores`."""
    return (
        proximity_scores(ix, phrase, slop)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def phrase_prefix_scores(ix: PostingsIndex, phrase: str) -> DataFrame:
    """match_phrase_prefix (the OpenSearch search-as-you-type query,
    reference dashboards' filter bar): the LAST token of ``phrase`` is
    a prefix; a doc matches where the leading tokens appear as an
    exact phrase immediately followed by any dictionary term starting
    with that prefix.

    Scoring is the documented MultiPhraseQuery-shaped form: tf =
    phrase-prefix frequency (number of alignments), idf = sum of the
    exact slots' idfs + the prefix slot's idf computed on its UNION
    document frequency (number of docs containing >=1 expansion) --
    deterministic and expansion-count-independent, unlike Lucene's
    max_expansions-truncated sum, so small-scale results are stable.

    Plan notes (100 TB posture): the prefix expansion never touches
    the driver -- the ``LIKE 'pre%'`` predicate runs inside the
    term-sorted postings scan (same shape as querystring's
    ``_const_leaf_rows``); only the union-df scalar is collected
    (one count, needed as a literal in the score expression).
    """
    spark = ix.postings.sparkSession
    terms = tokenize_py(phrase)
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not terms:
        return empty
    exact, prefix = terms[:-1], terms[-1]
    uniq = list(dict.fromkeys(exact))

    srows = ix.term_stats.filter(F.col("term").isin(uniq)).collect()
    dfs = {r["term"]: int(r["df"]) for r in srows}
    if any(t not in dfs for t in uniq):
        return empty

    like = prefix.replace("\\", "\\\\").replace("%", "\\%") \
                 .replace("_", "\\_") + "%"
    pdecoded = decode_blocks_positions(
        ix.postings.filter(F.col("term").like(like))
    )
    union_df = pdecoded.select("doc_id").distinct().count()
    if union_df == 0:
        return empty
    idf_sum = float(sum(idf(ix.n_docs, dfs[t]) for t in exact)
                    + idf(ix.n_docs, union_df))

    n_slots = len(terms)
    parts = [
        pdecoded.select(
            "doc_id", "dl",
            (F.col("pos") - F.lit(n_slots - 1)).alias("adj"),
            F.lit(n_slots - 1).alias("slot"),
        )
    ]
    if exact:
        slots = spark.createDataFrame(
            [(i, t) for i, t in enumerate(exact)], "slot int, term string"
        )
        decoded = decode_blocks_positions(
            ix.postings.filter(F.col("term").isin(uniq))
        )
        parts.append(
            decoded.join(F.broadcast(slots), "term").select(
                "doc_id", "dl",
                (F.col("pos") - F.col("slot")).alias("adj"),
                "slot",
            )
        )
    adj = parts[0]
    for p in parts[1:]:
        adj = adj.unionByName(p)

    covered = (
        adj.groupBy("doc_id", "dl", "adj")
        .agg(F.countDistinct("slot").alias("n"))
        .filter((F.col("n") == n_slots) & (F.col("adj") >= 0))
    )
    freq = covered.groupBy("doc_id", "dl").agg(F.count("*").alias("ptf"))
    ptf = F.col("ptf").cast("double")
    dl = F.col("dl").cast("double")
    score = (
        F.lit(idf_sum) * ptf
        / (ptf + K1 * (1.0 - B + B * dl / F.lit(ix.avgdl)))
    )
    return freq.select("doc_id", score.alias("score"))


def phrase_prefix_topk(ix: PostingsIndex, phrase: str,
                       k: int = 10) -> DataFrame:
    """Top-k match_phrase_prefix: TakeOrdered over
    :func:`phrase_prefix_scores`."""
    return (
        phrase_prefix_scores(ix, phrase)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
