"""Distributed inverted-index build (the core artifact).

Replaces the reference's Lambda -> OpenSearch ``_bulk`` ingest path
(reference es_loader/index.py:320-397) with one declarative DataFrame
DAG whose ONLY wide dependency is the (term, salt) shuffle that
groups postings -- the Spark analog of Lucene's per-shard index build
behind the `_bulk` API.

Pipeline (see SURVEY.md section 3.1 "Spark restatement"):

  pages ──(tokenize: native lower/split/filter, codegen'd)──▶ tokens
        ──(groupBy(doc_id, term).count(): partial agg map-side,
           shuffle volume == distinct postings, the minimum)──▶ tf
        ──(broadcast-join hot-term salt map; salt = hash(doc_id) % n)
        ──(repartition(term, salt) + sortWithinPartitions + streaming
           mapInPandas encoder: delta+varbyte 128-doc blocks)──▶ postings
  docs / stats derive from the persisted tf table (one tokenize scan).

Skew: Zipfian web text makes stopword terms ~percent-of-corpus sized
(SURVEY.md section 7.3 item 2). Terms whose document frequency
exceeds ``salt_threshold`` are split into ``ceil(df/threshold)``
salt sub-keys (hash(doc_id) % n_salts), so

  * no single reducer receives an unbounded group,
  * encoder memory stays O(Arrow batch) (carry-over streaming),
  * block manifests merge back transparently at query time (salts of
    one term are doc-disjoint; queries read all salts of a term).

Postings layout: one row per 128-doc block
  (term, salt, block_id, doc_count, max_tf, max_impact,
   min_doc_id, max_doc_id,
   doc_ids_vb, tfs_vb, dls_vb)
doc ids are strictly increasing per (term, salt) and delta+varbyte
compressed (codec.py); per-posting doc length rides along varbyte'd
(the Lucene "norms" analog) so query-time scoring needs NO join back
to the docs table. ``max_tf``/``max_impact`` per block power block-max pruning
(plans/pruning.py). On disk the table is written
``repartition(term)`` + ``sortWithinPartitions(term, salt, block_id)``
so parquet row-group min/max statistics prune non-query terms.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis import tokens_col
from ..codec import vb_encode, delta_encode
from .docids import assign_doc_ids

BLOCK_SIZE = 128
DEFAULT_SALT_THRESHOLD = 100_000

POSTINGS_SCHEMA = (
    "term string, salt int, block_id int, doc_count int, max_tf int, "
    "max_impact double, min_doc_id long, max_doc_id long, "
    "doc_ids_vb binary, tfs_vb binary, dls_vb binary"
)


def clear_stale_sidecars(path: str) -> None:
    """A fresh index write IS a fresh index: remove sidecar state a
    PREVIOUS index left at this path — the tombstone set (its doc ids
    name OLD documents and would silently mask arbitrary docs of the
    new index; found live: re-saving over a deleted-from path made
    delete_by_query a no-op and masked wrong docs) and the edge-ngram
    prefix vocabulary (stale dictionary would route multi-term
    rewrites through the wrong vocabulary). Called by every full-index
    writer: ``PostingsIndex.save`` and ``checkpoint.merge_from_decoded``
    (out-of-place compaction / checkpoint merge). Iceberg analog:
    replacing the table drops its delete files."""
    import os
    import shutil

    for sub in ("tombstones", "prefix_vocab"):
        d = os.path.join(path, sub)
        if os.path.isdir(d):
            shutil.rmtree(d)
    pmeta = os.path.join(path, "prefix_meta.json")
    if os.path.isfile(pmeta):
        os.remove(pmeta)


@dataclass
class PostingsIndex:
    """Handles to the built index tables (DataFrames or loaded paths)."""

    docs: DataFrame        # doc_id, url, doclen, warc_ts, lang
    postings: DataFrame    # POSTINGS_SCHEMA
    term_stats: DataFrame  # term, df, max_tf, max_impact
    n_docs: int
    avgdl: float
    #: optional edge-ngram prefix dictionary (prefix, term) — the
    #: mapping's ``index_prefixes`` option; built/persisted by
    #: `index/sayt.py`, used transparently by the multi-term rewrite.
    prefix_vocab: DataFrame | None = None
    prefix_max_gram: int = 0

    def save(self, spark: SparkSession, path: str, buckets: int = 32) -> None:
        """Persist as parquet laid out for term-pruned scans."""
        (
            self.postings.repartition(buckets, "term")
            .sortWithinPartitions("term", "salt", "block_id")
            .write.mode("overwrite")
            .parquet(f"{path}/postings")
        )
        self.docs.write.mode("overwrite").parquet(f"{path}/docs")
        self.term_stats.write.mode("overwrite").parquet(f"{path}/term_stats")
        spark.createDataFrame(
            [(self.n_docs, self.avgdl)], "n_docs long, avgdl double"
        ).write.mode("overwrite").parquet(f"{path}/stats")
        clear_stale_sidecars(path)

    def save_bucketed(self, spark: SparkSession, table: str,
                      buckets: int = 32) -> None:
        """Persist postings as a TERM-BUCKETED table (the Iceberg
        ``bucket(term, B)`` layout): any later per-term aggregation or
        co-located merge over the table plans with ZERO exchanges —
        the bucketing carries the partitioning (pinned by
        tests/test_plan_shapes.py). Requires a metastore-backed
        catalog (saveAsTable), which is why the default ``save`` is
        plain term-repartitioned parquet."""
        (
            self.postings.write.bucketBy(buckets, "term")
            .sortBy("term", "salt", "block_id")
            .mode("overwrite")
            .saveAsTable(table)
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PostingsIndex":
        import json as _json
        import os as _os

        stats = spark.read.parquet(f"{path}/stats").collect()[0]
        pv, max_gram = None, 0
        pmeta = _os.path.join(path, "prefix_meta.json")
        if _os.path.exists(pmeta):
            with open(pmeta) as f:
                max_gram = int(_json.load(f)["max_gram"])
            pv = spark.read.parquet(f"{path}/prefix_vocab")
        return cls(
            docs=spark.read.parquet(f"{path}/docs"),
            postings=spark.read.parquet(f"{path}/postings"),
            term_stats=spark.read.parquet(f"{path}/term_stats"),
            n_docs=stats["n_docs"],
            avgdl=stats["avgdl"],
            prefix_vocab=pv,
            prefix_max_gram=max_gram,
        )


def _encode_sorted_batch(term: np.ndarray, salt: np.ndarray,
                         doc_ids: np.ndarray, tfs: np.ndarray,
                         dls: np.ndarray,
                         avgdl: float | None) -> pd.DataFrame:
    """Rows sorted by (term, salt, doc_id), COMPLETE groups only ->
    block rows. Group boundaries found with numpy (no per-group
    pandas objects).

    ``max_impact`` is the block-max of the BM25 term factor
    tf/(tf + k1(1-b+b·dl/avgdl)) — the Lucene block-max-WAND impact
    bound. When ``avgdl`` is unknown at encode time (incremental
    deltas: the GLOBAL avgdl isn't known yet, and a too-small local
    avgdl would understate the bound ⇒ unsound skipping), the dl→0
    limit tf/(tf + k1(1-b)) is stored instead — an upper bound for
    every possible avgdl. Merge/compact re-encodes with the known
    global avgdl for tight bounds.
    """
    from ..bm25 import B, K1

    tfs_f = tfs.astype(np.float64)
    if avgdl and avgdl > 0:
        impacts = tfs_f / (
            tfs_f + K1 * (1.0 - B) + K1 * B * dls.astype(np.float64) / avgdl
        )
    else:
        impacts = tfs_f / (tfs_f + K1 * (1.0 - B))

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
        d_all, t_all, l_all = doc_ids[s:e], tfs[s:e], dls[s:e]
        i_all = impacts[s:e]
        for b, bs in enumerate(range(0, e - s, BLOCK_SIZE)):
            be = min(bs + BLOCK_SIZE, e - s)
            d, tt, ll = d_all[bs:be], t_all[bs:be], l_all[bs:be]
            rows.append(
                (
                    t, sa, b, int(be - bs), int(tt.max()),
                    float(i_all[bs:be].max()),
                    int(d[0]), int(d[-1]),
                    vb_encode(delta_encode(d.astype(np.uint64))),
                    vb_encode(tt.astype(np.uint64)),
                    vb_encode(ll.astype(np.uint64)),
                )
            )
    return pd.DataFrame(
        rows,
        columns=[
            "term", "salt", "block_id", "doc_count", "max_tf", "max_impact",
            "min_doc_id", "max_doc_id", "doc_ids_vb", "tfs_vb", "dls_vb",
        ],
    )


def encode_postings_df(tf: DataFrame, num_partitions: int | None = None,
                       avgdl: float | None = None) -> DataFrame:
    """(doc_id, doclen, term, tf, salt) -> block-compressed postings.

    Physical plan: ONE shuffle (repartition by (term, salt)) + an
    in-partition sort (spillable, no per-group materialization), then
    a streaming ``mapInPandas`` encoder that slices groups with numpy
    and carries the trailing incomplete group across Arrow batches.
    This replaces a per-group ``applyInPandas`` whose pandas-object
    overhead dominated build time (~1ms x |vocabulary| groups).
    """
    parts = (
        tf.repartition(num_partitions, "term", "salt")
        if num_partitions
        else tf.repartition("term", "salt")
    )
    parts = parts.sortWithinPartitions("term", "salt", "doc_id").select(
        "term", "salt", "doc_id", "tf", "doclen"
    )

    def encode(batches):
        carry: pd.DataFrame | None = None
        for b in batches:
            if carry is not None and len(carry):
                b = pd.concat([carry, b], ignore_index=True)
            if b.empty:
                continue
            term = b["term"].to_numpy()
            salt = b["salt"].to_numpy()
            last = (term == term[-1]) & (salt == salt[-1])
            # first row index of the trailing (possibly incomplete) group
            cut = len(b) - int(last[::-1].argmin()) if not last.all() else 0
            if cut == 0:
                carry = b
                continue
            head = b.iloc[:cut]
            carry = b.iloc[cut:].reset_index(drop=True)
            yield _encode_sorted_batch(
                head["term"].to_numpy(), head["salt"].to_numpy(),
                head["doc_id"].to_numpy(np.int64),
                head["tf"].to_numpy(np.int64),
                head["doclen"].to_numpy(np.int64),
                avgdl,
            )
        if carry is not None and len(carry):
            yield _encode_sorted_batch(
                carry["term"].to_numpy(), carry["salt"].to_numpy(),
                carry["doc_id"].to_numpy(np.int64),
                carry["tf"].to_numpy(np.int64),
                carry["doclen"].to_numpy(np.int64),
                avgdl,
            )

    return parts.mapInPandas(encode, schema=POSTINGS_SCHEMA)


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    text_col: str = "text",
    id_col: str | None = None,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    shuffle_partitions: int | None = None,
    keep_cols: list[str] | None = None,
    tokenizer=None,
) -> PostingsIndex:
    """Build the index from a pages/documents DataFrame.

    ``id_col``: pre-existing long id column; if None, dense ids are
    assigned by url rank (docids.py).

    ``keep_cols``: extra source columns carried into the docs table
    (filter/agg surface, join-field layouts, multi-valued keyword
    arrays) — they ride the one tokenize scan, never a re-scan.

    ``tokenizer``: Column -> token-array Column; defaults to the shared
    core analyzer. This is the per-field-analyzer seam (OpenSearch
    mapping ``analyzer:``): pass e.g. ``analysis_ext.cjk_tokens_col``
    and query with its matching Python twin.
    """
    if id_col is None:
        pages = assign_doc_ids(pages, order_col="url")
        id_col = "doc_id"
    tokenizer = tokenizer or tokens_col

    keep = [c for c in ("url", "warc_ts", "lang") if c in pages.columns]
    for c in keep_cols or []:
        if c not in keep and c != id_col:
            keep.append(c)
    base = pages.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokenizer(F.col(text_col)).alias("_toks"),
        *keep,
    )

    # (doc, term, tf): explode + hash agg. Partial aggregation combines
    # all of a doc's duplicate terms map-side (a doc lives in one
    # partition), so shuffle bytes == distinct postings. This is the
    # ONLY tokenize scan of the corpus: doc lengths ride along, corpus
    # stats and the docs table derive from tf, never from a re-scan.
    # explode_OUTER keeps zero-token docs as a (doc_id, doclen=0,
    # term=NULL) sentinel row, so n_docs/doclen accounting is exact
    # from this one pass -- no fallback count over the source.
    # greatest(size, 0): NULL-text docs have a NULL token array, whose
    # size is -1 (legacy) or NULL (ANSI) -- either way their doclen
    # must enter the accounting as 0 (greatest skips NULLs).
    tokens = base.select(
        "doc_id",
        F.greatest(F.size("_toks"), F.lit(0)).alias("doclen"),
        F.explode_outer("_toks").alias("term"),
    )
    tf_all = tokens.groupBy("doc_id", "doclen", "term").agg(
        F.count("*").alias("tf")
    )
    # tf feeds four consumers (stats, doclen table, hot-term
    # detection, posting assembly); persist so the explode+agg pass
    # runs once. MEMORY_AND_DISK: at cluster scale this spills rather
    # than recomputing a 100 TB scan.
    tf_all = tf_all.persist(StorageLevel.MEMORY_AND_DISK)
    tf = tf_all.filter(F.col("term").isNotNull())

    # docs table (ids, presentation cols, doclen): doclen joined from
    # tf_all (one row per doc INCLUDING empty docs) -- never from a
    # source re-scan.
    doclen_tbl = tf_all.select("doc_id", "doclen").dropDuplicates(["doc_id"])
    docs = base.select("doc_id", *keep).join(doclen_tbl, "doc_id", "left")

    # corpus stats from the persisted tf pass alone:
    #   n_docs == doclen rows (sentinels included);
    #   total_dl == sum(tf) over real postings (Σ_d Σ_t tf == Σ_d dl).
    n_docs = getattr(pages, "_spark_graft_n_rows", None)
    if n_docs is None:
        n_docs = doclen_tbl.count()
    drow = tf.agg(F.sum("tf").alias("dl")).collect()[0]
    avgdl = (int(drow["dl"] or 0)) / n_docs if n_docs else 0.0

    # hot-term salt map: only the Zipf head exceeds the threshold, so
    # the map is small -> broadcast join (no skewed shuffle on term
    # alone ever happens).
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

    postings = encode_postings_df(salted, shuffle_partitions, avgdl=avgdl)

    # df per term == sum of block doc_counts (salts are doc-disjoint).
    term_stats = postings.groupBy("term").agg(
        F.sum("doc_count").alias("df"), F.max("max_tf").alias("max_tf"),
        F.max("max_impact").alias("max_impact"),
    )

    return PostingsIndex(
        docs=docs, postings=postings, term_stats=term_stats,
        n_docs=n_docs, avgdl=avgdl,
    )
