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
        ──(groupBy(term, salt).applyInPandas: sort by doc_id,
           delta+varbyte encode into 128-doc blocks)──▶ postings
  docs   = map-side only: doc_id, url, doclen = size(tokens)
  stats  = single-row corpus aggregate (N, avgdl, n_terms)

Skew: Zipfian web text makes stopword terms ~percent-of-corpus sized
(SURVEY.md section 7.3 item 2). Terms whose document frequency
exceeds ``salt_threshold`` are split into ``ceil(df/threshold)``
salt sub-keys (hash(doc_id) % n_salts), so

  * no single reducer receives an unbounded group,
  * ``applyInPandas`` per-group memory stays O(salt_threshold),
  * block manifests merge back transparently at query time (salts of
    one term are doc-disjoint; queries read all salts of a term).

Postings layout: one row per 128-doc block
  (term, salt, block_id, doc_count, max_tf, min_doc_id, max_doc_id,
   doc_ids_vb, tfs_vb, dls_vb)
doc ids are strictly increasing per (term, salt) and delta+varbyte
compressed (codec.py); per-posting doc length rides along varbyte'd
(the Lucene "norms" analog) so query-time scoring needs NO join back
to the docs table. ``max_tf`` per block powers block-max pruning
(plans/pruning.py). On disk the table is written
``repartition(term)`` + ``sortWithinPartitions(term, salt, block_id)``
so parquet row-group min/max statistics prune non-query terms.
"""

from __future__ import annotations

import math
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
    "min_doc_id long, max_doc_id long, "
    "doc_ids_vb binary, tfs_vb binary, dls_vb binary"
)


@dataclass
class PostingsIndex:
    """Handles to the built index tables (DataFrames or loaded paths)."""

    docs: DataFrame        # doc_id, url, doclen, warc_ts, lang
    postings: DataFrame    # POSTINGS_SCHEMA
    term_stats: DataFrame  # term, df, max_tf
    n_docs: int
    avgdl: float

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

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PostingsIndex":
        stats = spark.read.parquet(f"{path}/stats").collect()[0]
        return cls(
            docs=spark.read.parquet(f"{path}/docs"),
            postings=spark.read.parquet(f"{path}/postings"),
            term_stats=spark.read.parquet(f"{path}/term_stats"),
            n_docs=stats["n_docs"],
            avgdl=stats["avgdl"],
        )


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (term, salt) group -> block rows. Vectorized numpy inside."""
    term = pdf["term"].iloc[0]
    salt = int(pdf["salt"].iloc[0])
    order = np.argsort(pdf["doc_id"].values, kind="stable")
    doc_ids = pdf["doc_id"].values[order].astype(np.int64)
    tfs = pdf["tf"].values[order].astype(np.int64)
    dls = pdf["doclen"].values[order].astype(np.int64)

    n = len(doc_ids)
    rows = []
    for b, start in enumerate(range(0, n, BLOCK_SIZE)):
        end = min(start + BLOCK_SIZE, n)
        d, t, l = doc_ids[start:end], tfs[start:end], dls[start:end]
        rows.append(
            (
                term,
                salt,
                b,
                int(end - start),
                int(t.max()),
                int(d[0]),
                int(d[-1]),
                vb_encode(delta_encode(d.astype(np.uint64))),
                vb_encode(t.astype(np.uint64)),
                vb_encode(l.astype(np.uint64)),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "term", "salt", "block_id", "doc_count", "max_tf",
            "min_doc_id", "max_doc_id", "doc_ids_vb", "tfs_vb", "dls_vb",
        ],
    )


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    text_col: str = "text",
    id_col: str | None = None,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    shuffle_partitions: int | None = None,
) -> PostingsIndex:
    """Build the index from a pages/documents DataFrame.

    ``id_col``: pre-existing long id column; if None, dense ids are
    assigned by url rank (docids.py).
    """
    if id_col is None:
        pages = assign_doc_ids(pages, order_col="url")
        id_col = "doc_id"

    keep = [c for c in ("url", "warc_ts", "lang") if c in pages.columns]
    base = pages.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(text_col).alias("_toks"),
        *keep,
    )

    # docs table: narrow (no shuffle) -- doclen computed from the same
    # shared analyzer expression used for postings.
    docs = base.select(
        "doc_id", *keep, F.size("_toks").alias("doclen")
    )

    # (doc, term, tf): explode + hash agg. Partial aggregation combines
    # all of a doc's duplicate terms map-side (a doc lives in one
    # partition), so shuffle bytes == distinct postings.
    tokens = base.select(
        "doc_id", F.size("_toks").alias("doclen"), F.explode("_toks").alias("term")
    )
    tf = tokens.groupBy("doc_id", "doclen", "term").agg(
        F.count("*").alias("tf")
    )
    # tf feeds two consumers (hot-term detection + posting assembly);
    # persist so the explode+agg pass runs once. MEMORY_AND_DISK: at
    # cluster scale this spills rather than recomputing a 100 TB scan.
    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)

    # corpus stats (single tiny row)
    srow = docs.agg(
        F.count("*").alias("n_docs"), F.avg("doclen").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(srow["n_docs"]), float(srow["avgdl"] or 0.0)

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

    if shuffle_partitions:
        salted = salted.repartition(shuffle_partitions, "term", "salt")

    postings = salted.groupBy("term", "salt").applyInPandas(
        _encode_group, schema=POSTINGS_SCHEMA
    )

    # df per term == sum of block doc_counts (salts are doc-disjoint).
    term_stats = postings.groupBy("term").agg(
        F.sum("doc_count").alias("df"), F.max("max_tf").alias("max_tf")
    )

    return PostingsIndex(
        docs=docs, postings=postings, term_stats=term_stats,
        n_docs=n_docs, avgdl=avgdl,
    )
