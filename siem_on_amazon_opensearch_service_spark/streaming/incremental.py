"""Incremental (streaming) index maintenance.

Reference streaming model (SURVEY.md section 2.9): at-least-once
event-driven micro-batches — one Lambda per arriving S3 object,
documents appended to the dated index; no watermarks, no stateful
ops. Spark restatement: a Structured Streaming file source feeds
``foreachBatch``; every micro-batch runs the SAME batch build
pipeline on the new documents only and appends a self-contained
delta (postings + docs + stats). Exactly-once comes from the
streaming checkpoint (committed batch ids are not re-delivered) plus
idempotent per-batch output paths — the reference gets the same
property from deterministic doc ids (siem/__init__.py:683-706);
we get it at batch granularity.

Query-time: :func:`load_incremental` unions base + deltas and
recombines corpus stats exactly (n_docs and total doc length are
additive; df per term sums across deltas because a doc lives in
exactly one delta). BM25 scores over the union are therefore
IDENTICAL to a from-scratch batch build on the full corpus — asserted
by tests/test_streaming.py.

Periodic ``compact()`` folds accumulated deltas into one merged
layout (the OpenSearch segment-merge analog) using the checkpoint
merge machinery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis import tokens_col
from ..index.build import PostingsIndex, encode_postings_df

BATCH_SHIFT = 40  # doc_id = (batch_id << 40) | row-in-batch rank


class IncrementalIndexer:
    """foreachBatch sink maintaining an append-only postings store."""

    def __init__(self, path: str, salt_threshold: int = 100_000):
        self.path = path
        self.salt_threshold = salt_threshold

    # -- the foreachBatch callable ------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.process_batch(batch_df, batch_id)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Index one micro-batch into ``delta/batch=<id>/``.

        Overwrite mode makes re-delivery of a failed batch idempotent
        (same batch id -> same path -> same deterministic ids).
        """
        from ..index.docids import assign_doc_ids, release_doc_ids

        delta = os.path.join(self.path, f"delta/batch={batch_id}")
        # dense per-batch rank via the distributed offset technique
        # (docids.py) — no single-task window even for a large batch.
        # Keep the assign_doc_ids handle: withColumn returns a new
        # object without the pinned-cache attribute.
        assigned = assign_doc_ids(batch_df, order_col="url")
        with_ids = assigned.withColumn(
            "doc_id",
            F.lit(int(batch_id)).cast("long") * (1 << BATCH_SHIFT)
            + F.col("doc_id"),
        )
        base = with_ids.select(
            "doc_id", "url", tokens_col("text").alias("_toks")
        )
        from ..plans.checkpoint import write_delta

        write_delta(base, delta)
        # delta is durable; drop the per-batch pinned id cache so
        # long-running streams don't accumulate one block per batch.
        release_doc_ids(assigned)
        spark = batch_df.sparkSession
        d = spark.read.parquet(f"{delta}/docs").agg(
            F.count("*").alias("n"), F.sum("doclen").alias("dl")
        ).collect()[0]
        spark.createDataFrame(
            [(int(d["n"] or 0), int(d["dl"] or 0))], "n_docs long, total_dl long"
        ).write.mode("overwrite").parquet(f"{delta}/stats")

    # -- maintenance ---------------------------------------------------
    def compact(self, spark: SparkSession) -> PostingsIndex:
        """Fold all deltas into ``merged/`` (segment-merge analog) via
        the shared delta-merge path (plans.checkpoint)."""
        from ..plans.checkpoint import merge_decoded_deltas

        bdirs = complete_batch_dirs(self.path)
        if not bdirs:
            raise FileNotFoundError(
                f"no complete delta batches under {self.path}")
        deltas = spark.read.parquet(*[f"{d}/postings" for d in bdirs])
        docs = spark.read.parquet(*[f"{d}/docs" for d in bdirs])
        stats = spark.read.parquet(*[f"{d}/stats" for d in bdirs]).agg(
            F.sum("n_docs").alias("n"), F.sum("total_dl").alias("dl")
        ).collect()[0]
        n_docs, total_dl = int(stats["n"] or 0), int(stats["dl"] or 0)
        return merge_decoded_deltas(
            spark, deltas, docs, n_docs, total_dl,
            os.path.join(self.path, "merged"), self.salt_threshold,
        )


def complete_batch_dirs(path: str) -> list[str]:
    """Delta batches whose write COMPLETED: the per-batch stats dir is
    written last in process_batch, so its presence is the completeness
    marker. A batch interrupted between the docs and stats writes
    would otherwise contribute scoring documents that are excluded
    from n_docs/total_dl — silently wrong BM25 that compact() would
    bake in permanently. Incomplete batches are skipped here; the
    stream's re-delivery of the same batch id overwrites the torn dir
    and heals it."""
    import glob

    dirs = sorted(glob.glob(os.path.join(path, "delta", "batch=*")))
    return [d for d in dirs if os.path.isdir(os.path.join(d, "stats"))]


def load_incremental(spark: SparkSession, path: str) -> PostingsIndex:
    """Open the live (uncompacted) view: base deltas unioned, stats
    recombined exactly. df/max_tf per term recomputed from block
    metadata only (no posting decode). Only COMPLETE batches (see
    :func:`complete_batch_dirs`) participate."""
    bdirs = complete_batch_dirs(path)
    if not bdirs:
        raise FileNotFoundError(f"no complete delta batches under {path}")
    postings = spark.read.parquet(*[f"{d}/postings" for d in bdirs])
    docs = spark.read.parquet(*[f"{d}/docs" for d in bdirs])
    stats = spark.read.parquet(*[f"{d}/stats" for d in bdirs]).agg(
        F.sum("n_docs").alias("n"), F.sum("total_dl").alias("dl")
    ).collect()[0]
    n_docs, total_dl = int(stats["n"] or 0), int(stats["dl"] or 0)
    term_stats = postings.groupBy("term").agg(
        F.sum("doc_count").alias("df"), F.max("max_tf").alias("max_tf"),
        F.max("max_impact").alias("max_impact"),
    )
    return PostingsIndex(
        docs=docs, postings=postings, term_stats=term_stats,
        n_docs=n_docs, avgdl=(total_dl / n_docs if n_docs else 0.0),
    )


def stream_build(spark: SparkSession, input_dir: str, index_path: str,
                 checkpoint_dir: str, schema: str,
                 salt_threshold: int = 100_000):
    """Wire a file-source stream into the indexer: new parquet files
    dropped into ``input_dir`` are indexed exactly once
    (availableNow trigger returns when the backlog is drained)."""
    indexer = IncrementalIndexer(index_path, salt_threshold)
    stream = (
        spark.readStream.schema(schema).parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(indexer)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
