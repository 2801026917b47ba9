"""Streaming ingest-time dedup: drop documents whose normalized
content hash was already seen — the dedup-at-ingest pass a crawl
pipeline runs BEFORE indexing (the batch twin is
``operators/dedup.py:exact_dedup``; the reference's analog is the
es_loader's per-doc ``_id`` derivation, which makes OpenSearch
upserts idempotent).

Spark-first: Structured Streaming's native stateful
``dropDuplicatesWithinWatermark`` keyed by the md5 content digest —
the state store holds 16-byte digests only (never text), and the
watermark bounds state size: a duplicate arriving within the horizon
is dropped exactly once; state older than the horizon is evicted
(the unbounded-state contract ``dropDuplicates`` alone would break at
100 TB/day ingest). Exactly-once emission comes from the checkpoint,
same as the other streaming entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis import tokens_sql


def content_key(text_col: str = "text"):
    """The dedup key: md5 of the analyzer-normalized token stream
    (same canonicalization as the batch exact_dedup / the exact-dup
    stats entry, so batch and stream agree on what 'duplicate'
    means)."""
    return F.md5(F.concat_ws(" ", F.expr(tokens_sql(text_col))))


def dedup_stream(stream: DataFrame, ts_col: str = "warc_ts",
                 text_col: str = "text",
                 horizon: str = "1 hour") -> DataFrame:
    """Watermarked stateful dedup over a streaming frame: keep the
    first document per content key within the watermark horizon."""
    keyed = stream.withColumn("_ck", content_key(text_col))
    return (keyed.withWatermark(ts_col, horizon)
            .dropDuplicatesWithinWatermark(["_ck"])
            .drop("_ck"))


def stream_dedup_to_parquet(spark: SparkSession, in_dir: str,
                            out_dir: str, checkpoint: str,
                            schema: str, ts_col: str = "warc_ts",
                            text_col: str = "text",
                            horizon: str = "1 hour"):
    """File-source pipeline: read parquet micro-batches, dedup, append
    survivors. Returns the started query (``availableNow`` so tests
    and backfills drain the source then stop)."""
    stream = (spark.readStream.schema(schema).parquet(in_dir))
    deduped = dedup_stream(stream, ts_col, text_col, horizon)
    return (deduped.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())
