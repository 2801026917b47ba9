"""Streaming windowed aggregation — the A5 `date_histogram` dashboard
shape computed incrementally over an event stream.

The reference's ingest is at-least-once micro-batching with NO
watermarks (late events simply rewrite old dated indices,
siem/__init__.py:639-656). Structured Streaming expresses both
modes:

* :func:`windowed_counts` — event-time tumbling windows WITH a
  watermark bound on state (the streaming-native form; late data
  beyond the watermark is dropped, state is garbage-collected —
  what the reference's design gives up by not having state at all);
* append output mode writes each finalized window exactly once to
  the sink (parquet here; an Iceberg append in deployment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, ts_col: str = "ts",
                    key_col: str = "event_type",
                    window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window counts with bounded state."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def stream_windowed_counts(spark, input_dir: str, output_dir: str,
                           checkpoint_dir: str, schema: str,
                           ts_col: str = "ts", key_col: str = "event_type",
                           window: str = "1 hour", watermark: str = "2 hours"):
    """File-source stream → windowed counts → append parquet sink.
    availableNow drains the backlog and finalizes watermark-expired
    windows exactly once (checkpoint-tracked)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_counts(stream, ts_col, key_col, window, watermark)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
