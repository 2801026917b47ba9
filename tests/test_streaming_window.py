"""Streaming windowed aggregation: results equal the batch
date-histogram; watermark finalizes windows exactly once."""

import datetime as dt

import pandas as pd

from siem_on_amazon_opensearch_service_spark.streaming.windowed import (
    stream_windowed_counts, windowed_counts,
)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(n):
    rows = []
    for i in range(n):
        rows.append(
            (BASE + dt.timedelta(minutes=7 * i), "click" if i % 3 else "view")
        )
    return pd.DataFrame(rows, columns=["ts", "event_type"])


def test_stream_equals_batch(spark, tmp_path):
    pdf = _events(200)   # ~23 hours of events
    inp = tmp_path / "in"
    inp.mkdir()
    pdf.iloc[:120].to_parquet(inp / "a.parquet", index=False,
                              coerce_timestamps="us",
                              allow_truncated_timestamps=True)
    pdf.iloc[120:].to_parquet(inp / "b.parquet", index=False,
                              coerce_timestamps="us",
                              allow_truncated_timestamps=True)

    out = str(tmp_path / "out")
    q = stream_windowed_counts(
        spark, str(inp), out, str(tmp_path / "ck"),
        "ts timestamp, event_type string",
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    batch_df = spark.createDataFrame(pdf)
    exp_all = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in windowed_counts(batch_df).collect()
    }
    # append mode emits only watermark-finalized windows: everything
    # except the tail windows within the 2h watermark of max ts.
    max_ts = pdf["ts"].max()
    horizon = max_ts - dt.timedelta(hours=2)
    exp_final = {
        k: v for k, v in exp_all.items()
        if k[0] + dt.timedelta(hours=1) <= horizon
    }
    for k, v in exp_final.items():
        assert got.get(k) == v, k
    # nothing emitted that batch doesn't agree with
    for k, v in got.items():
        assert exp_all[k] == v
