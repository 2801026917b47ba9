"""Streaming ingest-time dedup: survivors across micro-batches equal
the batch exact-dedup result; duplicates in later batches are dropped
by the digest state."""

import datetime as dt

import pandas as pd

from siem_on_amazon_opensearch_service_spark.streaming.dedup import (
    stream_dedup_to_parquet,
)

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _rows(specs):
    # (url, minutes_offset, text)
    return pd.DataFrame(
        [(u, BASE + dt.timedelta(minutes=m), t) for u, m, t in specs],
        columns=["url", "warc_ts", "text"])


def test_stream_dedup_equals_batch(spark, tmp_path):
    a = _rows([
        ("u0", 0, "alpha beta gamma"),
        ("u1", 1, "delta epsilon"),
        ("u2", 2, "Alpha  beta,, GAMMA"),   # dup of u0 after analysis
    ])
    b = _rows([
        ("u3", 3, "alpha beta gamma"),      # dup of u0, later batch
        ("u4", 4, "zeta eta theta"),
        ("u5", 5, "delta epsilon!"),        # dup of u1
    ])
    inp = tmp_path / "in"
    inp.mkdir()
    a.to_parquet(inp / "a.parquet", index=False,
                 coerce_timestamps="us", allow_truncated_timestamps=True)
    b.to_parquet(inp / "b.parquet", index=False,
                 coerce_timestamps="us", allow_truncated_timestamps=True)

    out = str(tmp_path / "out")
    q = stream_dedup_to_parquet(
        spark, str(inp), out, str(tmp_path / "ck"),
        "url string, warc_ts timestamp, text string")
    q.awaitTermination(120)

    kept = sorted(r["url"] for r in spark.read.parquet(out).collect())
    # one survivor per content group: {u0,u2,u3}, {u1,u5}, {u4}
    assert len(kept) == 3
    groups = [{"u0", "u2", "u3"}, {"u1", "u5"}, {"u4"}]
    for g in groups:
        assert len(g.intersection(kept)) == 1
