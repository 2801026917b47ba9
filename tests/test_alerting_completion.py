"""Stateful streaming alert monitor (applyInPandasWithState) vs its
batch twin, and the completion suggester."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.boolquery import (
    completion_suggest,
)
from siem_on_amazon_opensearch_service_spark.streaming.alerting import (
    alert_crossings_batch, run_alert_stream,
)

T0 = dt.datetime(2024, 5, 1, 12, 0, 0)
SCHEMA = "user_id long, event_type string, ts timestamp"


def mk_events():
    rows = []
    i = 0
    # user 1: 7 errors (fires, medium); user 2: 12 errors (fires,
    # high); user 3: 4 errors (below threshold); user 4: 9 clicks
    # (filtered out by the predicate entirely)
    for uid, n, etype in ((1, 7, "error"), (2, 12, "error"),
                          (3, 4, "error"), (4, 9, "click")):
        for _ in range(n):
            rows.append((uid, etype, T0 + dt.timedelta(seconds=13 * i)))
            i += 1
    return rows


@pytest.fixture(scope="module")
def alert_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("alerting")
    inp, out, chk = str(base / "in"), str(base / "out"), str(base / "chk")
    spark.createDataFrame(mk_events(), SCHEMA).coalesce(1) \
        .write.parquet(inp)
    q = run_alert_stream(
        spark, inp, out, chk, SCHEMA, threshold=5,
        predicate=F.col("event_type") == "error",
    )
    q.awaitTermination(120)
    return inp, out, chk


def test_stream_alerts_fire_on_crossing(spark, alert_dirs):
    _, out, _ = alert_dirs
    got = {r["key"]: (r["n_events"], r["severity"])
           for r in spark.read.parquet(out).collect()}
    assert got == {"1": (7, "medium"), "2": (12, "high")}


def test_stream_matches_batch_twin(spark, alert_dirs):
    inp, out, _ = alert_dirs
    ev = spark.read.parquet(inp)
    batch = {
        (r["key"], r["n_events"], r["severity"], r["alert_at"])
        for r in alert_crossings_batch(
            ev, threshold=5,
            predicate=F.col("event_type") == "error").collect()
    }
    stream = {
        (r["key"], r["n_events"], r["severity"], r["alert_at"])
        for r in spark.read.parquet(out).collect()
    }
    assert batch == stream


def test_stream_is_incremental_no_realert(spark, alert_dirs):
    # second drain with NEW events for an already-fired key: state is
    # checkpointed, so no duplicate alert for user 2; a fresh key
    # crossing now DOES alert.
    inp, out, chk_orig = alert_dirs
    extra = [(2, "error", T0 + dt.timedelta(hours=1, seconds=i))
             for i in range(3)]
    extra += [(9, "error", T0 + dt.timedelta(hours=1, minutes=5, seconds=i))
              for i in range(6)]
    spark.createDataFrame(extra, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(inp)
    q = run_alert_stream(
        spark, inp, out, chk_orig, SCHEMA, threshold=5,
        predicate=F.col("event_type") == "error",
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    keys = sorted(r["key"] for r in rows)
    assert keys == ["1", "2", "9"]  # user 2 NOT re-alerted
    nine = [r for r in rows if r["key"] == "9"][0]
    assert nine["n_events"] == 6 and nine["severity"] == "medium"


# ---------------------------------------------------------------------------
# completion suggester
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cix(spark):
    pdf = corpus.make_pages_pdf(200, seed=31)
    pdf.insert(0, "doc_id", range(len(pdf)))
    ix = build_index(spark, spark.createDataFrame(pdf), id_col="doc_id",
                     salt_threshold=40)
    ix.term_stats = ix.term_stats.persist()
    ix.term_stats.count()
    return ix, pdf


def test_completion_prefix_ranked_by_df(cix):
    ix, pdf = cix
    got = completion_suggest(ix, "w00", size=5).collect()
    from collections import Counter

    dfs = Counter()
    for t in pdf["text"]:
        dfs.update(set(tokenize_py(t)))
    exp = sorted(
        ((w, n) for w, n in dfs.items() if w.startswith("w00")),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [(r["suggestion"], r["weight"]) for r in got] == exp
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]


def test_completion_multi_token_keeps_head(cix):
    ix, _ = cix
    got = completion_suggest(ix, "alpha w00", size=3).collect()
    assert all(r["suggestion"].startswith("alpha w00") for r in got)


def test_completion_no_match_and_empty(cix):
    ix, _ = cix
    assert completion_suggest(ix, "zzzzz", size=3).count() == 0
    assert completion_suggest(ix, "...", size=3).count() == 0
