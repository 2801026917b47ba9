"""Time-rotated indices: the reference's dated-index naming +
alias-query semantics.

Reference behavior: every document routes to a dated index
(``log-aws-cloudtrail-2020-12`` -- daily/weekly/monthly/yearly
rotation, reference siem/__init__.py:617-656), and queries address an
alias that fans out over the indices covering the requested date
range. SURVEY.md section 1.4 maps this to partitioned tables.

Spark restatement: one self-contained index delta per period
(``delta/batch=<ordinal>/`` via the streaming indexer's append path),
a JSON manifest mapping ordinal -> period label, and a range loader
that opens ONLY the periods intersecting [start, end] -- directory-
level partition pruning: postings of out-of-range periods are never
listed, let alone read. Corpus stats (n_docs, total_dl) and per-term
df recombine exactly over the selected periods (a doc lives in
exactly one period), so BM25 over the selection equals a from-scratch
build over those periods' documents -- the same property OpenSearch
gives a dated-alias query (per-index stats aggregated by the
coordinating node).

On Iceberg: the period is ``months(warc_ts)`` partitioning and the
range loader is a partition predicate.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import PostingsIndex

PERIOD_FMTS = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "year": "yyyy"}


def _manifest_path(path: str) -> str:
    return os.path.join(path, "periods.json")


def build_rotated(
    spark: SparkSession,
    pages: DataFrame,
    path: str,
    period: str = "month",
    ts_col: str = "warc_ts",
    salt_threshold: int = 100_000,
) -> list[str]:
    """Build one index delta per time period of ``ts_col``. Returns
    the sorted period labels. Periods are metadata-sized (one per
    day/month/year of data), so the driver loop is fine; each period's
    build is the full distributed pipeline."""
    from ..streaming.incremental import IncrementalIndexer

    fmt = PERIOD_FMTS[period]
    tagged = pages.withColumn("_period", F.date_format(ts_col, fmt))
    labels = [
        r["_period"] for r in tagged.select("_period").distinct().collect()
    ]
    if any(p is None for p in labels):
        # a NULL ts would silently route docs to no period (or crash
        # the sort) -- surface it as the data error it is.
        raise ValueError(
            f"build_rotated: column {ts_col!r} contains NULL timestamps; "
            "repair or filter them before rotation"
        )
    periods = sorted(labels)
    indexer = IncrementalIndexer(path, salt_threshold)
    for i, p in enumerate(periods):
        indexer.process_batch(
            tagged.filter(F.col("_period") == p).drop("_period"), i
        )
        # stamp the label INTO the batch dir: a rebuild over an
        # existing rotated path with a SHIFTED label set (new earlier
        # period, crash mid-loop) would otherwise leave periods.json
        # mapping ordinals to dirs that now hold a different period's
        # documents — load_rotated verifies the stamp and fails loudly
        # on the torn state instead of silently returning wrong docs.
        with open(os.path.join(path, f"delta/batch={i}", "period.json"),
                  "w") as f:
            json.dump({"label": p, "period": period}, f)
    os.makedirs(path, exist_ok=True)
    with open(_manifest_path(path), "w") as f:
        json.dump({"period": period, "labels": periods}, f, indent=1)
    return periods


def choose_periods(path: str, start: str | None = None,
                   end: str | None = None) -> list[tuple[int, str]]:
    """Resolve the (batch ordinal, label) periods whose label lies in
    [start, end] (inclusive). Prefix-compare so a bound more precise
    than the rotation granularity keeps its boundary period:
    start='2020-12-15' over month labels truncates to '2020-12' (the
    period CONTAINING the bound is in range), and end='2020' over
    month labels compares the label's year prefix ('through 2020'
    keeps every 2020 month)."""
    with open(_manifest_path(path)) as f:
        manifest = json.load(f)
    labels: list[str] = manifest["labels"]
    chosen = [
        (i, p)
        for i, p in enumerate(labels)
        if (start is None or p >= start[: len(p)])
        and (end is None or p[: len(end)] <= end)
    ]
    if not chosen:
        raise ValueError(
            f"no index periods in range [{start}, {end}]; have {labels}"
        )
    return chosen


def load_rotated(
    spark: SparkSession,
    path: str,
    start: str | None = None,
    end: str | None = None,
) -> PostingsIndex:
    """Open the union of period indices whose label lies in
    [start, end] (inclusive; zero-padded labels make string comparison
    the date comparison). Only those periods' directories are touched.
    """
    chosen = choose_periods(path, start, end)
    for i, label in chosen:
        stamp = os.path.join(path, f"delta/batch={i}", "period.json")
        if os.path.exists(stamp):
            with open(stamp) as f:
                actual = json.load(f).get("label")
            if actual != label:
                raise RuntimeError(
                    f"rotated store {path} is torn: manifest maps "
                    f"batch {i} to period {label!r} but the dir holds "
                    f"{actual!r} (interrupted rebuild with a shifted "
                    "label set) — rebuild the rotated store")
    post_dirs = [f"{path}/delta/batch={i}/postings" for i, _ in chosen]
    doc_dirs = [f"{path}/delta/batch={i}/docs" for i, _ in chosen]
    stat_dirs = [f"{path}/delta/batch={i}/stats" for i, _ in chosen]

    postings = spark.read.parquet(*post_dirs)
    docs = spark.read.parquet(*doc_dirs)
    srow = spark.read.parquet(*stat_dirs).agg(
        F.sum("n_docs").alias("n"), F.sum("total_dl").alias("dl")
    ).collect()[0]
    n_docs, total_dl = int(srow["n"] or 0), int(srow["dl"] or 0)
    term_stats = postings.groupBy("term").agg(
        F.sum("doc_count").alias("df"), F.max("max_tf").alias("max_tf"),
        F.max("max_impact").alias("max_impact"),
    )
    return PostingsIndex(
        docs=docs, postings=postings, term_stats=term_stats,
        n_docs=n_docs, avgdl=(total_dl / n_docs if n_docs else 0.0),
    )
