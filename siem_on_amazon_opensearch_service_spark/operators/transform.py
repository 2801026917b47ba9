"""Index Transforms plugin (`_plugins/_transform`) — the rollup's
pivot-shaped sibling: a transform job groups a source index by
arbitrary pivot dimensions (``terms`` / ``histogram`` /
``date_histogram``) and materializes chosen aggregations into a
compact derived index that dashboards query directly.

Reference surface: OpenSearch Index Management transforms (the SIEM
stack's data.ini ISM/rollup config is the same plugin family; the
transform API is its generalization to non-time-leading pivots).

Contrast with ``operators/rollup.py`` — the two are deliberately
different, matching the plugins' real semantics:

* A **rollup** is time-leading and merges *algebraically* in
  continuous mode (counts/sums re-sum), so it can never store an avg.
* A **transform** stores FINAL aggregation values (avg, value_count,
  anything) because its continuous mode RECOMPUTES every bucket that
  new documents touch, from source, rather than merging: the plugin
  tracks which pivot-key buckets are modified since the last
  checkpoint and re-runs the full aggregation for exactly those
  buckets. Late data with a fresh pivot key is therefore picked up
  correctly (no rollup-style watermark caveat for the *bucket*
  dimension — only the change-detection column itself must advance).

Scale shape at 100 TB:

* ``transform_build`` is ONE partial+final hash aggregate — the only
  raw-data pass; output is pivot-cardinality rows.
* ``transform_sync`` aggregates the post-watermark delta once to find
  the changed pivot keys (delta-sized), then recomputes ONLY those
  buckets' source rows via a left-semi join on the pivot key. When
  the pivot includes a date_histogram of the watermark column (the
  overwhelmingly common shape), that semi-join collapses to time
  partition pruning — recent partitions only. The stored-side merge
  is an anti-join over bucket rows, never raw docs.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["TransformSpec", "transform_build", "transform_sync",
           "transform_read"]


@dataclass(frozen=True)
class TransformSpec:
    """A transform job: pivot groups + aggregations.

    groups: tuple of (field, kind, interval) — kind in ``terms`` |
    ``histogram`` | ``date_histogram``; interval ignored for terms
    (seconds for date_histogram, numeric width for histogram).
    aggs: tuple of (field, kind) — kind in ``sum`` | ``min`` | ``max``
    | ``avg`` | ``value_count`` (plus the implicit doc count).
    ts_col: change-detection column for continuous mode (the
    transform API's ``continuous`` checkpoint field).
    """

    groups: tuple[tuple[str, str, float | None], ...]
    aggs: tuple[tuple[str, str], ...] = field(default=())
    ts_col: str | None = None

    def group_cols(self) -> list[Column]:
        cols = []
        for fld, kind, interval in self.groups:
            if kind == "terms":
                cols.append(F.col(fld).alias(fld))
            elif kind == "histogram":
                step = float(interval)
                v = F.col(fld).cast("double")
                cols.append((F.floor(v / step) * step)
                            .alias(f"{fld}_hist"))
            elif kind == "date_histogram":
                step = int(interval)
                e = F.col(fld).cast("timestamp").cast("long")
                cols.append((F.floor(e / step) * step)
                            .alias(f"{fld}_bucket"))
            else:
                raise ValueError(f"unknown transform group kind {kind!r}")
        return cols

    def group_names(self) -> list[str]:
        names = []
        for fld, kind, _ in self.groups:
            names.append(fld if kind == "terms"
                         else f"{fld}_hist" if kind == "histogram"
                         else f"{fld}_bucket")
        return names

    def agg_cols(self) -> list[Column]:
        fns = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg,
               "value_count": F.count}
        out = [F.count("*").alias("transform_count")]
        for fld, kind in self.aggs:
            if kind not in fns:
                raise ValueError(f"unknown transform agg kind {kind!r}")
            out.append(fns[kind](fld).alias(f"{fld}__{kind}"))
        return out


def transform_build(df: DataFrame, spec: TransformSpec) -> DataFrame:
    """Full (non-continuous) transform execution: one partial+final
    hash aggregate over the source; output rows = pivot buckets with
    FINAL metric values (avg stored as avg — legal here, see module
    docstring)."""
    return df.groupBy(*spec.group_cols()).agg(*spec.agg_cols())


def transform_sync(source: DataFrame, spec: TransformSpec,
                   path: str) -> dict:
    """One continuous-mode pass: detect pivot buckets touched by rows
    newer than the checkpoint, recompute exactly those buckets from
    source, and splice them into the stored transform (temp sibling +
    atomic swap, the repo-wide mutation idiom).

    Equivalence contract (pinned by tests): any sequence of syncs over
    a growing source equals one ``transform_build`` over the final
    source — including non-algebraic metrics like avg, which is the
    property the rollup's merge cannot offer.
    """
    if spec.ts_col is None:
        raise ValueError("continuous transform needs spec.ts_col")
    spark = source.sparkSession
    manifest = os.path.join(path, "_sync.json")
    data_dir = os.path.join(path, "data")
    tmp = os.path.join(path, "_data.sync.tmp")
    # crash recovery (same swap window as rollup_sync/startree_sync):
    # a crash between rmtree(data) and rename(tmp) strands the only
    # copy of the UNCHANGED buckets under tmp — a blind retry would
    # keep only the recomputed ones. Adopt a stranded tmp; discard a
    # torn one next to intact data.
    if os.path.isdir(tmp):
        if not os.path.isdir(data_dir):
            os.replace(tmp, data_dir)
        else:
            shutil.rmtree(tmp)
    state = (json.load(open(manifest))
             if os.path.exists(manifest) else {"checkpoint": None})
    ts = F.col(spec.ts_col).cast("timestamp")
    delta = (source if state["checkpoint"] is None
             else source.filter(ts > F.lit(state["checkpoint"])
                                .cast("timestamp")))
    hi_row = delta.agg(F.max(ts).cast("string").alias("hi"),
                       F.count("*").alias("n")).collect()[0]
    if not hi_row["n"]:
        return {"changed_buckets": 0, "checkpoint": state["checkpoint"]}

    names = spec.group_names()
    # changed pivot keys: aggregate the DELTA only (delta-sized, one
    # job). distinct == groupBy on the bucket exprs.
    changed = delta.select(*spec.group_cols()).distinct()
    # recompute the touched buckets from FULL source: semi-join on the
    # pivot key. With a date_histogram pivot on ts_col this predicate
    # prunes to recent time partitions; elsewhere it is one shuffle of
    # key-matched rows (bounded by the buckets' own traffic). Derived
    # bucket columns are ADDED (a terms pivot's name already IS the
    # source column — re-selecting it would duplicate the name).
    keyed = source
    for col, name in zip(spec.group_cols(), names):
        if name not in keyed.columns:
            keyed = keyed.withColumn(name, col)
    touched = keyed.join(changed, names, "left_semi")
    recomputed = touched.groupBy(*[F.col(n) for n in names]) \
                        .agg(*spec.agg_cols())

    if os.path.isdir(data_dir):
        kept = spark.read.parquet(data_dir).join(changed, names,
                                                 "left_anti")
        merged = kept.unionByName(recomputed)
    else:
        merged = recomputed
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(data_dir):
        shutil.rmtree(data_dir)
    os.replace(tmp, data_dir)
    n_changed = changed.count()
    os.makedirs(path, exist_ok=True)
    with open(manifest, "w") as f:
        json.dump({"checkpoint": hi_row["hi"]}, f)
    return {"changed_buckets": int(n_changed), "checkpoint": hi_row["hi"]}


def transform_read(spark, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "data"))
