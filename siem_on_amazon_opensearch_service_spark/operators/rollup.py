"""Index rollup jobs + transparent query rewriting (the OpenSearch
Index Management *rollup* feature: a continuous job pre-aggregates a
source index into a compact rollup index of time+dimension buckets,
and search requests whose group-by is a COARSENING of the rollup's
are answered from the rollup instead of the raw docs).

Reference surface: the SIEM stack rotates raw log indexes through ISM
policies (deploy_es/data.ini:67-78 rollover) and its dashboards are
almost entirely date_histogram × terms rollups — exactly the query
class a rollup index answers without touching raw documents.

Spark-first restatement and the 100 TB story:

* ``rollup_build`` is ONE partial+final hash aggregate over the raw
  table (the only pass that ever sees raw data); the result is
  buckets × dims rows — GB-scale from a 100 TB source. Persist it
  partitioned by the time bucket and every dashboard query after that
  is a scan of kilobytes.
* Re-aggregation correctness is the algebraic-aggregate rule: sum and
  count re-sum, min/max re-min/re-max, and avg is NOT stored — it is
  recombined as sum/count at query time (storing avg would make
  coarsening wrong; same rule OpenSearch applies).
* ``rollup_answer`` checks the query is answerable (interval is an
  integer multiple, dims ⊆ rollup dims, metrics derivable) and emits
  the rewritten aggregation over the rollup — the decision is
  metadata-only, no data touched.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metric kinds the rollup stores; avg is derived (sum/count).
_STORED = ("sum", "min", "max")


@dataclass(frozen=True)
class RollupSpec:
    """A rollup job definition: time bucket + dimensions + metrics."""
    ts_col: str
    interval_seconds: int
    dims: tuple[str, ...] = ()
    metric_cols: tuple[str, ...] = field(default=())

    def bucket(self):  # floor-of-epoch bucket start, in seconds
        e = F.col(self.ts_col).cast("timestamp").cast("long")
        return (F.floor(e / self.interval_seconds)
                * self.interval_seconds).alias("rollup_ts")


def rollup_build(df: DataFrame, spec: RollupSpec) -> DataFrame:
    """Materialize the rollup index: one row per (time bucket, dims)
    with doc count plus sum/min/max per metric column. Single shuffle
    on the bucket key; write ``partitionBy('rollup_ts')`` (or a date
    derived from it) so queries prune by time."""
    aggs = [F.count("*").alias("rollup_count")]
    for m in spec.metric_cols:
        aggs += [F.sum(m).alias(f"{m}__sum"), F.min(m).alias(f"{m}__min"),
                 F.max(m).alias(f"{m}__max"),
                 F.count(m).alias(f"{m}__value_count")]
    return df.groupBy(spec.bucket(), *spec.dims).agg(*aggs)


def rollup_supports(spec: RollupSpec, interval_seconds: int,
                    dims: list[str], metrics: list[tuple[str, str]]) -> bool:
    """Metadata-only answerability check: the requested interval must
    be an integer multiple of the stored one, requested dims a subset
    of stored dims, and every requested metric derivable (count / avg
    from count+sum; sum/min/max from themselves)."""
    if interval_seconds % spec.interval_seconds:
        return False
    if not set(dims) <= set(spec.dims):
        return False
    for col, kind in metrics:
        if kind == "count":
            continue
        if col not in spec.metric_cols:
            return False
        if kind not in _STORED + ("avg",):
            return False
    return True


def rollup_answer(rollup: DataFrame, spec: RollupSpec,
                  interval_seconds: int, dims: list[str],
                  metrics: list[tuple[str, str]]) -> DataFrame:
    """Rewrite a (date_histogram × terms × metrics) aggregation to run
    over the rollup index. Output columns: ``bucket_ts`` (epoch
    seconds of the coarse bucket start), the requested dims, and one
    ``{col}_{kind}`` column per metric (``_count`` uses col ''). The
    caller must have checked :func:`rollup_supports`."""
    if not rollup_supports(spec, interval_seconds, dims, metrics):
        raise ValueError("query not answerable from this rollup")
    coarse = (F.floor(F.col("rollup_ts") / interval_seconds)
              * interval_seconds).alias("bucket_ts")
    aggs = []
    for col, kind in metrics:
        name = f"{col}_{kind}" if col else f"_{kind}"
        if kind == "count":
            aggs.append(F.sum("rollup_count").alias(name or "_count"))
        elif kind == "sum":
            aggs.append(F.sum(f"{col}__sum").alias(name))
        elif kind == "min":
            aggs.append(F.min(f"{col}__min").alias(name))
        elif kind == "max":
            aggs.append(F.max(f"{col}__max").alias(name))
        elif kind == "avg":
            # recombined from sum + value_count (null-aware, same as
            # the OpenSearch rollup response) — never a stored avg.
            aggs.append((F.sum(f"{col}__sum")
                         / F.sum(f"{col}__value_count")).alias(name))
    return rollup.groupBy(coarse, *dims).agg(*aggs)


# ---------------------------------------------------------------------------
# continuous mode (the OpenSearch rollup/transform job's incremental sync)
# ---------------------------------------------------------------------------

def _merge_exprs(spec: RollupSpec) -> list:
    """Algebraic re-aggregation of rollup rows themselves: counts and
    sums re-sum, min/max re-min/re-max. avg is never stored, so the
    merge is exact (the same rule rollup_answer relies on)."""
    aggs = [F.sum("rollup_count").alias("rollup_count")]
    for m in spec.metric_cols:
        aggs += [F.sum(f"{m}__sum").alias(f"{m}__sum"),
                 F.min(f"{m}__min").alias(f"{m}__min"),
                 F.max(f"{m}__max").alias(f"{m}__max"),
                 F.sum(f"{m}__value_count").alias(f"{m}__value_count")]
    return aggs


def rollup_sync(source: DataFrame, spec: RollupSpec, path: str) -> dict:
    """One continuous-mode sync pass: aggregate ONLY source rows newer
    than the stored watermark and merge them into the rollup at
    ``path`` (temp-sibling + atomic swap, like compaction). The
    watermark is the max source timestamp already rolled up, kept in
    ``{path}/_sync.json``; OpenSearch's continuous rollup/transform
    jobs checkpoint new source documents the same way.

    Scale shape: the delta aggregation touches only new data (at 100 TB
    the daily append, not the history — push the watermark predicate
    into the scan so partition pruning on the time column applies);
    the merge re-aggregates stored-rollup rows, which are bucket-scale,
    never raw-doc-scale. Returns {"new_rows": n, "watermark": ts}.

    Late-data caveat (same as the OpenSearch continuous job): rows
    arriving later WITH a timestamp at or before the watermark are
    missed — schedule syncs against an ingest-time column, or lag the
    source by the pipeline's allowed lateness, when the event-time
    column can run behind.
    """
    import json
    import os
    import shutil

    spark = source.sparkSession
    manifest = os.path.join(path, "_sync.json")
    data_dir = os.path.join(path, "data")
    tmp = os.path.join(path, "_data.sync.tmp")
    # crash recovery: the swap below removes data/ then renames tmp
    # in. A crash between the two leaves the ONLY copy of the rollup
    # history under tmp (the manifest watermark is still old, so a
    # blind retry would rebuild from the delta alone and lose the
    # history). data/ missing + tmp present can only mean that state
    # — adopt tmp; tmp present alongside data/ is a torn write from a
    # crash during the tmp write — discard it.
    if os.path.isdir(tmp):
        if not os.path.isdir(data_dir):
            os.replace(tmp, data_dir)
        else:
            shutil.rmtree(tmp)
    state = (json.load(open(manifest))
             if os.path.exists(manifest) else {"watermark": None})
    ts = F.col(spec.ts_col).cast("timestamp")
    delta = (source if state["watermark"] is None
             else source.filter(ts > F.lit(state["watermark"])
                                .cast("timestamp")))
    hi_row = delta.agg(F.max(ts).cast("string").alias("hi"),
                       F.count("*").alias("n")).collect()[0]
    if not hi_row["n"]:
        return {"new_rows": 0, "watermark": state["watermark"]}
    fresh = rollup_build(delta, spec)
    if os.path.isdir(data_dir):
        merged = (spark.read.parquet(data_dir).unionByName(fresh)
                  .groupBy("rollup_ts", *spec.dims).agg(*_merge_exprs(spec)))
    else:
        merged = fresh
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(data_dir):
        shutil.rmtree(data_dir)
    os.replace(tmp, data_dir)
    state = {"watermark": hi_row["hi"]}
    os.makedirs(path, exist_ok=True)
    with open(manifest, "w") as f:
        json.dump(state, f)
    return {"new_rows": int(hi_row["n"]), "watermark": state["watermark"]}


def rollup_read(spark, path: str) -> DataFrame:
    import os

    return spark.read.parquet(os.path.join(path, "data"))
