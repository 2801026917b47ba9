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
