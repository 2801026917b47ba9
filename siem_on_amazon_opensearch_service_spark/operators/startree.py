"""Star-tree index: pre-aggregated dimension cube for aggregation
acceleration (the OpenSearch 2.18 star-tree index / Lucene
composite-index preview; reference workloads are dashboards whose
visualizations are overwhelmingly terms/date_histogram buckets +
algebraic metrics over the same few fields -- exactly what a star
tree answers without touching documents).

Spark-first shape
-----------------
* **Build** = ONE ``df.cube(*dims).agg(...)`` -- Catalyst's Expand
  operator emits the 2^d grouping sets map-side and the partial hash
  aggregate collapses them before the single shuffle, so the exchange
  carries bucket rows (<= prod over dims of (cardinality+1)), never
  documents.  Only ALGEBRAIC metrics are materialized (sum / min /
  max / value_count; avg derives as sum/count at query time) -- the
  same restriction the real star-tree has, because only algebraic
  stats merge when buckets re-combine.
* **Layout**: persisted ``partitionBy("_gid")`` where ``_gid`` is
  ``grouping_id()`` (bit=1 <=> that dim rolled up, leftmost dim =
  most significant bit).  A query needing dim subset S reads exactly
  one ``_gid`` value -> parquet PARTITION PRUNING; at 100 TB a
  terms-by-one-dim query scans one directory of bucket rows, not the
  corpus and not even the rest of the cube.
* **Query** = filter the one gid's rows on the WHERE dims, then
  re-aggregate with each metric's MERGE op (sum of sums, min of mins,
  sum of counts) grouped by the requested dims -- metadata-sized
  work, zero document I/O.  ``startree_route`` inspects an OpenSearch
  search body and answers it from the cube when the query is
  dim-only and every agg is a covered terms/date_histogram bucket
  with algebraic metric sub-aggs; anything else returns None and the
  caller falls back to the ordinary ``search_body`` path.

Null semantics: within a gid, a retained dim's NULL is a genuine
null key (the grouping bit, not the value, says whether the dim is
rolled up) -- so null buckets survive the cube exactly like a
groupBy's.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: metric kind -> (build agg over raw docs, merge agg over cube rows)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "value_count": (F.count, F.sum),
}


#: OpenSearch calendar-interval aliases -> Spark date_trunc units.
#: date_trunc returns NULL for unknown fmt strings, so passing "1d"
#: through verbatim would silently collapse the dimension -- normalize
#: here and REJECT anything unrecognized.
_CAL_UNITS = {
    "minute": "minute", "1m": "minute", "m": "minute",
    "hour": "hour", "1h": "hour", "h": "hour",
    "day": "day", "1d": "day", "d": "day",
    "week": "week", "1w": "week", "w": "week",
    "month": "month", "1M": "month", "M": "month",
    "quarter": "quarter", "1q": "quarter", "q": "quarter",
    "year": "year", "1y": "year", "y": "year",
}


def _cal_unit(interval: str) -> str:
    unit = _CAL_UNITS.get(str(interval))
    if unit is None:
        raise ValueError(
            f"unsupported calendar_interval {interval!r} "
            f"(have {sorted(set(_CAL_UNITS.values()))} and their "
            "1x aliases)")
    return unit


def _dim_name(d) -> str:
    if isinstance(d, dict):
        spec = d["date_histogram"]
        return spec.get(
            "name", f"{spec['field']}__{_cal_unit(spec['calendar_interval'])}")
    return str(d)


def _dim_col(d):
    """A dim is a column name or a calendar-bucket derivation
    ``{"date_histogram": {"field", "calendar_interval"}}`` (the star
    tree's date dimension)."""
    if isinstance(d, dict):
        spec = d["date_histogram"]
        return F.date_trunc(
            _cal_unit(spec["calendar_interval"]), F.col(spec["field"]))
    return F.col(d)


@dataclass
class StarTree:
    cube: DataFrame          # dim cols + _gid + doc_count + metrics
    dims: list[str]          # resolved dim column names, cube order
    metrics: dict[str, list[str]]   # field -> materialized kinds
    date_dims: dict[str, str]       # dim name -> calendar_interval
    dim_specs: list | None = None   # build-time dims (for sync)
    watermark: object = None        # high-water mark (for sync)

    def gid_for(self, needed: set[str]) -> int:
        """The grouping_id whose rows retain exactly ``needed`` dims
        (leftmost dim = most significant bit; bit set = rolled up)."""
        unknown = needed - set(self.dims)
        if unknown:
            raise KeyError(f"not star-tree dims: {sorted(unknown)}")
        n = len(self.dims)
        return sum(1 << (n - 1 - i) for i, d in enumerate(self.dims)
                   if d not in needed)

    def save(self, path: str, watermark=None) -> None:
        """Layout: bucket rows under ``{path}/data`` partitioned by
        ``_gid`` (the query path's partition pruning), metadata as a
        plain JSON file -- the shape :func:`startree_sync` maintains
        with temp-sibling + atomic swap."""
        import json
        import os

        (self.cube.write.mode("overwrite").partitionBy("_gid")
         .parquet(os.path.join(path, "data")))
        if watermark is not None:
            self.watermark = watermark
        meta = {"dims": self.dims, "metrics": self.metrics,
                "date_dims": self.date_dims,
                "dim_specs": self.dim_specs,
                "watermark": _wm_json(self.watermark)}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "StarTree":
        import json
        import os

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return cls(spark.read.parquet(os.path.join(path, "data")),
                   meta["dims"],
                   {k: list(v) for k, v in meta["metrics"].items()},
                   dict(meta["date_dims"]),
                   meta.get("dim_specs"), meta.get("watermark"))


def _wm_json(wm):
    """Watermarks serialize as ISO strings (timestamps) or pass
    through (numbers/strings); comparison back in Spark relies on the
    string form casting cleanly."""
    import datetime

    if isinstance(wm, datetime.datetime):
        return wm.isoformat(sep=" ")
    return wm


def startree_build(docs: DataFrame, dims: list,
                   metrics: dict[str, list[str]]) -> StarTree:
    """Materialize the cube.  ``dims``: column names and/or
    date_histogram dim specs (keep d small -- Expand multiplies input
    rows by 2^d before the map-side partial agg; <=4 dims is the
    practical envelope, same as the real star-tree guidance).
    ``metrics``: field -> subset of sum/min/max/value_count (``avg``
    at query time requires sum AND value_count here)."""
    names = [_dim_name(d) for d in dims]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate dim names: {names}")
    date_dims = {}
    df = docs
    for d in dims:
        if isinstance(d, dict):
            df = df.withColumn(_dim_name(d), _dim_col(d))
            date_dims[_dim_name(d)] = _cal_unit(
                d["date_histogram"]["calendar_interval"])
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    for field, kinds in metrics.items():
        for k in kinds:
            if k not in _ALGEBRAIC:
                raise ValueError(
                    f"star-tree metrics must be algebraic "
                    f"({sorted(_ALGEBRAIC)}); got {k!r} -- "
                    "derive avg at query time, keep percentiles on "
                    "the document path")
            aggs.append(_ALGEBRAIC[k][0](field).alias(f"{field}__{k}"))
    cube = (df.cube(*names)
            .agg(F.grouping_id().alias("_gid"), *aggs))
    return StarTree(cube, names, {k: list(v) for k, v in metrics.items()},
                    date_dims, dim_specs=list(dims))


def _where_pred(st: StarTree, where: dict):
    pred = F.lit(True)
    for dim, cond in (where or {}).items():
        c = F.col(dim)
        if isinstance(cond, dict):
            for op, v in cond.items():
                cmp = {"gte": c >= v, "gt": c > v,
                       "lte": c <= v, "lt": c < v}.get(op)
                if cmp is None:
                    raise ValueError(f"bad range op {op!r}")
                pred = pred & cmp
        elif isinstance(cond, (list, tuple, set)):
            pred = pred & c.isin(*[list(cond)])
        else:
            pred = pred & (c == cond)
    return pred


def startree_query(st: StarTree, group_by: list[str],
                   metrics: list[tuple[str, str]] = (),
                   where: dict | None = None) -> DataFrame:
    """Answer ``GROUP BY group_by`` (+ dim-only WHERE) from the cube:
    one gid's partition, merge-aggregated.  ``metrics``: (field, kind)
    with kind in sum/min/max/value_count/avg; output columns are
    ``{field}_{kind}`` plus ``doc_count``."""
    needed = set(group_by) | set(where or {})
    rows = st.cube.filter(F.col("_gid") == st.gid_for(needed))
    rows = rows.filter(_where_pred(st, where))
    merged = [F.sum("doc_count").alias("doc_count")]
    for field, kind in metrics:
        have = st.metrics.get(field, [])
        if kind == "avg":
            if not {"sum", "value_count"} <= set(have):
                raise ValueError(
                    f"avg({field}) needs sum+value_count in the cube")
            merged.append(
                (F.sum(f"{field}__sum")
                 / F.sum(f"{field}__value_count"))
                .alias(f"{field}_avg"))
            continue
        if kind not in have:
            raise ValueError(
                f"{kind}({field}) not materialized in the cube")
        merged.append(
            _ALGEBRAIC[kind][1](f"{field}__{kind}")
            .alias(f"{field}_{kind}"))
    if group_by:
        return rows.groupBy(*group_by).agg(*merged)
    return rows.agg(*merged)


def startree_sync(spark: SparkSession, path: str, docs: DataFrame,
                  watermark_col: str) -> dict:
    """Incremental cube maintenance (the reason the cube is algebraic
    in the first place): aggregate only source rows past the stored
    watermark into a DELTA cube, merge it into the persisted cube with
    each metric's merge op (sum of sums, min of mins, sum of counts),
    temp-sibling write + atomic swap, advance the watermark.

    Contract: the source is APPEND-ONLY on ``watermark_col`` (min/max
    cannot un-merge a delete -- the same restriction the transform
    plugin documents).  Pinned property: any sync sequence over a
    growing source equals one full build.  At 100 TB a sync costs the
    delta's aggregation (delta-sized Expand + one shuffle) plus a
    bucket-rows merge -- the corpus is never rescanned."""
    import json
    import os
    import shutil

    # crash recovery (same window as rollup_sync): the swap below
    # removes data/ then renames the tmp in; a crash between the two
    # leaves the ONLY cube copy under tmp with a stale watermark and
    # makes StarTree.load fail on the missing dir. Adopt a stranded
    # tmp; discard a torn one lying next to intact data.
    data_dir = os.path.join(path, "data")
    tmp = os.path.join(path, "_data.sync.tmp")
    if os.path.isdir(tmp):
        if not os.path.isdir(data_dir):
            os.replace(tmp, data_dir)
        else:
            shutil.rmtree(tmp)

    st = StarTree.load(spark, path)
    if st.dim_specs is None:
        raise ValueError("cube was saved without dim_specs; rebuild "
                         "with startree_build().save() to enable sync")
    src = docs
    if st.watermark is not None:
        src = src.filter(F.col(watermark_col) > F.lit(st.watermark))
    hi_row = src.agg(F.max(watermark_col).alias("hi")).head()
    if hi_row["hi"] is None:
        return {"delta_docs": 0, "watermark": st.watermark}
    n_delta = src.count()
    delta = startree_build(src, st.dim_specs, st.metrics)

    merged_aggs = [F.sum("doc_count").alias("doc_count")]
    for field, kinds in st.metrics.items():
        for k in kinds:
            merged_aggs.append(
                _ALGEBRAIC[k][1](f"{field}__{k}")
                .alias(f"{field}__{k}"))
    merged = (st.cube.unionByName(delta.cube)
              .groupBy(*st.dims, "_gid").agg(*merged_aggs))

    merged.write.mode("overwrite").partitionBy("_gid").parquet(tmp)
    shutil.rmtree(data_dir)
    os.replace(tmp, data_dir)
    new_wm = _wm_json(hi_row["hi"])
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    meta["watermark"] = new_wm
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return {"delta_docs": int(n_delta), "watermark": new_wm}


# -- search-body routing ------------------------------------------------

_METRIC_KINDS = ("sum", "min", "max", "avg", "value_count")


def _body_where(st: StarTree, qnode: dict) -> dict | None:
    """A query node -> dim-only WHERE dict, or None if the query
    touches anything the cube doesn't carry."""
    if not qnode or qnode == {"match_all": {}}:
        return {}
    if len(qnode) != 1:
        return None
    (kind, spec), = qnode.items()
    if kind == "bool":
        extra = {k: v for k, v in spec.items() if k != "filter"}
        if extra:
            return None
        out: dict = {}
        for sub in spec.get("filter", []):
            w = _body_where(st, sub)
            if w is None or set(w) & set(out):
                return None
            out.update(w)
        return out
    if kind in ("term", "terms", "range"):
        # the wire allows decoration keys next to the field (range
        # boost etc.) -- anything beyond ONE dim key means fallback,
        # never a crash
        fields = [k for k in spec if k in st.dims]
        if len(fields) != 1 or len(spec) != 1:
            return None
        field, val = fields[0], spec[fields[0]]
        if kind == "term" and isinstance(val, dict):
            val = val.get("value")
        if kind == "range":
            val = {k: v for k, v in val.items()
                   if k in ("gte", "gt", "lte", "lt")}
        return {field: val}
    return None


def startree_route(st: StarTree, body: dict) -> dict | None:
    """Answer a search body's aggs from the star tree when coverable:
    query must reduce to dim-only filters; every top-level agg must be
    a terms / date_histogram bucket on a dim (date dims must match the
    stored calendar_interval) whose sub-aggs are algebraic metrics on
    materialized fields.  Returns a ``run_aggs``-shaped ``{name:
    DataFrame}`` (bucket key column named after the dim, ``doc_count``,
    one column per metric sub-agg name), or ``None`` -> caller falls
    back to the document path."""
    where = _body_where(st, body.get("query", {"match_all": {}}))
    if where is None:
        return None
    aggs_spec = body.get("aggs", body.get("aggregations")) or {}
    if not aggs_spec:
        return None
    out: dict[str, DataFrame] = {}
    for name, spec in aggs_spec.items():
        sub = spec.get("aggs", spec.get("aggregations")) or {}
        if "terms" in spec:
            dim = spec["terms"]["field"]
            size = int(spec["terms"].get("size", 10))
        elif "date_histogram" in spec:
            dh = spec["date_histogram"]
            try:
                iv = _cal_unit(dh.get("calendar_interval",
                                      dh.get("interval")))
            except ValueError:
                return None
            cand = [n for n, v in st.date_dims.items()
                    if n.split("__")[0] == dh["field"] and v == iv]
            if not cand:
                return None
            dim, size = cand[0], None
        else:
            return None
        if dim not in st.dims:
            return None
        wanted: list[tuple[str, str, str]] = []  # (alias, field, kind)
        for mname, mspec in sub.items():
            if not isinstance(mspec, dict) or len(mspec) != 1:
                return None
            (mkind, mdef), = mspec.items()
            if mkind not in _METRIC_KINDS or not isinstance(mdef, dict):
                return None
            field = mdef.get("field")
            have = set(st.metrics.get(field, []))
            need = {"sum", "value_count"} if mkind == "avg" else {mkind}
            if not need <= have:
                return None
            wanted.append((mname, field, mkind))
        df = startree_query(st, [dim],
                            [(f, k) for _, f, k in wanted], where)
        for mname, field, kind in wanted:
            df = df.withColumnRenamed(f"{field}_{kind}", mname)
        if size is not None:
            df = (df.orderBy(F.desc("doc_count"), F.asc(dim))
                  .limit(size))
        else:
            df = df.orderBy(F.asc(dim))
        # run_aggs names the bucket-key column after the AGG NAME --
        # the routed answer must be schema-identical so callers never
        # see which path served them
        out[name] = df.withColumnRenamed(dim, name)
    return out
