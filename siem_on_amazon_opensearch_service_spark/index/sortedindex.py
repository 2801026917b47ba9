"""Index sorting: the OpenSearch ``index.sort`` analog.

Reference parity target: the dashboards' universal access pattern is
"newest events first" -- every saved search sorts on the time field
(reference dashboard ndjson sort blocks), and OpenSearch serves it
cheaply because ``index.sort.field: @timestamp`` stores segments
pre-sorted, letting the collector EARLY-TERMINATE after k docs per
segment instead of scoring the whole shard.

Spark-first restatement
-----------------------
A sorted "segment" is a range bucket: quantile split points over the
sort field (one approxQuantile probe at write), docs hashed into
buckets by binary search over the driver-held bounds, written
``partitionBy("_sbucket")`` with rows sorted inside each bucket file.
The manifest (JSON: ordered bucket labels, row counts, bounds) is the
segment metadata.

A ``topk(k)`` then reads ONLY the boundary buckets: the driver walks
the manifest from the low end (asc) or high end (desc) until the
cumulative row count reaches k, and the scan touches just those
bucket directories -- at 100 TB a "latest 50 events" query reads one
directory of the time-range layout, not the corpus.  With a residual
predicate the count walk is only a lower bound, so the reader widens
progressively (geometrically) until k rows survive the filter -- each
probe is a small directory-pruned job, the DataFrame analog of the
collector's per-segment early exit.

Nulls in the sort field sort LAST in both directions (the wire's
``missing: "_last"`` default), stored in their own ``__null`` bucket.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: bucket label for rows whose sort field is NULL
_NULL = "__null"


class SortedDocs:
    """A docs table materialized in sort order with bucket metadata."""

    def __init__(self, spark: SparkSession, path: str, manifest: dict):
        self.spark = spark
        self.path = path
        self.sort_field = manifest["sort_field"]
        #: ordered (label, row_count) low -> high, nulls excluded
        self.buckets: list[tuple[str, int]] = [
            (str(b), int(n)) for b, n in manifest["buckets"]]
        self.null_count = int(manifest.get("null_count", 0))
        #: quantile split points (double space: numeric value or epoch
        #: seconds) -- bucket b{i} covers (splits[i-1], splits[i]]
        self.splits: list[float] = [float(s) for s in
                                    manifest.get("splits", [])]
        #: read-path bookkeeping for tests/operators: bucket dirs
        #: touched by the most recent topk() call
        self.last_read_buckets: list[str] | None = None

    # -- write ---------------------------------------------------------

    @staticmethod
    def save(spark: SparkSession, docs: DataFrame, path: str,
             sort_field: str, buckets: int = 32) -> "SortedDocs":
        """Materialize ``docs`` range-bucketed + sorted on
        ``sort_field``.  Split points come from one approxQuantile
        probe (approximation only skews balance, never correctness:
        reads always take whole buckets); each bucket directory is
        one sorted run."""
        if sort_field not in docs.columns:
            raise ValueError(f"unknown sort field {sort_field!r}")
        val = F.col(sort_field).cast("double")
        probe = docs.select(val.alias("_v")).filter(F.col("_v").isNotNull())
        qs = [i / buckets for i in range(1, buckets)]
        splits = sorted(set(probe.approxQuantile("_v", qs, 0.01)))

        def label(i: int) -> str:
            return f"b{i:05d}"

        cuts = F.array(*[F.lit(s) for s in splits])
        bucket = F.when(
            F.col(sort_field).isNull(), F.lit(_NULL)
        ).otherwise(
            F.concat(
                F.lit("b"),
                F.lpad(
                    F.aggregate(
                        cuts, F.lit(0),
                        lambda acc, s: acc
                        + F.when(val > s, 1).otherwise(0),
                    ).cast("string"),
                    5, "0"),
            )
        )
        (docs.withColumn("_sbucket", bucket)
             .repartition(F.col("_sbucket"))
             .sortWithinPartitions(sort_field)
             .write.mode("overwrite")
             .partitionBy("_sbucket").parquet(f"{path}/docs"))

        counts = {
            r["_sbucket"]: int(r["n"])
            for r in spark.read.parquet(f"{path}/docs")
            .groupBy("_sbucket").agg(F.count("*").alias("n")).collect()
        }
        ordered = [(label(i), counts.get(label(i), 0))
                   for i in range(len(splits) + 1)]
        manifest = {
            "sort_field": sort_field,
            "buckets": [(b, n) for b, n in ordered if n > 0],
            "null_count": counts.get(_NULL, 0),
            "splits": splits,
        }
        with open(os.path.join(path, "sort_manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        return SortedDocs(spark, path, manifest)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SortedDocs":
        with open(os.path.join(path, "sort_manifest.json")) as f:
            return cls(spark, path, json.load(f))

    # -- read ----------------------------------------------------------

    def _read(self, labels: list[str]) -> DataFrame:
        self.last_read_buckets = list(labels)
        if not labels:
            return (self.spark.read.parquet(f"{self.path}/docs")
                    .limit(0).drop("_sbucket"))
        paths = [f"{self.path}/docs/_sbucket={b}" for b in labels]
        return self.spark.read.parquet(*paths)

    def topk(self, k: int, desc: bool = False,
             predicate: Column | None = None) -> DataFrame:
        """Top-k rows by the sort field, reading only boundary
        buckets.  Ties under the sort field are broken ascending on
        every remaining column being unspecified -- callers needing a
        total order add their own tiebreak downstream (the engine's
        hits paths always re-sort the <= k rows).

        Without a predicate: the manifest count walk is exact -- one
        directory-pruned read.  With one: progressive geometric
        widening until k rows survive (or the layout is exhausted).
        """
        walk = list(reversed(self.buckets)) if desc else list(self.buckets)
        c = F.col(self.sort_field)
        ordc = c.desc_nulls_last() if desc else c.asc_nulls_last()

        if predicate is None:
            take, acc = [], 0
            for b, n in walk:
                take.append(b)
                acc += n
                if acc >= k:
                    break
            if acc < k and self.null_count:
                # nulls fill the tail (missing:_last), same single job
                take.append(_NULL)
            return self._read(take).orderBy(ordc).limit(k)
        width = 1
        while True:
            take = [b for b, _ in walk[:min(len(walk), width)]]
            if width >= len(walk) and self.null_count:
                take.append(_NULL)
            df = self._read(take).filter(predicate)
            if width >= len(walk) or df.limit(k).count() >= k:
                return df.orderBy(ordc).limit(k)
            width *= 2

    def topk_range(self, k: int, lo: float | None = None,
                   hi: float | None = None,
                   desc: bool = False) -> DataFrame:
        """Top-k within a [lo, hi] range of the sort field (double
        space: numeric value or epoch seconds) -- the dashboards'
        time-range + newest-first shape.  The manifest split points
        pick ONLY the overlapping buckets (bucket b{i} covers
        (splits[i-1], splits[i]]); inside them the residual range
        filter and the k-walk run as in :meth:`topk`.
        """
        import bisect

        labels = [b for b, _ in self.buckets]
        first = 0 if lo is None else bisect.bisect_left(self.splits, lo)
        last = (len(labels) - 1 if hi is None
                else bisect.bisect_left(self.splits, hi))
        # bucket ids are positional over the FULL ladder; empty
        # buckets were dropped from the manifest, so map by label
        want = {f"b{i:05d}" for i in range(first, last + 1)}
        overlap = [(b, n) for b, n in self.buckets if b in want]
        walk = list(reversed(overlap)) if desc else overlap
        c = F.col(self.sort_field)
        ordc = c.desc_nulls_last() if desc else c.asc_nulls_last()
        v = c.cast("double")
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (v >= lo)
        if hi is not None:
            pred = pred & (v <= hi)
        take, acc = [], 0
        for b, n in walk:
            take.append(b)
            acc += n   # counts are an upper bound under the filter
            if acc >= k:
                break
        df = self._read(take).filter(pred)
        got = df.limit(k).count()
        if got < k and len(take) < len(walk):
            # boundary buckets were only partially in range: widen to
            # the full overlap set (still range-pruned) and finish
            df = self._read([b for b, _ in walk]).filter(pred)
        return df.orderBy(ordc).limit(k)
