"""Dense, deterministic doc-id assignment without a global sort
bottleneck (SURVEY.md section 7.3 item 3).

doc_id == global rank of ``url`` (0-based). Implemented with the
partition-offset technique:

1. ``repartitionByRange(order_col)`` + ``sortWithinPartitions`` --
   range partitioning preserves global order across partitions, so
   (partition offset + local index) == global rank regardless of
   where the sampled range boundaries land. This is what makes the
   ids stable across resumed/re-run builds (the analog of the
   reference's deterministic MD5 doc-id idempotency trick,
   ref siem/__init__.py:683-706).
2. count rows per partition (tiny driver-side collect: P rows).
3. ``mapInPandas`` adds ``doc_id = offset[pid] + running local index``
   -- iterator state carries the counter across Arrow batches, so no
   partition is ever materialized whole.

Cost at scale: one range shuffle + one extra pass for the counts.
No single-task global window (``row_number() OVER (ORDER BY url)``
would serialize 100 TB through one task).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_doc_ids(df: DataFrame, order_col: str = "url",
                   num_partitions: int | None = None) -> DataFrame:
    """Return ``df`` plus a dense ``doc_id`` long column == rank of
    ``order_col`` (dense, unique, deterministic for a given input).

    The total row count (already paid for by the offset pass) is
    exposed as ``out._spark_graft_n_rows`` so callers don't trigger
    another full count action."""
    from pyspark import StorageLevel

    if num_partitions:
        part = df.repartitionByRange(num_partitions, order_col)
    else:
        part = df.repartitionByRange(order_col)
    part = part.sortWithinPartitions(order_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    # PIN the physical partitioning: repartitionByRange samples its
    # boundaries with a per-execution random seed, so the count pass
    # and the id pass (and every downstream consumer) MUST observe one
    # materialization -- otherwise partition ids shift between passes
    # and ids go wrong (or the offset lookup misses). The final ids
    # are boundary-independent (offset + local index == global rank),
    # so persisting is only needed within one build, not across runs.
    part = part.persist(StorageLevel.MEMORY_AND_DISK)

    counts = {
        r["_pid"]: r["cnt"]
        for r in part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)]
        + [f for f in df.schema.fields]
    )

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for b in batches:
            if b.empty:
                continue
            pid = int(b["_pid"].iloc[0])
            ids = offsets[pid] + local + pd.RangeIndex(len(b))
            local += len(b)
            out = b.drop(columns=["_pid"])
            out.insert(0, "doc_id", ids.astype("int64"))
            yield out

    out = part.mapInPandas(add_ids, schema=out_schema)
    out._spark_graft_n_rows = acc
    # hand the pinned block back to the caller: once every consumer of
    # the ids has materialized (delta written, index saved), call
    # release_doc_ids(out) -- otherwise cached blocks/spill files
    # accumulate per call (checkpointed builds call this once per
    # partition, the streaming indexer once per micro-batch).
    out._spark_graft_pinned = part
    return out


def release_doc_ids(with_ids: DataFrame) -> None:
    """Unpersist the range-partitioned block pinned by
    :func:`assign_doc_ids`. Safe to call only AFTER every consumer of
    the returned DataFrame has materialized its output: a later
    recompute would re-sample range boundaries and mis-assign ids
    against the stale offset table."""
    pinned = getattr(with_ids, "_spark_graft_pinned", None)
    if pinned is not None:
        pinned.unpersist()
