"""Resumable, lineage-tracked index builds (SURVEY.md M6; north_rule:
"resumable from Iceberg snapshot checkpoints with per-partition
lineage and build metrics").

This sandbox ships no Iceberg runtime, so the snapshot layer is a
parquet-directory + JSON-manifest equivalent with the same contract:

* the source is split into deterministic **source partitions** (hash
  of url mod P — stable across runs and cluster sizes);
* each partition builds independently into ``delta/part=<p>/`` and
  appends a manifest entry carrying its **lineage** (partition id,
  source fingerprint, doc/posting counts, bytes, wall seconds — the
  reference's per-file finish/error accounting, index.py:710-755,
  and its CloudWatch metrics, index.py:400-438);
* a resumed build skips every partition whose manifest entry matches
  its current source fingerprint (the idempotency analog of the
  reference's deterministic MD5 doc id, siem/__init__.py:683-706 —
  at partition granularity, SURVEY.md section 7.3 item 6);
* ``merge()`` shuffle-merges the partition deltas into the final
  term-partitioned postings layout.

On an Iceberg deployment: delta write -> ``writeTo(...).append()``
with the manifest row in a lineage table; skip-check -> snapshot
summary lookup; merge -> ``rewrite_data_files``-style compaction.

Doc-id scheme under resumability: ``doc_id = (part_id << 40) | local
rank of url within the partition`` — deterministic and stable no
matter which subset of partitions rebuilds, unique across partitions,
and still delta-friendly (ids within a partition are dense). The
non-resumable batch build keeps dense global url-rank ids; both paths
share every other stage.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis import tokens_col
from ..index.build import (
    PostingsIndex, encode_postings_df,
)

PART_SHIFT = 40  # doc_id = part_id << 40 | local_rank


def _manifest_path(path: str) -> str:
    return os.path.join(path, "manifest.json")


def read_manifest(path: str) -> dict:
    p = _manifest_path(path)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"partitions": {}}


def _write_manifest(path: str, manifest: dict) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(path))


def _row_digest_col() -> F.Column:
    """Per-row CONTENT digest: md5 over url + md5(text). Including the
    text hash (not just its length) means any content change flips the
    partition fingerprint — a same-length edit must trigger a rebuild."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("url"), F.md5(F.col("text")))), 1, 15
        ),
        16, 10,
    ).cast("decimal(38,0)")


def source_fingerprint(part: DataFrame) -> str:
    """Deterministic content fingerprint of one source partition:
    order-independent sum of per-row content digests + row count."""
    row = part.select(
        F.sum(_row_digest_col()).alias("s"), F.count("*").alias("n")
    ).collect()[0]
    return f"{row['n']}:{row['s']}"


def partition_fingerprints(tagged: DataFrame, num_parts: int) -> dict[int, str]:
    """All partitions' fingerprints in ONE source pass (groupBy on the
    partition tag) instead of one scan per partition — a fully-resumed
    no-op run costs a single scan regardless of --parts."""
    rows = (
        tagged.groupBy("_part")
        .agg(F.sum(_row_digest_col()).alias("s"), F.count("*").alias("n"))
        .collect()
    )
    fps = {int(r["_part"]): f"{r['n']}:{r['s']}" for r in rows}
    # empty partitions produce no group row; match source_fingerprint's
    # empty-input rendering.
    for p in range(num_parts):
        fps.setdefault(p, "0:None")
    return fps


def write_delta(base: DataFrame, delta_dir: str) -> None:
    """Write one delta's postings + docs from a shared tokenized frame
    ``base = (doc_id, url, _toks)``. The frame persists across the two
    writes — docs and postings both derive from ONE tokenize scan (the
    same single-scan discipline as build_index; previously each write
    re-ran tokenization and id assignment). Shared by the checkpointed
    builder and the streaming indexer so the delta layout cannot
    drift between them."""
    base = base.persist()
    try:
        docs = base.select("doc_id", "url",
                           F.size("_toks").alias("doclen"))
        tf = (
            base.select("doc_id", F.size("_toks").alias("doclen"),
                        F.explode("_toks").alias("term"))
            .groupBy("doc_id", "doclen", "term")
            .agg(F.count("*").alias("tf"))
            .withColumn("salt", F.lit(0))
        )
        postings = encode_postings_df(tf)
        postings.write.mode("overwrite").parquet(f"{delta_dir}/postings")
        docs.write.mode("overwrite").parquet(f"{delta_dir}/docs")
    finally:
        base.unpersist()


def _build_partition(spark: SparkSession, part: DataFrame, p: int,
                     path: str) -> dict:
    """Build one partition's delta; returns its manifest entry."""
    t0 = time.perf_counter()
    delta_dir = os.path.join(path, f"delta/part={p}")

    # Dense local rank WITHOUT serializing the partition through one
    # task: the same range-partition + offset technique as the batch
    # build (docids.py). A repartition(1) + global window here would
    # push this source partition's full data through a single task —
    # fatal at 100 TB / hundreds of GB per partition.
    from ..index.docids import assign_doc_ids, release_doc_ids

    # keep the handle assign_doc_ids returns: withColumn creates a NEW
    # DataFrame object without the _spark_graft_pinned attribute, so
    # release must target the original.
    assigned = assign_doc_ids(part, order_col="url")
    with_ids = assigned.withColumn(
        "doc_id",
        (F.lit(p).cast("long") * (1 << PART_SHIFT) + F.col("doc_id")),
    )
    base = with_ids.select(
        "doc_id", "url", tokens_col("text").alias("_toks")
    )
    write_delta(base, delta_dir)
    # both consumers of the ids are on disk now: release the pinned
    # range-partitioned cache (one block per partition otherwise
    # accumulates for the life of the application).
    release_doc_ids(assigned)

    stats = spark.read.parquet(f"{delta_dir}/postings").agg(
        F.sum("doc_count").alias("n_postings"),
        F.sum(
            F.octet_length("doc_ids_vb") + F.octet_length("tfs_vb")
            + F.octet_length("dls_vb")
        ).alias("bytes"),
    ).collect()[0]
    dstats = spark.read.parquet(f"{delta_dir}/docs").agg(
        F.count("*").alias("n_docs"), F.sum("doclen").alias("total_dl")
    ).collect()[0]
    return {
        "status": "ok",
        "n_docs": int(dstats["n_docs"] or 0),
        "total_dl": int(dstats["total_dl"] or 0),
        "n_postings": int(stats["n_postings"] or 0),
        "bytes_postings": int(stats["bytes"] or 0),
        "seconds": round(time.perf_counter() - t0, 3),
    }


def checkpointed_build(
    spark: SparkSession,
    pages: DataFrame,
    path: str,
    num_parts: int = 8,
    salt_threshold: int = 100_000,
    max_concurrency: int = 4,
) -> dict:
    """Build (or resume) the per-partition posting deltas.

    Returns the manifest. Call :func:`merge` afterwards to produce the
    queryable merged index. Each partition's delta is an independent
    parquet dir; a crash between partitions loses nothing.

    Partitions are dispatched from ``max_concurrency`` threads —
    Spark's scheduler interleaves the independent jobs, so the cluster
    stays busy while any one partition is in a narrow stage (a strict
    sequential loop would leave executors idle between jobs). The
    manifest write is serialized under a lock and flushed after every
    completed partition (crash durability unchanged).
    """
    import threading
    from concurrent.futures import ThreadPoolExecutor

    manifest = read_manifest(path)
    prev_parts = manifest.get("num_parts")
    if prev_parts is not None and prev_parts != num_parts:
        # resuming with a different partitioning would duplicate docs
        # (stale delta dirs + manifest rows outside the new range are
        # still merged) and corrupt n_docs/avgdl — refuse loudly.
        raise ValueError(
            f"checkpoint at {path} was built with num_parts={prev_parts}; "
            f"requested {num_parts}. Resume with the original value or "
            f"start a fresh checkpoint path."
        )
    # persist the partitioning parameters BEFORE dispatching any
    # build: a run that crashes mid-way must leave a manifest whose
    # num_parts still arms the resume guard above and merge()'s
    # stale-partition filter — written only at the end, an interrupted
    # num_parts=8 run resumed at num_parts=4 would merge mod-8 deltas
    # alongside rebuilt mod-4 deltas and duplicate documents.
    manifest["num_parts"] = num_parts
    manifest["salt_threshold"] = salt_threshold
    _write_manifest(path, manifest)

    part_col = F.pmod(F.xxhash64("url"), F.lit(num_parts)).cast("int")
    tagged = pages.withColumn("_part", part_col)
    fps = partition_fingerprints(tagged, num_parts)  # ONE source pass

    todo: list[tuple[int, DataFrame, str]] = []
    for p in range(num_parts):
        fp = fps[p]
        ent = manifest["partitions"].get(str(p))
        if ent and ent.get("fingerprint") == fp and ent.get("status") == "ok":
            continue  # lineage hit: partition unchanged, skip rebuild
        part = tagged.filter(F.col("_part") == p).drop("_part")
        todo.append((p, part, fp))

    lock = threading.Lock()

    def run(item: tuple[int, DataFrame, str]) -> None:
        p, part, fp = item
        entry = _build_partition(spark, part, p, path)
        entry["fingerprint"] = fp
        with lock:
            manifest["partitions"][str(p)] = entry
            _write_manifest(path, manifest)  # durable per partition

    if todo:
        with ThreadPoolExecutor(max_workers=max(1, max_concurrency)) as ex:
            list(ex.map(run, todo))

    manifest["num_parts"] = num_parts
    manifest["salt_threshold"] = salt_threshold
    _write_manifest(path, manifest)
    return manifest


def build_metrics(spark: SparkSession, path: str) -> DataFrame:
    """Per-partition lineage/metrics as a DataFrame (docs/sec,
    postings/sec, bytes) — the reference's metrics-emission analog."""
    manifest = read_manifest(path)
    rows = [
        (
            int(p), e["n_docs"], e["n_postings"], e["bytes_postings"],
            e["seconds"],
            round(e["n_docs"] / e["seconds"], 2) if e["seconds"] else 0.0,
            round(e["n_postings"] / e["seconds"], 2) if e["seconds"] else 0.0,
        )
        for p, e in sorted(manifest["partitions"].items(), key=lambda kv: int(kv[0]))
    ]
    return spark.createDataFrame(
        rows,
        "part int, n_docs long, n_postings long, bytes_postings long, "
        "seconds double, docs_per_sec double, postings_per_sec double",
    )


def merge_decoded_deltas(spark: SparkSession, delta_postings: DataFrame,
                         docs: DataFrame, n_docs: int, total_dl: int,
                         out_dir: str, salt_threshold: int) -> PostingsIndex:
    """Shared delta-merge path (segment-merge analog), used by both
    checkpointed builds and streaming compaction: decode delta blocks,
    regroup (term, salt) with hot-term salting, re-encode with the
    now-known global avgdl (tight max_impact bounds), write the
    term-partitioned layout + term_stats + stats."""
    from ..index.query import decode_blocks

    decoded = decode_blocks(delta_postings).withColumnRenamed("dl", "doclen")
    return merge_from_decoded(
        spark, decoded, docs, n_docs, total_dl, out_dir, salt_threshold
    )


def merge_from_decoded(spark: SparkSession, decoded: DataFrame,
                       docs: DataFrame, n_docs: int, total_dl: int,
                       out_dir: str, salt_threshold: int) -> PostingsIndex:
    """Merge path entry for ALREADY-decoded posting rows
    (term, doc_id, tf, doclen) -- used directly by tombstone
    compaction, which masks rows between decode and re-encode."""
    avgdl = total_dl / n_docs if n_docs else 0.0
    df_tbl = decoded.groupBy("term").agg(F.count("*").alias("df"))
    hot = df_tbl.filter(F.col("df") > salt_threshold).select(
        "term",
        F.ceil(F.col("df") / F.lit(salt_threshold)).cast("int").alias("n_salts"),
    )
    salted = (
        decoded.join(F.broadcast(hot), "term", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("n_salts").isNotNull(),
                F.pmod(F.xxhash64("doc_id"), F.col("n_salts")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("n_salts")
    )
    postings = encode_postings_df(salted, avgdl=avgdl)
    (
        postings.repartition(32, "term")
        .sortWithinPartitions("term", "salt", "block_id")
        .write.mode("overwrite").parquet(f"{out_dir}/postings")
    )
    docs.write.mode("overwrite").parquet(f"{out_dir}/docs")
    spark.read.parquet(f"{out_dir}/postings").groupBy("term").agg(
        F.sum("doc_count").alias("df"), F.max("max_tf").alias("max_tf"),
        F.max("max_impact").alias("max_impact"),
    ).write.mode("overwrite").parquet(f"{out_dir}/term_stats")
    spark.createDataFrame(
        [(n_docs, avgdl)], "n_docs long, avgdl double"
    ).write.mode("overwrite").parquet(f"{out_dir}/stats")
    # out_dir may have hosted a DIFFERENT index before (out-of-place
    # compact target, re-used merge dir): its tombstones / prefix
    # vocabulary name old doc ids and must not survive into this one
    from ..index.build import clear_stale_sidecars

    clear_stale_sidecars(out_dir)
    return PostingsIndex.load(spark, out_dir)


def merge(spark: SparkSession, path: str,
          salt_threshold: int | None = None) -> PostingsIndex:
    """Shuffle-merge all partition deltas into the final
    term-partitioned index. Writes ``merged/`` and returns the loaded
    index."""
    manifest = read_manifest(path)
    if salt_threshold is None:
        salt_threshold = manifest.get("salt_threshold", 100_000)

    # read ONLY the delta dirs the manifest lists as ok for the
    # current partitioning — a stale part=* dir on disk (e.g. from an
    # aborted run at a different num_parts) must not leak into the
    # merge or the n_docs/avgdl accounting.
    num_parts = manifest.get("num_parts")
    ok = {
        p: e
        for p, e in manifest["partitions"].items()
        if e.get("status") == "ok"
        and (num_parts is None or int(p) < num_parts)
    }
    if not ok:
        raise ValueError(f"no completed partitions in manifest at {path}")
    posting_dirs = [f"{path}/delta/part={p}/postings" for p in sorted(ok)]
    doc_dirs = [f"{path}/delta/part={p}/docs" for p in sorted(ok)]
    deltas = spark.read.parquet(*posting_dirs)
    docs = spark.read.parquet(*doc_dirs)
    n_docs = sum(e["n_docs"] for e in ok.values())
    total_dl = sum(e["total_dl"] for e in ok.values())
    return merge_decoded_deltas(
        spark, deltas, docs, n_docs, total_dl,
        os.path.join(path, "merged"), salt_threshold,
    )
