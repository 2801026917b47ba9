"""Document delete / update on a saved index -- the Lucene
deleted-docs model, restated for the parquet/Iceberg layout.

Reference semantics target: OpenSearch updates and deletes documents
by ``_id`` (the loader's deterministic MD5 id makes re-ingestion an
upsert, reference siem/__init__.py:683-706); Lucene implements this
as a per-segment *deleted-docs bitmap* consulted at query time, with
segment merges physically dropping the masked docs later.

Spark restatement:

* ``delete_docs`` appends doc ids to a ``tombstones/`` parquet dir --
  O(deleted) writes, the postings layout is untouched (rewriting
  term-partitioned posting lists per delete would be a full-index
  write amplification at 100 TB);
* ``upsert_docs`` = tombstone the old ids for re-ingested urls +
  index the new versions as a delta (streaming.IncrementalIndexer's
  append path);
* ``live_topk`` masks tombstoned docs with a broadcast anti-join
  BEFORE the top-k cut (correctness: a masked doc must not occupy a
  top-k slot). The mask also fixes n_docs/avgdl drift at compaction,
  not per query -- exactly Lucene's behavior (idf uses segment stats
  until merge);
* ``compact`` physically drops masked postings: decode -> anti-join
  -> re-encode via the shared delta-merge path (checkpoint.py), then
  clears the tombstones. On Iceberg this whole module is
  ``MERGE INTO ... WHEN MATCHED THEN DELETE`` plus
  ``rewrite_data_files``; here it is the same dataflow spelled out.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import PostingsIndex
from .query import bm25_scores

TOMBSTONE_SCHEMA = "doc_id long"

#: table name inside the index root; on Iceberg this is the
#: tombstones table next to the postings table (storage.py maps
#: append -> INSERT INTO, the consuming mask -> MERGE INTO ... WHEN
#: MATCHED THEN DELETE at compaction).
TOMBSTONE_TABLE = "tombstones"


def _store(path: str):
    from ..storage import ParquetStore

    return ParquetStore(path)


def _tomb_dir(path: str) -> str:
    return os.path.join(path, TOMBSTONE_TABLE)


def delete_docs(spark: SparkSession, path: str, doc_ids: list[int]) -> None:
    """Append doc ids to the tombstone set (idempotent -- duplicates
    are fine, the mask is a semi-join)."""
    _store(path).append(
        spark.createDataFrame([(int(d),) for d in doc_ids],
                              TOMBSTONE_SCHEMA),
        TOMBSTONE_TABLE,
    )


def delete_by_url(spark: SparkSession, path: str, urls: list[str]) -> int:
    """Tombstone every doc id whose url is in ``urls`` (the _id-by-
    content-key delete shape). Returns the number tombstoned.

    The matched ids are appended to the tombstone table as a
    DataFrame write -- nothing is collected to the driver, so a
    delete-by-key that matches a large doc fraction stays
    executor-sized."""
    docs = spark.read.parquet(f"{path}/docs")
    matched = docs.filter(F.col("url").isin(urls)).select(
        F.col("doc_id").cast("long")
    )
    n = matched.count()
    if n:
        _store(path).append(matched, TOMBSTONE_TABLE)
    return n


def load_tombstones(spark: SparkSession, path: str) -> DataFrame:
    return (
        _store(path)
        .load_or_empty(spark, TOMBSTONE_TABLE, TOMBSTONE_SCHEMA)
        .select("doc_id")
        .distinct()
    )


def live_topk(ix: PostingsIndex, spark: SparkSession, path: str, query: str,
              k: int = 10) -> DataFrame:
    """BM25 top-k over live (non-tombstoned) docs only. The mask is a
    LEFT ANTI join applied to the full match set before the top-k cut,
    so masked docs can never shadow live results. No broadcast hint:
    the tombstone set is Lucene-bitmap-sized after normal deletes (AQE
    broadcasts it) but unbounded after a large upsert wave, where a
    forced broadcast would blow the driver -- AQE picks per-run."""
    tombs = load_tombstones(spark, path)
    return (
        bm25_scores(ix, query)
        .join(tombs, "doc_id", "left_anti")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def upsert_docs(spark: SparkSession, path: str, new_docs: DataFrame,
                salt_threshold: int = 100_000) -> dict:
    """Update-by-url on an incremental store (the reference's
    deterministic-MD5-id upsert, siem/__init__.py:683-706): tombstone
    every EXISTING doc whose url appears in ``new_docs``, then index
    the new versions as the next delta batch. Readers compose through
    the same mask as always (:func:`live_topk` /
    ``load_tombstones`` anti-join); :func:`compact` later drops the
    masked versions physically.

    ``path`` is a ``streaming.IncrementalIndexer`` root (the append
    path the module docstring names). Returns ``{"tombstoned": n,
    "batch_id": b, "n_new": m}``. The old-id lookup is one join
    against the live docs table — never a collect of the corpus."""
    import glob

    from ..streaming.incremental import IncrementalIndexer, load_incremental

    ix = load_incremental(spark, path)
    # Materialize the old-id set BEFORE the new batch lands: the frame
    # reads the live docs table lazily, and evaluating it after
    # process_batch would match the replacement docs' own urls too.
    old_ids = (
        ix.docs.join(
            new_docs.select(F.col("url")).distinct(), "url")
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    n_old = old_ids.count()
    used = [
        int(os.path.basename(d).split("=", 1)[1])
        for d in glob.glob(os.path.join(path, "delta", "batch=*"))
    ]
    batch_id = (max(used) + 1) if used else 0
    # Index the new delta FIRST, tombstone SECOND: a crash between the
    # two degrades to duplicate visible versions (at-least-once — the
    # retried tombstone append heals it), never to a url with no live
    # version, which the old tombstone-first order produced when
    # process_batch died.
    IncrementalIndexer(path, salt_threshold).process_batch(
        new_docs, batch_id)
    store = _store(path)
    store.append(old_ids, TOMBSTONE_TABLE)
    old_ids.unpersist()
    return {"tombstoned": int(n_old), "batch_id": batch_id,
            "n_new": new_docs.count()}


def compact(spark: SparkSession, path: str, out_path: str,
            salt_threshold: int = 100_000) -> PostingsIndex:
    """Physically remove tombstoned docs (the segment-merge analog):
    decode all blocks, mask, re-encode through the shared delta-merge
    path with recomputed n_docs/avgdl, write ``out_path``, clear the
    tombstone set."""
    from ..plans.checkpoint import merge_from_decoded

    # Crash recovery for a previous IN-PLACE compact: the two-rename
    # swap below has a window (after `path` moved aside, before the
    # compacted dir moved in) where `path` does not exist and the only
    # copy lives under the fixed `.old` suffix. Restore it on entry so
    # a retry (and every reader) finds an index again; if both exist,
    # the previous compact finished and `.old` is droppable debris.
    import shutil as _shutil

    leftover = path.rstrip("/") + ".old"
    if os.path.exists(leftover):
        if not os.path.exists(path):
            os.rename(leftover, path)
        else:
            _shutil.rmtree(leftover, ignore_errors=True)
    stale_work = path.rstrip("/") + ".compacting"
    if os.path.exists(stale_work):
        _shutil.rmtree(stale_work, ignore_errors=True)

    ix = PostingsIndex.load(spark, path)
    tombs = load_tombstones(spark, path)
    live_docs = ix.docs.join(tombs, "doc_id", "left_anti")
    srow = live_docs.agg(
        F.count("*").alias("n"), F.sum("doclen").alias("dl")
    ).collect()[0]
    n_docs, total_dl = int(srow["n"] or 0), int(srow["dl"] or 0)

    from .query import decode_blocks

    decoded = (
        decode_blocks(ix.postings)
        .join(tombs, "doc_id", "left_anti")
        .withColumnRenamed("dl", "doclen")
    )
    # In-place compaction (out_path == path) must NOT overwrite the
    # parquet dirs its own lineage is lazily reading (Spark refuses:
    # "Cannot overwrite a path that is also being read from"). Write
    # to a temp sibling, then atomically swap the subdirs AFTER the
    # job has fully materialized the output.
    in_place = os.path.realpath(out_path) == os.path.realpath(path)
    work_dir = out_path.rstrip("/") + ".compacting" if in_place else out_path

    # merge_from_decoded re-salts, re-encodes with the recomputed
    # global avgdl (tight block bounds) and writes the final layout.
    out = merge_from_decoded(
        spark, decoded, live_docs, n_docs, total_dl, work_dir,
        salt_threshold,
    )
    if not in_place:
        # The SOURCE index keeps its tombstone set: its postings still
        # contain the masked docs, and a reader of the old path must
        # keep masking them (clearing here would resurrect deletes for
        # stale readers). The compacted output needs no tombstones --
        # it was born without the masked docs.
        return out

    import shutil

    # Swap by WHOLE-DIRECTORY rename, not per-subdir moves: four
    # interleaved rmtree+move steps left a crash window where new
    # postings paired with old stats (wrong idf/avgdl for every
    # subsequent load) or a subdir was missing entirely. Two renames
    # shrink the window to between them — and a crash there leaves
    # the old index intact under the FIXED `.old` suffix, which the
    # recovery block at the top of this function restores on the next
    # compact() call (a pid-suffixed name made retries blind to it).
    # The tombstone set (and any stale prefix sidecars) die with the
    # old directory: the compacted output was born without the masked
    # docs.
    old_dir = path.rstrip("/") + ".old"
    os.rename(path, old_dir)
    os.rename(work_dir, path)
    shutil.rmtree(old_dir, ignore_errors=True)
    return PostingsIndex.load(spark, path)
