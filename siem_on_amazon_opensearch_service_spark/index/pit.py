"""Point-in-time (PIT) search contexts.

Reference semantics target: the OpenSearch PIT API used by the
dashboards for stable pagination — ``POST
/<index>/_search/point_in_time?keep_alive=...`` returns a pit id,
search bodies carry ``{"pit": {"id": ..., "keep_alive": ...}}`` (and
renew the keep-alive on every search that passes one), ``DELETE
/_search/point_in_time`` closes it, and ``GET
/_search/point_in_time/_all`` lists open contexts.  A PIT pins the
index VIEW at open time: searches through it see neither subsequent
deletes/updates nor segment merges until the keep-alive lapses.
(Reference deployment: ``source/lambda/es_loader`` ingests into
OpenSearch, where a PIT holds segment references; Lucene's immutable
segments make that cheap.)

Spark-first shape: every engine data file is immutable once written —
appends create new parquet files, compaction/update swap whole
directories (``index/tombstones.py``, ``index/docops.py``) — so a PIT
is exactly what a Lucene PIT is: a reference set over immutable files.
We reuse the snapshot hardlink farm (``storage.snapshot_index``):
O(files) driver-side metadata, zero data copy, zero executor work.
The PIT root contains the frozen tombstone table too, so deletes made
after open are invisible through the PIT, and live-index rewrites
cannot unlink pinned inodes.  Keep-alive is a manifest timestamp; the
clock is an explicit parameter (same testable-clock contract as
``index/lifecycle.py``).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..storage import snapshot_index
from .build import PostingsIndex
from .searchbody import search_body
from .tombstones import live_topk

_PIT_META = "pit.json"

__all__ = ["open_pit", "pit_search", "pit_topk", "close_pit",
           "list_pits", "expire_pits"]


def _meta_path(repo: str, pit_id: str) -> str:
    return os.path.join(repo, pit_id, _PIT_META)


def _read_meta(repo: str, pit_id: str) -> dict:
    mp = _meta_path(repo, pit_id)
    if not os.path.isfile(mp):
        raise ValueError(f"no PIT {pit_id!r} in {repo!r}")
    with open(mp) as fh:
        return json.load(fh)


def open_pit(index_path: str, repo: str, *, now: float,
             keep_alive_s: float = 300.0) -> str:
    """Open a PIT over the index at ``index_path``; returns the pit
    id.  The id is deterministic in (source, now) so repeated opens at
    distinct clock readings coexist."""
    src = os.path.realpath(index_path)
    pit_id = "pit-" + hashlib.sha1(
        f"{src}\x00{now!r}".encode()).hexdigest()[:16]
    snapshot_index(index_path, repo, pit_id)
    meta = {"pit_id": pit_id, "source": src, "created": now,
            "expires": now + keep_alive_s}
    with open(_meta_path(repo, pit_id), "w") as fh:
        json.dump(meta, fh)
    return pit_id


def _check_alive(repo: str, pit_id: str, now: float,
                 keep_alive_s: float | None) -> str:
    """Validate expiry; renew when a keep-alive is passed (OpenSearch
    renews on every search carrying one).  Returns the PIT root."""
    meta = _read_meta(repo, pit_id)
    if now > meta["expires"]:
        raise ValueError(
            f"PIT {pit_id!r} expired at {meta['expires']} (now={now})")
    if keep_alive_s is not None:
        meta["expires"] = now + keep_alive_s
        with open(_meta_path(repo, pit_id), "w") as fh:
            json.dump(meta, fh)
    return os.path.join(repo, pit_id)


def pit_search(spark: SparkSession, repo: str, pit_id: str, body: dict,
               *, now: float, keep_alive_s: float | None = None,
               **kwargs) -> dict:
    """Run a ``_search`` body through the PIT: the handle loads from
    the PIT root, so the query sees the index exactly as it was at
    open time.  ``kwargs`` pass through to ``search_body``
    (positional_ix, vecs, source_docs, text_field)."""
    root = _check_alive(repo, pit_id, now, keep_alive_s)
    ix = PostingsIndex.load(spark, root)
    return search_body(ix, body, **kwargs)


def pit_topk(spark: SparkSession, repo: str, pit_id: str, query: str,
             *, now: float, k: int = 10,
             keep_alive_s: float | None = None) -> DataFrame:
    """BM25 top-k through the PIT with the FROZEN tombstone mask —
    docs deleted on the live index after open still rank here; docs
    already tombstoned at open time stay masked."""
    root = _check_alive(repo, pit_id, now, keep_alive_s)
    ix = PostingsIndex.load(spark, root)
    return live_topk(ix, spark, root, query, k=k)


def close_pit(repo: str, pit_id: str) -> None:
    _read_meta(repo, pit_id)        # existence check
    shutil.rmtree(os.path.join(repo, pit_id))


def list_pits(repo: str) -> list[dict]:
    out = []
    if not os.path.isdir(repo):
        return out
    for d in sorted(os.listdir(repo)):
        mp = _meta_path(repo, d)
        if os.path.isfile(mp):
            with open(mp) as fh:
                out.append(json.load(fh))
    return out


def expire_pits(repo: str, *, now: float) -> list[str]:
    """Garbage-collect lapsed PITs (the server-side reaper); returns
    the closed ids."""
    closed = []
    for meta in list_pits(repo):
        if now > meta["expires"]:
            shutil.rmtree(os.path.join(repo, meta["pit_id"]))
            closed.append(meta["pit_id"])
    return closed
