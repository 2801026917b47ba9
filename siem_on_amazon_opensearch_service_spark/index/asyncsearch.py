"""``_async_search`` — submit a search that runs in the background,
poll partial results while shards complete, fetch/extend/delete by id.

Reference surface: the OpenSearch/Elasticsearch asynchronous search
API (``POST /<index>/_async_search`` → ``{id, is_running, is_partial,
response}``; ``GET /_async_search/<id>``; ``DELETE``), which the
dashboards use for long historical scans. A coordinating node runs
the query shard-by-shard and the partial response at any moment is
the merged result of the shards finished so far.

Spark restatement: the shard is a ROTATION PERIOD (`rotation.py` —
one self-contained index delta per day/month/year; on Iceberg, one
time partition). Submission runs a *dfs phase* first: global
``n_docs`` / ``avgdl`` and per-query-term document frequencies over
ALL selected periods (a metadata-sized job — the postings scan is
term-pruned to the query's terms). Every shard then scores with
those GLOBAL statistics, which buys a property the wire API's default
``query_then_fetch`` cannot offer: a document's score in a partial
response is ALREADY its final score, so partials only ever grow —
they never re-rank. The final merged result is rank- and
score-identical to one query over the full period union (pinned by
tests against ``load_rotated`` + ``bm25_topk``).

Scale shape: per-shard work is the ordinary single-exchange BM25
top-k plan over one period's postings (term-``IN`` pushdown on the
term-sorted layout); the merge reads only shard top-k lists (k rows
per shard — driver-metadata-sized). Status/partials live in a
filesystem repo exactly like `pit.py` / `scroll.py` manifests; every
status update is a temp-file + ``os.replace`` atomic swap so a
concurrent ``async_get`` never sees a torn manifest.

The runner is deliberately step-wise: ``async_step`` executes ONE
pending shard and returns; ``async_run`` loops it; ``background=True``
puts ``async_run`` on a daemon thread (the "async" of the wire API —
one coordinator thread per running search, never one per shard).
Tests drive ``async_step`` directly for deterministic mid-flight
assertions.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import PostingsIndex
from .query import bm25_topk
from .rotation import choose_periods

__all__ = [
    "async_submit", "async_step", "async_run", "async_get",
    "async_delete", "list_async",
]


def _status_path(repo: str, search_id: str) -> str:
    return os.path.join(repo, search_id, "status.json")


def _read_status(repo: str, search_id: str) -> dict:
    p = _status_path(repo, search_id)
    if not os.path.exists(p):
        raise KeyError(f"no such async search {search_id!r}")
    with open(p) as f:
        return json.load(f)


def _write_status(repo: str, search_id: str, status: dict) -> None:
    p = _status_path(repo, search_id)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(status, f)
    os.replace(tmp, p)


def _check_alive(status: dict, search_id: str, now: float) -> None:
    if now > status["expires_at"]:
        raise ValueError(
            f"async search {search_id!r} expired at "
            f"{status['expires_at']} (now={now})"
        )


def async_submit(
    spark: SparkSession,
    index_path: str,
    query: str,
    repo: str,
    *,
    k: int = 10,
    start: str | None = None,
    end: str | None = None,
    keep_alive: float = 300.0,
    now: float = 0.0,
    background: bool = False,
) -> str:
    """Submit an async BM25 search over a rotated index. Runs the dfs
    phase (global stats for the query's terms over every selected
    period) synchronously — it is one term-pruned metadata job — then
    either returns immediately (``background=False``; drive with
    :func:`async_step` / :func:`async_run`) or launches the runner on
    a daemon thread. Returns the search id."""
    from .query import _query_weights

    chosen = choose_periods(index_path, start, end)
    search_id = uuid.uuid4().hex[:16]

    # --- dfs phase: global stats, shared by every shard -------------
    stat_dirs = [f"{index_path}/delta/batch={i}/stats" for i, _ in chosen]
    srow = spark.read.parquet(*stat_dirs).agg(
        F.sum("n_docs").alias("n"), F.sum("total_dl").alias("dl")
    ).collect()[0]
    n_docs, total_dl = int(srow["n"] or 0), int(srow["dl"] or 0)

    terms = list(_query_weights(query))
    dfs: dict[str, int] = {}
    if terms:
        post_dirs = [f"{index_path}/delta/batch={i}/postings"
                     for i, _ in chosen]
        dfs = {
            r["term"]: int(r["df"])
            for r in spark.read.parquet(*post_dirs)
            .filter(F.col("term").isin(terms))
            .groupBy("term").agg(F.sum("doc_count").alias("df"))
            .collect()
        }

    os.makedirs(os.path.join(repo, search_id, "partials"), exist_ok=True)
    _write_status(repo, search_id, {
        "id": search_id,
        "index_path": index_path,
        "query": query,
        "k": int(k),
        "periods": [[int(i), p] for i, p in chosen],
        "done": [],
        "n_docs": n_docs,
        "avgdl": (total_dl / n_docs if n_docs else 0.0),
        "dfs": dfs,
        "created_at": float(now),
        "expires_at": float(now) + float(keep_alive),
    })
    if background:
        t = threading.Thread(
            target=async_run, args=(spark, repo, search_id), daemon=True
        )
        t.start()
    return search_id


def _shard_index(spark: SparkSession, status: dict,
                 ordinal: int) -> PostingsIndex:
    """One period's postings/docs under the GLOBAL dfs-phase stats."""
    base = f"{status['index_path']}/delta/batch={ordinal}"
    term_stats = spark.createDataFrame(
        [(t, int(df), 0, 0.0) for t, df in status["dfs"].items()],
        "term string, df long, max_tf int, max_impact double",
    )
    return PostingsIndex(
        docs=spark.read.parquet(f"{base}/docs"),
        postings=spark.read.parquet(f"{base}/postings"),
        term_stats=term_stats,
        n_docs=status["n_docs"],
        avgdl=status["avgdl"],
    )


def async_step(spark: SparkSession, repo: str, search_id: str) -> dict:
    """Execute ONE pending shard: score that period with the global
    stats, persist its top-k partial, mark it done. Returns the
    updated status (a no-op with ``is_running=False`` when every
    shard already finished)."""
    status = _read_status(repo, search_id)
    done = set(status["done"])
    pending = [(i, p) for i, p in status["periods"] if i not in done]
    if not pending:
        status["is_running"] = False
        return status
    ordinal, label = pending[0]
    ix = _shard_index(spark, status, ordinal)
    topk = bm25_topk(ix, status["query"], k=status["k"]).withColumn(
        "period", F.lit(label)
    )
    out = os.path.join(repo, search_id, "partials", f"shard={ordinal}")
    topk.write.mode("overwrite").parquet(out)
    # re-read + swap so a concurrent async_get never sees a torn file
    status = _read_status(repo, search_id)
    status["done"] = sorted({*status["done"], ordinal})
    _write_status(repo, search_id, status)
    status["is_running"] = len(status["done"]) < len(status["periods"])
    return status


def async_run(spark: SparkSession, repo: str, search_id: str) -> dict:
    """Run every pending shard to completion (the coordinator loop the
    background thread executes)."""
    while True:
        try:
            status = async_step(spark, repo, search_id)
        except KeyError:
            # deleted mid-run: cancellation
            return {"id": search_id, "is_running": False,
                    "cancelled": True}
        if not status["is_running"]:
            return status


def async_get(
    spark: SparkSession,
    repo: str,
    search_id: str,
    *,
    now: float = 0.0,
    keep_alive: float | None = None,
) -> tuple[dict, DataFrame]:
    """``GET /_async_search/<id>``: current status + the merged top-k
    over the shards completed so far. Shard partials carry FINAL
    scores (global dfs stats), so the merge is a TakeOrdered over
    done-shard top-k lists — k·shards rows, metadata-sized. Passing
    ``keep_alive`` extends the expiry from ``now`` (the wire API's
    extension semantics)."""
    status = _read_status(repo, search_id)
    _check_alive(status, search_id, now)
    if keep_alive is not None:
        status["expires_at"] = float(now) + float(keep_alive)
        _write_status(repo, search_id, status)

    done = sorted(status["done"])
    meta = {
        "id": search_id,
        "is_running": len(done) < len(status["periods"]),
        "is_partial": len(done) < len(status["periods"]),
        "shards_total": len(status["periods"]),
        "shards_done": len(done),
        "expires_at": status["expires_at"],
    }
    if not done:
        empty = spark.createDataFrame(
            [], "doc_id long, score double, period string")
        return meta, empty
    dirs = [os.path.join(repo, search_id, "partials", f"shard={i}")
            for i in done]
    hits = (
        spark.read.parquet(*dirs)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(status["k"])
    )
    return meta, hits


def async_delete(repo: str, search_id: str) -> None:
    """``DELETE /_async_search/<id>``: drop status + partials. A
    running background thread finishes its current shard and stops at
    the next step (the status read raises KeyError, which the runner
    treats as cancellation)."""
    shutil.rmtree(os.path.join(repo, search_id), ignore_errors=True)


def list_async(repo: str) -> list[dict]:
    """All stored async searches (the management-API listing)."""
    out = []
    if not os.path.isdir(repo):
        return out
    for sid in sorted(os.listdir(repo)):
        try:
            out.append(_read_status(repo, sid))
        except (KeyError, json.JSONDecodeError):
            continue
    return out
