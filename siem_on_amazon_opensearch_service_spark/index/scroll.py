"""Classic ``_scroll`` contexts (``POST /<index>/_search?scroll=1m``
then ``POST /_search/scroll``).

The pre-PIT deep-export API the reference's runbooks use for bulk
dumps: the first search opens a server-side context and returns the
first page + a ``_scroll_id``; each follow-up call returns the next
page and renews the context; an empty page means exhaustion; DELETE
closes it.  OpenSearch holds a frozen view of the index for the
context's lifetime — exactly a PIT — and a server-side CURSOR, which
is the one thing the stateless PIT + ``search_after`` pattern makes
the client carry.

Spark-first shape: the frozen view IS a PIT (``index/pit.py``
hardlink snapshot, zero copy); the cursor lives in the scroll
manifest next to the PIT metadata.  Each page executes as the
PIT-pinned ``_search`` body with ``search_after`` set from the stored
cursor; the page (``size`` rows — the wire payload by definition) is
materialized on the driver to advance the cursor, exactly what the
real API ships over the wire.  The heavy work (postings scan, gating,
scoring, TakeOrdered) stays distributed per page, and page N costs
page 1 (the search_after filter, never a deepening offset).

Sort contract: scroll pages by ``(score desc, doc_id asc)`` for
scored bodies — pass ``sort`` in the body for field-ordered exports.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession

from .pit import _check_alive, _meta_path, close_pit, open_pit
from .searchbody import search_body

_SCROLL_META = "scroll.json"

__all__ = ["open_scroll", "scroll_next", "close_scroll"]


def _smeta_path(repo: str, scroll_id: str) -> str:
    return os.path.join(repo, scroll_id + "." + _SCROLL_META)


def _read_smeta(repo: str, scroll_id: str) -> dict:
    p = _smeta_path(repo, scroll_id)
    if not os.path.isfile(p):
        raise ValueError(f"no scroll context {scroll_id!r} in {repo!r}")
    with open(p) as fh:
        return json.load(fh)


def _page(spark: SparkSession, repo: str, meta: dict, *, now: float,
          scroll_s: float | None, **kwargs) -> DataFrame:
    """One page through the PIT; advances the stored cursor."""
    _check_alive(repo, meta["pit_id"], now, scroll_s)
    body = dict(meta["body"])
    body["size"] = meta["size"]
    if meta.get("cursor") is not None:
        body["search_after"] = meta["cursor"]
    from .build import PostingsIndex

    root = os.path.join(repo, meta["pit_id"])
    ix = PostingsIndex.load(spark, root)
    hits = search_body(ix, body, **kwargs)["hits"]
    rows = hits.collect()          # the wire page (size-bounded)
    if rows:
        last = rows[-1]
        sort_cols = meta["sort_cols"]
        meta["cursor"] = [
            float(last[c]) if c == "score" else last[c]
            for c in sort_cols
        ]
    with open(_smeta_path(repo, meta["scroll_id"]), "w") as fh:
        json.dump(meta, fh)
    if rows:
        return spark.createDataFrame(rows, hits.schema)
    return spark.createDataFrame([], hits.schema)


def open_scroll(spark: SparkSession, index_path: str, repo: str,
                body: dict, *, now: float, size: int = 100,
                scroll_s: float = 300.0, **kwargs
                ) -> tuple[str, DataFrame]:
    """Open a scroll context and return (scroll_id, first page).

    ``body`` is a ``_search`` body WITHOUT from/size/search_after
    (size comes from the ``size`` argument, pagination is the
    context's job).  ``kwargs`` pass through to ``search_body``."""
    for k in ("from", "search_after"):
        if k in body:
            raise ValueError(f"scroll body must not carry {k!r}")
    pit_id = open_pit(index_path, repo, now=now, keep_alive_s=scroll_s)
    scroll_id = "scroll-" + hashlib.sha1(
        f"{pit_id}\x00{now!r}".encode()).hexdigest()[:16]
    sort_cols = [s if isinstance(s, str) else next(iter(s))
                 for s in body.get("sort", [])] or ["score"]
    if "doc_id" not in sort_cols:
        sort_cols.append("doc_id")
    meta = {"scroll_id": scroll_id, "pit_id": pit_id,
            "body": {k: v for k, v in body.items() if k != "size"},
            "size": int(size), "sort_cols": sort_cols, "cursor": None}
    first = _page(spark, repo, meta, now=now, scroll_s=scroll_s, **kwargs)
    return scroll_id, first


def scroll_next(spark: SparkSession, repo: str, scroll_id: str, *,
                now: float, scroll_s: float | None = None, **kwargs
                ) -> DataFrame:
    """The next page (empty page == exhausted).  Passing ``scroll_s``
    renews the context, matching the real API's per-call scroll
    parameter."""
    meta = _read_smeta(repo, scroll_id)
    return _page(spark, repo, meta, now=now, scroll_s=scroll_s, **kwargs)


def close_scroll(repo: str, scroll_id: str) -> None:
    meta = _read_smeta(repo, scroll_id)
    close_pit(repo, meta["pit_id"])
    os.remove(_smeta_path(repo, scroll_id))
