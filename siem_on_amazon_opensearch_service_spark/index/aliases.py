"""Index aliases with stored filters — the ``_aliases`` API surface
the reference's multi-tenant pattern uses (an alias like
``log-aws-cloudtrail-tenant1`` pointing at the shared index with a
``filter: {"term": {"tenant": ...}}`` — OpenSearch's documented
row-level-security-by-alias idiom; the rotation/ISM write aliases in
`index/rotation.py` / `index/lifecycle.py` are the unfiltered
special case).

Semantics reproduced: querying a filtered alias runs the request
query AND the alias filter — the filter joins the bool tree in FILTER
context (no score contribution), exactly how OpenSearch rewrites it.
Multiple indices under one alias union (each index keeps its own
filter). Spark shape: the injected filter is one more term-level
clause in the same compiled tree — zero extra passes; the union path
reuses the dated-rotation fan-out contract (per-index BM25 stats, as
documented there).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Window
from pyspark.sql import functions as F

from .build import PostingsIndex
from .searchbody import search_body


@dataclass
class AliasEntry:
    ix: PostingsIndex
    filter: dict | None = None
    name: str | None = None


@dataclass
class AliasRegistry:
    """The ``_aliases`` actions store: alias -> [(index, filter)]."""

    _store: dict[str, list[AliasEntry]] = dc_field(default_factory=dict)

    def add(self, alias: str, ix: PostingsIndex,
            filter: dict | None = None, name: str | None = None) -> None:
        self._store.setdefault(alias, []).append(
            AliasEntry(ix, filter, name))

    def remove(self, alias: str) -> None:
        self._store.pop(alias, None)

    def entries(self, alias: str) -> list[AliasEntry]:
        if alias not in self._store:
            raise KeyError(f"no alias {alias!r}")
        return self._store[alias]


def filtered_body(body: dict, alias_filter: dict | None) -> dict:
    """Rewrite a search body so the alias filter applies in FILTER
    context around the original query — the coordinator rewrite
    OpenSearch performs for filtered aliases."""
    if alias_filter is None:
        return body
    out = dict(body)
    q = out.get("query", {"match_all": {}})
    out["query"] = {"bool": {"must": [q], "filter": [alias_filter]}}
    return out


def alias_search(registry: AliasRegistry, alias: str, body: dict,
                 **kw) -> dict:
    """``_search`` against an alias: each backing index runs the
    filter-wrapped body; a single-index alias returns that response
    unchanged (the common case). Multi-index aliases are supported
    for hits-only bodies by unioning the per-index hit frames (scores
    use each index's own stats — the per-shard semantics OpenSearch
    has by default with dfs_query_then_fetch off)."""
    entries = registry.entries(alias)
    boosts = _indices_boosts(body)
    body = {k: v for k, v in body.items() if k != "indices_boost"}
    if len(entries) == 1:
        e = entries[0]
        res = search_body(e.ix, filtered_body(body, e.filter), **kw)
        b = boosts.get(e.name or "", None)
        if b is not None:
            # a positive multiplier is rank-preserving within one
            # index, so the already-cut page stays valid
            res["hits"] = res["hits"].withColumn(
                "score", F.col("score") * F.lit(b))
        return res
    if body.get("aggs") or body.get("aggregations"):
        raise ValueError(
            "multi-index alias aggregations are not supported -- "
            "query the indices separately or merge with rotation.py")
    if body.get("sort"):
        # a custom sort needs a merge on the SORT KEYS, not _score;
        # the dated-rotation fan-out (rotation.py) implements that
        # merge for its time-keyed case — refuse rather than return a
        # wrongly-ordered union here
        raise ValueError(
            "multi-index alias with a custom sort is not supported -- "
            "merge with rotation.py or query the indices separately")
    frm = int(body.get("from", 0))
    size = int(body.get("size", 10))
    frames = []
    for e in entries:
        # each index contributes its own top (from+size) page; the
        # coordinator cut below merges them -- exactly the per-shard
        # fetch contract (per-index BM25 stats, as documented)
        sub = dict(body, **{"from": 0, "size": frm + size})
        f = search_body(e.ix, filtered_body(sub, e.filter), **kw)["hits"]
        b = boosts.get(e.name or "", None)
        if b is not None:
            f = f.withColumn("score", F.col("score") * F.lit(b))
        frames.append(f)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    # coordinator merge: global score-rank over the union of per-index
    # pages (bounded: n_indices * (from+size) rows), then the
    # request's page cut — previously the no-boost path skipped this
    # and returned up to n_indices * size rows for a size-row request
    out = (out.orderBy(F.desc("score"), F.asc("doc_id"))
           .limit(frm + size))
    if frm:
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        out = (out.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") > frm).drop("_rn"))
    return {"hits": out}


def _indices_boosts(body: dict) -> dict[str, float]:
    """``indices_boost``: list of single-key dicts (the modern form)
    or one flat dict (the legacy form) mapping index name -> score
    multiplier."""
    spec = body.get("indices_boost")
    if not spec:
        return {}
    out: dict[str, float] = {}
    items = spec.items() if isinstance(spec, dict) else (
        kv for d in spec for kv in d.items())
    for name, b in items:
        out[str(name)] = float(b)
    return out
