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

from .build import PostingsIndex
from .searchbody import search_body


@dataclass
class AliasEntry:
    ix: PostingsIndex
    filter: dict | None = None


@dataclass
class AliasRegistry:
    """The ``_aliases`` actions store: alias -> [(index, filter)]."""

    _store: dict[str, list[AliasEntry]] = dc_field(default_factory=dict)

    def add(self, alias: str, ix: PostingsIndex,
            filter: dict | None = None) -> None:
        self._store.setdefault(alias, []).append(AliasEntry(ix, filter))

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
    if len(entries) == 1:
        e = entries[0]
        return search_body(e.ix, filtered_body(body, e.filter), **kw)
    if body.get("aggs") or body.get("aggregations"):
        raise ValueError(
            "multi-index alias aggregations are not supported -- "
            "query the indices separately or merge with rotation.py")
    frames = []
    for e in entries:
        frames.append(search_body(
            e.ix, filtered_body(body, e.filter), **kw)["hits"])
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return {"hits": out}
