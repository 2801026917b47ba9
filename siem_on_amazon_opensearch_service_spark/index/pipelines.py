"""Search pipelines (the OpenSearch 2.x ``_search/pipeline`` surface)
and search templates (``_search/template``).

Reference semantics target: OpenSearch search pipelines — named
chains of *request processors* (rewrite the search body before
execution), *response processors* (rewrite the hits page after), and
*phase-results processors* (the normalization-processor that powers
hybrid search — already implemented in ``operators/hybrid.py`` and
routed by the body compiler).  The dashboards' hybrid queries and the
security plugins' enforced filters (`filter_query`) ride on this
mechanism.  Search templates are mustache-parameterized stored
bodies — the saved-search shape with runtime parameters.

Spark restatement: request processors are pure body→body rewrites on
the driver (metadata); response processors are narrow DataFrame
transformations appended to the hits page (column renames, truncation
of an already-k-row page, literal sorts) — nothing touches the
corpus-scale plan, which is exactly the OpenSearch contract (the
coordinator applies processors, shards don't).

Processors implemented (the documented core set):

request:  ``filter_query`` (AND an enforced filter into the query),
          ``script`` (declarative body field assignments — the
          painless-lite surface from docops), ``oversample``
          (multiply size by sample_factor for downstream rerank).
response: ``rename_field``, ``truncate_hits`` (undo oversample),
          ``sort`` (re-sort the k-row page by a field),
          ``collapse`` (keep first hit per key on the page).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .build import PostingsIndex
from .searchbody import DEFAULT_TEXT_FIELD, search_body

__all__ = ["apply_request_processors", "apply_response_processors",
           "search_with_pipeline", "render_template"]


def _one(d: dict) -> tuple[str, dict]:
    if len(d) != 1:
        raise ValueError(f"processor must have exactly one key: {d}")
    return next(iter(d.items()))


def apply_request_processors(body: dict, processors: list[dict]) -> dict:
    """Pure body→body rewrites (driver metadata, no job)."""
    import copy

    out = copy.deepcopy(body)
    for p in processors:
        kind, cfg = _one(p)
        if kind == "filter_query":
            enforced = cfg["query"]
            cur = out.get("query", {"match_all": {}})
            out["query"] = {"bool": {"must": [cur], "filter": [enforced]}}
        elif kind == "script":
            # declarative body-field assignments, e.g. {"size": 5}
            for k, v in cfg["source"].items():
                out[k] = v
        elif kind == "oversample":
            factor = float(cfg["sample_factor"])
            out["size"] = int(round(out.get("size", 10) * factor))
            out["_oversampled_from"] = int(
                cfg.get("original_size", 0)) or None
        else:
            raise ValueError(f"unknown request processor {kind!r}")
    return out


def apply_response_processors(hits: DataFrame,
                              processors: list[dict]) -> DataFrame:
    """Narrow transformations over the ≤k-row hits page."""
    for p in processors:
        kind, cfg = _one(p)
        if kind == "rename_field":
            hits = hits.withColumnRenamed(cfg["field"], cfg["target_field"])
        elif kind == "truncate_hits":
            hits = (
                hits.orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(int(cfg["target_size"]))
            )
        elif kind == "sort":
            asc = cfg.get("order", "asc") == "asc"
            col = F.col(cfg["field"])
            hits = hits.orderBy(col.asc() if asc else col.desc(),
                                F.asc("doc_id"))
        elif kind == "collapse":
            w = Window.partitionBy(cfg["field"]).orderBy(
                F.desc("score"), F.asc("doc_id"))
            hits = (hits.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1).drop("_rn"))
        else:
            raise ValueError(f"unknown response processor {kind!r}")
    return hits


def search_with_pipeline(
    ix: PostingsIndex,
    body: dict,
    pipeline: dict,
    positional_ix: PostingsIndex | None = None,
    text_field: str = DEFAULT_TEXT_FIELD,
    vecs: DataFrame | None = None,
    source_docs: DataFrame | None = None,
) -> dict:
    """Execute a search body through a pipeline definition
    ``{"request_processors": [...], "response_processors": [...]}`` —
    the ``?search_pipeline=`` execution path.  Aggregations run over
    the REQUEST-processed query (enforced filters apply to aggs too,
    the filter_query security contract); response processors touch
    only the hits page."""
    req = apply_request_processors(
        body, pipeline.get("request_processors", []))
    res = search_body(ix, req, positional_ix, text_field,
                      vecs=vecs, source_docs=source_docs)
    res["hits"] = apply_response_processors(
        res["hits"], pipeline.get("response_processors", []))
    return res


# ---------------------------------------------------------------------------
# search templates
# ---------------------------------------------------------------------------

_VAR = re.compile(r"\{\{([#/^]?)\s*([A-Za-z0-9_.]+)\s*\}\}")


def render_template(source: dict | str, params: dict) -> dict:
    """Mustache-lite rendering of a stored search template: ``{{var}}``
    substitution with JSON-aware typing (a template value that IS
    exactly one variable keeps the parameter's type — the
    ``{"size": "{{k}}"}`` → ``{"size": 5}`` behavior), plus
    ``{{#var}}...{{/var}}`` section stripping when the param is
    falsy.  Conditional sections only gate whole dict KEYS here (the
    documented toggle-a-clause use).

    This is the dict-level convenience form for templates authored as
    Python dicts. The WIRE-exact ``_search/template`` semantics —
    rendering over the raw JSON text so ``"size": {{size}}`` (unquoted
    splice), ``{{^var}}default{{/var}}`` fallbacks, and
    ``{{#toJson}}var{{/toJson}}`` all work, plus the ``_scripts``
    stored-template registry — live in ``index/templates.py``; prefer
    that module for templates arriving as JSON strings."""
    import json

    if isinstance(source, str):
        source = json.loads(source)

    def subst(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                sec = _VAR.fullmatch(k)
                if sec and sec.group(1) == "#":
                    if params.get(sec.group(2)):
                        inner = subst(v)
                        if not isinstance(inner, dict):
                            raise ValueError("section body must be a dict")
                        out.update(inner)
                    continue
                out[subst(k)] = subst(v)
            return out
        if isinstance(node, list):
            return [subst(x) for x in node]
        if isinstance(node, str):
            m = _VAR.fullmatch(node)
            if m and not m.group(1):
                if m.group(2) not in params:
                    raise KeyError(f"missing template param {m.group(2)!r}")
                return params[m.group(2)]
            return _VAR.sub(
                lambda mm: str(params.get(mm.group(2), "")), node)
        return node

    return subst(source)
