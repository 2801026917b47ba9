"""Search pipelines — the ``_search/pipeline`` surface (OpenSearch
2.x search-pipelines feature): named chains of request processors
(rewrite the search body before execution) and response processors
(rewrite the hits page after execution), the mechanism behind the
hybrid normalization default and the UI's result shaping.

Execution model mirrors upstream exactly: request processors run in
order against the BODY (a dict — driver-side metadata, zero cluster
work), the rewritten body executes once through the ordinary
``search_body`` path, then response processors run in order against
the HITS page. The page is ``size``-bounded, so every response
processor is metadata-sized work no matter the corpus — the one
deliberate exception is documented on :func:`_resp_collapse`.

Supported processors (the documented set that is expressible without
arbitrary scripting):

* request: ``filter_query`` (AND an extra query into filter context),
  ``oversample`` (scale ``size`` by ``sample_factor``, remembering the
  original — the two-phase rerank/truncate pattern).
* response: ``rename_field``, ``truncate_hits`` (explicit
  ``target_size`` or the oversample-remembered original),
  ``collapse`` (field dedup keeping the best hit), ``sort`` (re-sort
  the page on a field). Each honors the upstream ``ignore_failure``
  flag.

The phase-results normalization processor is already native to the
body executor (``hybrid`` queries with normalization/combination
blocks route through ``operators/hybrid.py:normalized_fuse``), so a
pipeline carrying one is accepted and simply documented as a no-op
here.

Reference anchor: the reference's dashboards consume OpenSearch 2.x
endpoints where the default hybrid pipeline is a search pipeline
(reference README's SIEM stack version); this module supplies the
engine-side contract.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class SearchPipeline:
    """A named processor chain (`PUT /_search/pipeline/<id>` body)."""

    request_processors: list[dict] = field(default_factory=list)
    response_processors: list[dict] = field(default_factory=list)
    phase_results_processors: list[dict] = field(default_factory=list)

    @classmethod
    def from_body(cls, body: dict) -> "SearchPipeline":
        return cls(
            request_processors=list(body.get("request_processors", [])),
            response_processors=list(body.get("response_processors", [])),
            phase_results_processors=list(
                body.get("phase_results_processors", [])),
        )


def _one(spec: dict) -> tuple[str, dict]:
    (k, v), = spec.items()
    return k, v


# ---------------------------------------------------------------------------
# request processors: dict -> dict
# ---------------------------------------------------------------------------


def _req_filter_query(body: dict, params: dict, ctx: dict) -> dict:
    """AND the processor's query into filter context (non-scoring) —
    the tenant/security-filter injection pattern."""
    out = copy.deepcopy(body)
    orig = out.get("query", {"match_all": {}})
    out["query"] = {"bool": {"must": [orig],
                             "filter": [params["query"]]}}
    return out


def _req_oversample(body: dict, params: dict, ctx: dict) -> dict:
    factor = float(params["sample_factor"])
    if factor < 1.0:
        raise ValueError("oversample sample_factor must be >= 1")
    out = dict(body)
    size = int(out.get("size", 10))
    ctx["original_size"] = size
    out["size"] = int(size * factor)
    return out


_REQUEST = {"filter_query": _req_filter_query,
            "oversample": _req_oversample}


# ---------------------------------------------------------------------------
# response processors: hits DataFrame -> hits DataFrame
# ---------------------------------------------------------------------------


def _resp_rename_field(hits: DataFrame, params: dict,
                       ctx: dict) -> DataFrame:
    src, dst = params["field"], params["target_field"]
    if src not in hits.columns:
        raise ValueError(f"rename_field: no field {src!r} in hits")
    if dst in hits.columns:
        raise ValueError(f"rename_field: target {dst!r} already exists")
    return hits.withColumnRenamed(src, dst)


def _resp_truncate_hits(hits: DataFrame, params: dict,
                        ctx: dict) -> DataFrame:
    n = params.get("target_size", ctx.get("original_size"))
    if n is None:
        raise ValueError("truncate_hits needs target_size or a "
                         "preceding oversample processor")
    return hits.limit(int(n))


def _resp_collapse(hits: DataFrame, params: dict, ctx: dict) -> DataFrame:
    """Field dedup keeping each key's best hit, page order preserved.

    The page is size-bounded so this window is driver-trivial; pair
    with ``oversample``/``truncate_hits`` (exactly the upstream docs'
    recipe) since collapsing can only shrink the page."""
    key = params["field"]
    w = Window.partitionBy(key).orderBy(F.desc("score"), F.asc("doc_id"))
    return (hits.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1).drop("_rk")
            .orderBy(F.desc("score"), F.asc("doc_id")))


def _resp_sort(hits: DataFrame, params: dict, ctx: dict) -> DataFrame:
    fields = params["sort"] if isinstance(params.get("sort"), list) \
        else [params.get("sort", params.get("field"))]
    order = str(params.get("order", "asc")).lower()
    cols = []
    for f_ in fields:
        c = F.col(f_)
        cols.append(c.desc() if order == "desc" else c.asc())
    cols.append(F.asc("doc_id"))
    return hits.orderBy(*cols)


def _resp_rerank(hits: DataFrame, params: dict, ctx: dict) -> DataFrame:
    """The 2.12 ``rerank`` response processor (cross-encoder
    reranking): re-score the hits page with a caller-supplied model.

    ``score_fn(query_text, list[str]) -> list[float]`` is the
    model-inference seam (the actual cross-encoder checkpoint is not
    in this container; tests pass a deterministic fake). The page is
    ``size``-bounded — standard practice pairs this with
    ``oversample`` so the expensive model sees ``size × factor``
    candidates, never the corpus — so inference runs ONCE on the
    driver over collected page rows; at cluster scale the page is
    still k rows, not data."""
    fn = params.get("score_fn")
    if fn is None:
        raise ValueError(
            "rerank needs score_fn (the cross-encoder seam: "
            "score_fn(query_text, [doc_text, ...]) -> [float, ...])")
    field = params.get("document_field", "text")
    qtext = params.get("query_text", ctx.get("query_text", ""))
    rows = hits.collect()
    if not rows:
        return hits
    scores = [float(s) for s in fn(qtext, [r[field] for r in rows])]
    spark = hits.sparkSession
    out = spark.createDataFrame(
        [r.asDict() | {"score": s} for r, s in zip(rows, scores)],
        schema=hits.schema)
    return out.orderBy(F.desc("score"), F.asc("doc_id"))


_RESPONSE = {"rename_field": _resp_rename_field,
             "truncate_hits": _resp_truncate_hits,
             "collapse": _resp_collapse,
             "sort": _resp_sort,
             "rerank": _resp_rerank}


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------


def apply_request(pipeline: SearchPipeline, body: dict,
                  ctx: dict) -> dict:
    for spec in pipeline.request_processors:
        kind, params = _one({k: v for k, v in spec.items()
                             if k not in ("tag", "description",
                                          "ignore_failure")})
        fn = _REQUEST.get(kind)
        if fn is None:
            raise ValueError(f"unsupported request processor {kind!r}")
        try:
            body = fn(body, params, ctx)
        except Exception:
            if spec.get("ignore_failure"):
                continue
            raise
    return body


def apply_response(pipeline: SearchPipeline, hits: DataFrame,
                   ctx: dict) -> DataFrame:
    for spec in pipeline.response_processors:
        kind, params = _one({k: v for k, v in spec.items()
                             if k not in ("tag", "description",
                                          "ignore_failure")})
        fn = _RESPONSE.get(kind)
        if fn is None:
            raise ValueError(f"unsupported response processor {kind!r}")
        try:
            hits = fn(hits, params, ctx)
        except Exception:
            if spec.get("ignore_failure"):
                continue
            raise
    return hits


def search_with_pipeline(ix, body: dict,
                         pipeline: SearchPipeline | dict,
                         **search_kwargs) -> dict:
    """`GET /index/_search?search_pipeline=<id>`: request chain ->
    one ordinary ``search_body`` execution -> response chain over the
    hits page. Aggregations pass through untouched (upstream response
    processors operate on hits only)."""
    from .searchbody import search_body

    if isinstance(pipeline, dict):
        pipeline = SearchPipeline.from_body(pipeline)
    for spec in pipeline.phase_results_processors:
        kind, _ = _one({k: v for k, v in spec.items()
                        if k not in ("tag", "description",
                                     "ignore_failure")})
        if kind != "normalization-processor":
            raise ValueError(
                f"unsupported phase_results processor {kind!r}")
        # normalization is native to the hybrid body executor
        # (normalized_fuse); nothing to do at this layer.
    ctx: dict = {}
    body = apply_request(pipeline, body, ctx)
    q = body.get("query", {})
    if isinstance(q, dict) and "match" in q:
        # default rerank query text from a simple match body
        (_, v), = q["match"].items()
        ctx["query_text"] = v if isinstance(v, str) \
            else str(v.get("query", ""))
    res = search_body(ix, body, **search_kwargs)
    res["hits"] = apply_response(pipeline, res["hits"], ctx)
    return res
