r"""``_msearch`` -- batched search-body execution over ONE shared scan.

OpenSearch Dashboards renders a dashboard by POSTing every panel's
search body in a single ``_msearch`` request (the reference's
dashboards are 5-15 panels each, all against the same dated-index
alias; see `source/saved_objects/each-dashboard/*.ndjson` -- each
visualization is one body).  Server-side, OpenSearch still executes
the bodies independently; on Spark we can do strictly better: compile
every body's query tree, assign leaf ids FOREST-WIDE, and run all
posting leaves through ONE ``term IN (...)``-pushed postings scan and
ONE groupBy(doc_id) shuffle (``querystring.forest_scores``).  Each
body then gates/scores natively over the shared per-doc hit array, so
a 10-panel dashboard costs one decode pass instead of ten.

Scale posture (100 TB): the shared frame is docs LEFT JOIN hit-arrays
-- its size is the docs table, its cost is one postings scan bounded
by the union of all panels' terms.  It is persisted
(MEMORY_AND_DISK) for the duration of the batch because the N
per-panel top-k/agg jobs are separate Spark actions; the caller
releases it via ``MSearchResponse.release()``.  Per-panel work after
the shared frame is a filter + TakeOrderedAndProject (hits) or a
filter + partial/final hash agg (aggs) -- no per-panel shuffle of the
corpus.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .build import PostingsIndex
from .querystring import forest_scores
from .searchbody import (
    DEFAULT_TEXT_FIELD,
    _one,
    _vector_scored,
    apply_rescore,
    compile_query,
    hits_page,
    run_aggs,
)


@dataclass
class MSearchResponse:
    """Per-body responses (input order), each
    ``{"hits": DataFrame, "aggs": {path: DataFrame}}``, plus the
    shared persisted frame handle."""

    responses: list = dc_field(default_factory=list)
    shared: DataFrame | None = None

    def release(self) -> None:
        """Unpersist the shared decode frame (call after the batch's
        results are consumed)."""
        if self.shared is not None:
            self.shared.unpersist()
            self.shared = None

    def __iter__(self):
        return iter(self.responses)

    def __getitem__(self, i):
        return self.responses[i]

    def __len__(self):
        return len(self.responses)


def msearch(
    ix: PostingsIndex,
    bodies: list[dict],
    positional_ix: PostingsIndex | None = None,
    text_field: str = DEFAULT_TEXT_FIELD,
    vecs: DataFrame | None = None,
    source_docs: DataFrame | None = None,
    persist: bool = True,
) -> MSearchResponse:
    """Execute a batch of ``_search`` bodies like ``_msearch`` -- but
    over one shared postings scan + shuffle (see module docstring).

    Vector bodies (top-level ``knn`` / ``hybrid``) don't read
    postings the same way and fall back to their per-body plan inside
    the same response list.  Each response matches
    ``search_body(ix, body)`` exactly (pinned by tests)."""
    slots: list[tuple[str, object]] = []  # ("tree", tree) | ("vec", qnode)
    trees: list = []
    for body in bodies:
        from .searchbody import resolve_terms_lookup

        qnode = resolve_terms_lookup(
            body.get("query", {"match_all": {}}), ix)
        qkind, _ = _one(qnode)
        if qkind in ("knn", "hybrid"):
            slots.append(("vec", qnode))
        else:
            tree = compile_query(qnode, text_field)
            slots.append(("tree", len(trees)))
            trees.append(tree)

    scored_by_tree, shared = forest_scores(
        ix, trees, positional_ix=positional_ix, with_docs=True,
        persist=persist,
    )

    responses: list[dict] = []
    for body, (kind, ref) in zip(bodies, slots):
        if kind == "vec":
            scored = _vector_scored(ix, ref, positional_ix, text_field,
                                    vecs, "vec_id", "embedding")
        else:
            scored = scored_by_tree[ref]
            if scored is None:  # empty tree == match_all
                scored = ix.docs.withColumn("score", F.lit(1.0))
        hits_in = scored
        if "rescore" in body:
            hits_in = apply_rescore(ix, scored, body, text_field,
                                    positional_ix)
        res: dict = {
            "hits": hits_page(hits_in, body, text_field, source_docs)
        }
        aggs_spec = body.get("aggs", body.get("aggregations"))
        if aggs_spec:
            res["aggs"] = run_aggs(scored, aggs_spec, text_field,
                                   background=ix.docs)
        responses.append(res)
    return MSearchResponse(responses=responses, shared=shared)
