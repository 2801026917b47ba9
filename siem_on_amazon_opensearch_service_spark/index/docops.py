"""Query-driven document tasks: ``_delete_by_query``,
``_update_by_query``, ``_reindex``, and sliced export (the
``slice`` parallel-scroll shape).

Reference semantics target: the OpenSearch task APIs the SIEM
operations path depends on.  The reference's loader makes every
ingest an upsert through its deterministic MD5 ``_id``
(reference siem/__init__.py:683-706); the cluster side pairs that
with the task APIs — run a query, apply an action to every matched
document — for purges, re-tagging, and re-mapping (ISM's
``rollover``/``force_merge`` ladder at deploy_es/data.ini:66-80 is
the automated cousin).  Sliced scroll is how OpenSearch parallelizes
a full-result-set export: ``slice: {id, max}`` hash-partitions the
matched set into ``max`` disjoint streams.

Spark restatement (all four are ONE DataFrame job each):

* ``delete_by_query`` — compile the ``_search`` body onto the shared
  boolean-tree executor, semi-join nothing: the matched doc ids ARE
  rows, appended to the tombstone table (O(matched) writes; postings
  untouched — the Lucene deleted-docs model in tombstones.py).
* ``update_by_query`` — matched docs get a declarative script applied
  to their *metadata* columns; the docs table is rewritten via temp
  sibling + atomic swap (the self-overwrite-safe pattern from
  ``tombstones.compact``).  Scripts touching indexed text are
  rejected — changing tokenized content without re-indexing would
  desync postings, which is exactly why OpenSearch's
  ``_update_by_query`` re-indexes internally; that path here is
  :func:`reindex`.
* ``reindex`` — source-filtered (query body), script-transformed
  re-build into a destination index.  The ``_source`` store analog is
  the pages/corpus table; dest gets fresh ids/segments exactly like
  OpenSearch.
* ``slice_hits`` / ``sliced_export`` — disjoint hash partition of the
  matched set.  With dense doc ids the default ``doc_id % max`` is
  uniform AND oracle-expressible; ``hashed=True`` switches to
  ``xxhash64`` for non-dense id spaces at scale.

On Iceberg: delete_by_query is ``MERGE INTO … WHEN MATCHED THEN
DELETE``, update_by_query is ``MERGE INTO … WHEN MATCHED THEN UPDATE
SET``, reindex is ``CREATE TABLE AS SELECT`` + the index build;
storage.py documents the mapping.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import PostingsIndex, build_index
from .querystring import tree_scores
from .searchbody import DEFAULT_TEXT_FIELD, compile_query
from .tombstones import TOMBSTONE_TABLE, _store, load_tombstones

#: columns that are part of the inverted-index contract: rewriting
#: them without re-indexing would desync postings/doclen/ids.
_INDEXED_COLS = frozenset({"doc_id", "doclen"})


def matched_ids(
    ix: PostingsIndex,
    body: dict | None,
    positional_ix: PostingsIndex | None = None,
    text_field: str = DEFAULT_TEXT_FIELD,
) -> DataFrame:
    """The matched doc-id set for a ``_search`` body's query (the
    task APIs' shared first step).  ``None``/missing query ==
    match_all.  One postings scan + one shuffle via ``tree_scores``."""
    qnode = (body or {}).get("query", {"match_all": {}})
    tree = compile_query(qnode, text_field)
    res = tree_scores(ix, tree, positional_ix=positional_ix)
    if res is None:  # empty tree == match_all
        return ix.docs.select("doc_id")
    return res.select("doc_id")


def delete_by_query(
    spark: SparkSession,
    path: str,
    body: dict | None,
    positional_ix: PostingsIndex | None = None,
    text_field: str = DEFAULT_TEXT_FIELD,
) -> int:
    """Tombstone every doc matching the body's query.  Returns the
    number newly deleted (already-tombstoned matches are skipped —
    OpenSearch reports those as version conflicts, not deletions).

    The matched set flows executor-to-executor into the tombstone
    table: nothing is collected, so a stopword-sized delete stays
    cluster-sized."""
    ix = PostingsIndex.load(spark, path)
    fresh = (
        matched_ids(ix, body, positional_ix, text_field)
        .join(load_tombstones(spark, path), "doc_id", "left_anti")
        .select(F.col("doc_id").cast("long"))
    )
    n = fresh.count()
    if n:
        _store(path).append(fresh, TOMBSTONE_TABLE)
    return n


def count_matched(
    ix: PostingsIndex,
    body: dict | None,
    positional_ix: PostingsIndex | None = None,
    text_field: str = DEFAULT_TEXT_FIELD,
) -> int:
    """``_count``: matched-doc count for a body's query -- the same
    one-scan matched set, reduced instead of paged."""
    return matched_ids(ix, body, positional_ix, text_field).count()


def validate_query(body: dict | None,
                   text_field: str = DEFAULT_TEXT_FIELD) -> dict:
    """``_validate/query``: compile-only check of a search body.
    Returns ``{"valid": bool, "explanation" | "error": str}`` --
    compilation is pure driver work, no job runs."""
    try:
        tree = compile_query((body or {}).get("query", {"match_all": {}}),
                             text_field)
        return {"valid": True, "explanation": repr(tree)}
    except Exception as e:  # parse/compile errors ARE the API result
        return {"valid": False, "error": str(e)}


# ---------------------------------------------------------------------------
# declarative update scripts (the painless-source analog)
# ---------------------------------------------------------------------------


def script_exprs(script: list[dict] | dict) -> list[tuple[str, Column]]:
    """Compile a declarative script — the engine's stand-in for the
    painless source OpenSearch accepts — into ordered (column, expr)
    assignments.  Each op is one dict:

    * ``{"set":   {field: literal}}``      — ``ctx._source.f = v``
    * ``{"copy":  {dst: src_field}}``      — ``ctx._source.d = ctx._source.s``
    * ``{"inc":   {field: amount}}``       — ``ctx._source.f += n``
    * ``{"lower": [fields]}`` / ``{"upper": [fields]}``
    * ``{"regex_replace": {"field": f, "pattern": p, "replacement": r}}``

    Expressions are built once on the driver and applied as native
    columns — a 10^12-doc update_by_query is a codegen'd projection,
    never per-row Python."""
    ops = script if isinstance(script, list) else [script]
    out: list[tuple[str, Column]] = []
    for op in ops:
        if len(op) != 1:
            raise ValueError(f"script op must have exactly one key: {op}")
        kind, arg = next(iter(op.items()))
        if kind == "set":
            out.extend((f, F.lit(v)) for f, v in arg.items())
        elif kind == "copy":
            out.extend((d, F.col(s)) for d, s in arg.items())
        elif kind == "inc":
            out.extend((f, F.col(f) + F.lit(n)) for f, n in arg.items())
        elif kind in ("lower", "upper"):
            fn = F.lower if kind == "lower" else F.upper
            out.extend((f, fn(F.col(f))) for f in arg)
        elif kind == "regex_replace":
            out.append((
                arg["field"],
                F.regexp_replace(F.col(arg["field"]), arg["pattern"],
                                 arg["replacement"]),
            ))
        else:
            raise ValueError(f"unknown script op: {kind}")
    return out


def _apply_script(df: DataFrame, assigns: list[tuple[str, Column]],
                  gate: Column | None = None) -> DataFrame:
    """Apply assignments in order; with ``gate`` only gated rows
    change (ungated rows keep their value — the matched-set mask)."""
    for fld, expr in assigns:
        if gate is not None and fld in df.columns:
            expr = F.when(gate, expr).otherwise(F.col(fld))
        elif gate is not None:
            expr = F.when(gate, expr)  # new column: NULL off-match
        df = df.withColumn(fld, expr)
    return df


def update_by_query(
    spark: SparkSession,
    path: str,
    body: dict | None,
    script: list[dict] | dict,
    positional_ix: PostingsIndex | None = None,
    text_field: str = DEFAULT_TEXT_FIELD,
) -> int:
    """Apply ``script`` to the metadata columns of every matched doc,
    in place on the saved index.  Returns the matched-doc count.

    Only non-indexed columns may change: an update that touches
    ``text_field``/doc ids raises and must go through :func:`reindex`
    (OpenSearch's _update_by_query re-indexes the doc for the same
    reason).  The docs table is rewritten through a temp sibling and
    atomically swapped after the job completes — the lineage reading
    ``{path}/docs`` never sees its own overwrite."""
    assigns = script_exprs(script)
    touched = {f for f, _ in assigns}
    bad = touched & (_INDEXED_COLS | {text_field})
    if bad:
        raise ValueError(
            f"update_by_query cannot rewrite indexed columns {sorted(bad)}; "
            "use reindex()"
        )
    ix = PostingsIndex.load(spark, path)
    m = matched_ids(ix, body, positional_ix, text_field)
    n = m.count()
    flagged = ix.docs.join(
        m.withColumn("_hit", F.lit(True)), "doc_id", "left"
    )
    updated = _apply_script(
        flagged, assigns, gate=F.col("_hit").isNotNull()
    ).drop("_hit")

    work = os.path.join(path, "docs.updating")
    updated.write.mode("overwrite").parquet(work)
    dst = os.path.join(path, "docs")
    shutil.rmtree(dst)
    shutil.move(work, dst)
    # refresh the catalog's listing cache for NEW reads of the path.
    # NOTE the visibility contract: PostingsIndex handles loaded BEFORE
    # this update pinned the old part-file listing in their plans and
    # must be re-loaded (PostingsIndex.load) before their next action —
    # the OpenSearch "refresh" analog; Iceberg snapshot reads make this
    # a non-issue (old handles keep reading their snapshot).
    spark.catalog.refreshByPath(dst)
    return n


def reindex(
    spark: SparkSession,
    pages: DataFrame,
    dest_path: str,
    src_ix: PostingsIndex | None = None,
    src_path: str | None = None,
    body: dict | None = None,
    script: list[dict] | dict | None = None,
    text_col: str = "text",
    positional_ix: PostingsIndex | None = None,
    salt_threshold: int = 100_000,
) -> PostingsIndex:
    """``_reindex``: select (query body) + transform (script) source
    documents and build a fresh index at ``dest_path``.

    ``pages`` is the ``_source`` store analog — the corpus table the
    source index was built from (the saved index keeps only metadata,
    exactly like a Lucene index without stored fields would need the
    upstream table).  ``src_ix``/``src_path`` supply query matching
    and the tombstone mask; with neither, the whole live corpus
    reindexes.  Scripts MAY rewrite ``text`` here: dest re-tokenizes.

    One pass: matched ids resolve through the shared tree executor,
    the page subset is a semi-join on url (broadcast-able when the
    match set is small, AQE decides), then the standard one-shuffle
    index build."""
    sel = pages
    if src_ix is None and src_path is not None:
        src_ix = PostingsIndex.load(spark, src_path)
    if body is not None and src_ix is None:
        raise ValueError("reindex with a query body needs src_ix/src_path")
    if src_ix is not None:
        ids = matched_ids(src_ix, body, positional_ix, text_col)
        if src_path is not None:
            ids = ids.join(load_tombstones(spark, src_path),
                           "doc_id", "left_anti")
        urls = src_ix.docs.join(ids, "doc_id").select("url")
        sel = sel.join(urls, "url", "left_semi")
    if script is not None:
        sel = _apply_script(sel, script_exprs(script))
    # dest gets fresh dense ids (OpenSearch reindex likewise re-shards)
    if "doc_id" in sel.columns:
        sel = sel.drop("doc_id")
    out = build_index(spark, sel, text_col=text_col,
                      salt_threshold=salt_threshold)
    out.save(spark, dest_path)
    return PostingsIndex.load(spark, dest_path)


# ---------------------------------------------------------------------------
# sliced scroll / parallel export
# ---------------------------------------------------------------------------


def slice_col(max_slices: int, id_col: str = "doc_id",
              hashed: bool = False) -> Column:
    """The slice assignment: disjoint, complete, deterministic.
    Dense doc ids make plain modulo uniform (and SQL-oracle
    expressible); ``hashed`` switches to xxhash64 for sparse/skewed
    id spaces — OpenSearch likewise hashes ``_id``."""
    base = F.xxhash64(F.col(id_col)) if hashed else F.col(id_col)
    return F.pmod(base, F.lit(max_slices)).cast("int")


def slice_hits(
    ix: PostingsIndex,
    body: dict | None,
    slice_id: int,
    max_slices: int,
    positional_ix: PostingsIndex | None = None,
    text_field: str = DEFAULT_TEXT_FIELD,
    hashed: bool = False,
) -> DataFrame:
    """One slice of the matched set, doc_id-ordered — the per-client
    sliced-scroll stream.  Slices partition the matched set: every
    matched doc appears in exactly one slice."""
    if not 0 <= slice_id < max_slices:
        raise ValueError("slice id out of range")
    m = matched_ids(ix, body, positional_ix, text_field)
    return (
        m.filter(slice_col(max_slices, hashed=hashed) == slice_id)
        .orderBy("doc_id")
    )


def sliced_export(
    ix: PostingsIndex,
    body: dict | None,
    out_path: str,
    max_slices: int,
    positional_ix: PostingsIndex | None = None,
    text_field: str = DEFAULT_TEXT_FIELD,
    hashed: bool = False,
) -> None:
    """Export the full matched doc set partitioned by slice: ONE job
    writes ``out_path/slice=N`` directories that ``max_slices``
    independent consumers stream without coordination (the training
    data-loader handoff shape).  Spark's write is already parallel;
    the slice column exists for the CONSUMERS' sake."""
    m = matched_ids(ix, body, positional_ix, text_field)
    (
        ix.docs.join(m, "doc_id", "left_semi")
        .withColumn("slice", slice_col(max_slices, hashed=hashed))
        .write.partitionBy("slice").mode("overwrite").parquet(out_path)
    )


def mget(ix, ids: list, source_docs: DataFrame | None = None) -> DataFrame:
    """``_mget``: fetch documents by id, RESPONSE IN REQUEST ORDER
    with a ``found`` flag per slot (missing ids still occupy their
    slot — the wire contract). ``source_docs`` joins the stored
    ``_source`` columns alongside the index's doc metadata when the
    corpus table is available.

    Plan: the id list is a driver-side literal (requests are
    human-sized) — broadcast left join from the ids frame, one
    metadata-bounded job, never a scan ordered by anything else.
    """
    spark = ix.docs.sparkSession
    req = spark.createDataFrame(
        [(i, int(n)) for n, i in enumerate(ids)], "doc_id long, _slot int")
    docs = ix.docs
    if source_docs is not None:
        extra = [c for c in source_docs.columns if c not in docs.columns]
        docs = docs.join(source_docs.select("doc_id", *extra),
                         "doc_id", "left")
    out = (
        F.broadcast(req).join(docs, "doc_id", "left")
        .withColumn("found", F.col(docs.columns[1]).isNotNull())
        .orderBy("_slot")
        .drop("_slot")
    )
    return out
