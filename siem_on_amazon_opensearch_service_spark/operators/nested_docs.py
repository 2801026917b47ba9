"""OpenSearch ``nested`` field type: per-element query and aggregation
semantics over ``array<struct>`` columns.

The reference's index template declares 15 ``nested``-typed fields
(``threat.enrichments`` at deploy_es/data.ini:280 — written by the IOC
enrichment join, es_loader/siem/ioc.py:259-284 — plus the SecurityHub /
Config inventory fields, data.ini:574-627).  The semantic that makes
``nested`` a distinct type (and not just ``object``) is element
scoping: a **nested query matches a parent document only when a SINGLE
nested element satisfies ALL inner clauses**, whereas the flattened
``object`` mapping lets each clause match a *different* element.
OpenSearch/Lucene implements this with block-indexed child documents
and a block join (ToParentBlockJoinQuery); ``inner_hits`` returns the
matching child per parent, and the ``nested`` aggregation switches the
bucket context from parents to child elements.

Spark-first restatement — children stay INLINE as an ``array<struct>``
column and every per-element predicate runs through native
higher-order functions (``exists`` / ``filter`` / ``aggregate``),
which Catalyst evaluates inside whole-stage codegen:

* no join at query time (Lucene's block join exists because its docs
  are flat; an array column IS the parent-child block, co-located by
  construction — the right layout at 100 TB, where a separate child
  table would force a parent-child shuffle join on every query);
* the only shuffle anywhere is the one ``groupBy`` that materializes
  the nested column at index-build time (``nest_children``), and a
  production table would persist that layout once;
* ``inner_hits`` is ``array_sort(filter(...), comparator)[0]`` —
  per-row work, no window function, no extra stage.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ElementPred = Callable[[Column], Column]


def nest_children(df: DataFrame, parent_keys: list[str],
                  child_cols: list[str],
                  name: str = "children") -> DataFrame:
    """Materialize the nested layout: one row per parent with its
    child documents collected into ``array<struct>`` (the index-time
    analog of Lucene's child-doc block; ref data.ini:280 mapping).

    One shuffle on the parent key — the same shuffle a doc-grouped
    index build already pays; at scale this is written once,
    partitioned by parent, and every nested query after it is
    shuffle-free."""
    return df.groupBy(*parent_keys).agg(
        F.collect_list(F.struct(*child_cols)).alias(name)
    )


def nested_match(nested: DataFrame, name: str,
                 pred: ElementPred) -> DataFrame:
    """``nested`` query: parents where ONE element satisfies the whole
    inner conjunction (``pred`` receives the element struct). Native
    ``exists`` — codegen, no join, no shuffle."""
    return nested.filter(F.exists(F.col(name), pred))


def object_match(nested: DataFrame, name: str,
                 preds: list[ElementPred]) -> DataFrame:
    """The contrast case: flattened ``object`` semantics, where each
    clause may be satisfied by a DIFFERENT element (what you get if a
    field is mapped ``object`` instead of ``nested`` — the classic
    cross-element false positive the nested type exists to prevent)."""
    conds = [F.exists(F.col(name), p) for p in preds]
    return nested.filter(reduce(lambda a, b: a & b, conds))


def nested_count(nested: DataFrame, name: str,
                 pred: ElementPred) -> DataFrame:
    """``nested`` aggregation context: per-parent count of matching
    child elements (bucket context = children, not parents). Native
    ``size(filter(...))`` — per-row, zero extra stages."""
    return nested.withColumn(
        "n_matched_children", F.size(F.filter(F.col(name), pred))
    )


def inner_hits(nested: DataFrame, name: str, pred: ElementPred,
               comparator: Callable[[Column, Column], Column],
               size: int = 1) -> DataFrame:
    """``inner_hits``: the best ``size`` matching child elements per
    matching parent, under an explicit sort — implemented as
    ``slice(array_sort(filter(children, pred), cmp), 1, size)``.
    Parents with no matching element are dropped (nested-query
    semantics). Returns the parent row plus a ``hits`` array."""
    matched = F.filter(F.col(name), pred)
    hits = F.slice(F.array_sort(matched, comparator), 1, size)
    return (
        nested.withColumn("hits", hits)
        .filter(F.size("hits") > 0)
    )


def reverse_nested_terms(nested: DataFrame, name: str, child_field: str,
                         parent_keys: list[str]) -> DataFrame:
    """``reverse_nested`` aggregation: inside a nested (child) bucket
    context, jump back to counting PARENT documents — "top child
    values, and how many parents contain each" (e.g. top IOC
    indicator values by number of affected events; the nested agg
    alone would overcount parents with several matching children).

    Returns (child value, nested doc_count = child elements,
    reverse doc_count = distinct parents). One explode (narrow — the
    array column is already parent-co-located) + one hash agg on the
    child value; the distinct-parent count is an agg-side
    countDistinct over the bounded per-bucket parent set."""
    elems = nested.select(
        *parent_keys, F.explode(F.col(name)).alias("_e")
    ).select(*parent_keys, F.col(f"_e.{child_field}").alias("child_value"))
    return elems.groupBy("child_value").agg(
        F.count("*").alias("doc_count"),
        F.countDistinct(*parent_keys).alias("reverse_doc_count"),
    )
