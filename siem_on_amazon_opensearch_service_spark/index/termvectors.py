"""``_termvectors`` / ``_mtermvectors`` — per-document term
statistics (tf, positions, per-term df) plus field-level stats, the
API OpenSearch plugins and relevance tooling read (the More-Like-This
builder and the LTR feature-inspection flows both sit on it).

OpenSearch serves term vectors by re-analyzing the stored ``_source``
whenever vectors aren't stored with the field — this module does
exactly that, with the engine's single shared analyzer: the requested
docs (an id list — metadata-sized by API shape) filter from the
corpus table, tokenize natively, and one explode + groupBy yields
(term, tf, positions). ``term_statistics=true`` joins the per-term
``df`` from the index's ``term_stats`` table — the doc-side frame is
tiny, so Catalyst broadcasts it against term_stats and the join never
shuffles the stats table. Field statistics (sum_doc_freq, doc_count,
sum_ttf) reduce from the same term_stats relation in one aggregate.

Positions are 1-based token offsets (the analyzer's output order),
matching what a positions-enabled Lucene field stores
(``index_options: positions`` — the reference maps every ``text``
field that way, deploy_es/data.ini:104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import tokens_col
from .build import PostingsIndex


def term_vectors(docs: DataFrame, doc_ids: list[int],
                 ix: PostingsIndex | None = None,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Term vectors for ``doc_ids``: one row per (doc, term) with
    ``tf`` and sorted 1-based ``positions``; with ``ix`` given, each
    term also carries its corpus ``df`` (term_statistics=true)."""
    ids = [int(d) for d in doc_ids]
    base = (
        docs.filter(F.col(id_col).isin(ids))
        .select(F.col(id_col).alias("doc_id"),
                F.posexplode(tokens_col(text_col))
                .alias("pos0", "term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"),
             F.sort_array(F.collect_list(F.col("pos0") + 1))
             .alias("positions"))
    )
    if ix is None:
        return base
    return (
        base.join(ix.term_stats.select("term", "df"), "term", "left")
        .na.fill(0, ["df"])
        .select("doc_id", "term", "tf", "positions",
                F.col("df").cast("long").alias("df"))
    )


def field_statistics(ix: PostingsIndex) -> DataFrame:
    """The response's ``field_statistics`` block: sum_doc_freq (Σ df),
    doc_count, and sum_ttf (Σ doclen — every analyzed token is an
    indexed term occurrence). One aggregate over metadata tables."""
    sums = ix.term_stats.agg(
        F.sum("df").cast("long").alias("sum_doc_freq"))
    ttf = ix.docs.agg(F.sum("doclen").cast("long").alias("sum_ttf"),
                      F.count("*").cast("long").alias("doc_count"))
    return sums.crossJoin(ttf).select(
        "sum_doc_freq", "doc_count", "sum_ttf")


def mterm_vectors(docs: DataFrame, doc_ids: list[int],
                  ix: PostingsIndex | None = None,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """``_mtermvectors``: same frame, the multi-doc wire name (one
    pass regardless of id count — that's already how
    :func:`term_vectors` executes)."""
    return term_vectors(docs, doc_ids, ix, text_col, id_col)
