"""Benchmark decontamination: flag training documents that overlap an
evaluation set by shared token n-grams — the standard pre-training
hygiene pass (GPT-3 appendix C / PaLM / Llama papers all describe
n-gram-overlap decontamination; 8-13 token grams are typical, scaled
down here only because the synthetic docs are short).

Spark shape: the BENCHMARK side is small by definition (eval suites
are thousands of examples, not billions) — its distinct n-gram set
broadcasts; the corpus side explodes to distinct per-doc n-grams
(narrow, docs stay in place) and the broadcast semi-ish join + one
(doc)-keyed aggregate produces per-doc overlap counts. The corpus is
scanned ONCE; shuffle rows = docs with at least one hit, carrying two
longs each. A doc with zero overlapping grams never reaches the
shuffle (inner join drops it; the final left join restores it with
overlap 0).
"""

from __future__ import annotations
from ..detfloat import round_det

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_col


def ngram_contamination(docs: DataFrame, bench: DataFrame,
                        n: int = 5, text_col: str = "text",
                        id_col: str = "doc_id",
                        bench_text_col: str = "text") -> DataFrame:
    """Per-doc overlap with the benchmark's token ``n``-grams.

    Returns (id, n_grams, n_contaminated, contamination_frac):
    DISTINCT n-grams in the doc, how many also occur anywhere in
    ``bench``, and the fraction. A downstream filter like
    ``contamination_frac > 0`` (strict) or a threshold implements the
    published removal policies. Docs shorter than ``n`` tokens have
    no n-grams, cannot be contaminated, and emit no row.
    """
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(shingles_col(text_col, n)).alias("g"),
    )
    bench_grams = (
        bench.select(F.explode(shingles_col(bench_text_col, n)).alias("g"))
        .distinct()
    )
    totals = doc_grams.groupBy(id_col).agg(
        F.count("*").alias("n_grams"))
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col, "n_grams",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            round_det(
                F.coalesce("n_contaminated", F.lit(0)).cast("double")
                / F.col("n_grams"), 6,
            ).alias("contamination_frac"),
        )
    )
