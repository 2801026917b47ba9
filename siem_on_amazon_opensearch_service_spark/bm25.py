"""BM25 scoring -- Lucene/OpenSearch default similarity.

The reference never overrides ``similarity`` in its index templates
(reference deploy_es/data.ini:84-353), so every ``text`` field scores
with Lucene's BM25 defaults:

    k1 = 1.2,  b = 0.75
    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(t,d) = idf(t) * tf / (tf + k1 * (1 - b + b * dl / avgdl))

(Lucene >= 8 drops the legacy ``(k1+1)`` numerator factor as it is
rank-preserving; we keep it OUT, matching modern Lucene. The constant
is exposed should byte-parity with older engines be needed.)

This module has the one formula, in three forms that must agree:
python scalar (oracle), numpy (WAND scorer UDF), and SQL text
(Spark + DuckDB correctness oracle).
"""

from __future__ import annotations

import math

import numpy as np

K1 = 1.2
B = 0.75


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def score_py(tf: float, dl: float, avgdl: float, n_docs: int, df: int) -> float:
    return idf(n_docs, df) * tf / (tf + K1 * (1.0 - B + B * dl / avgdl))


def score_np(tf: np.ndarray, dl: np.ndarray, avgdl: float, idf_val: float) -> np.ndarray:
    """Vectorized per-posting score for one term."""
    tf = tf.astype(np.float64)
    return idf_val * tf / (tf + K1 * (1.0 - B + B * dl / avgdl))


def upper_bound(max_tf: int, idf_val: float) -> float:
    """Block-max score bound: tf/(tf+k1*(1-b+b*dl/avgdl)) is increasing
    in tf and decreasing in dl, so max over a block is bounded by
    dl -> 0 (term factor -> tf/(tf + k1*(1-b)))."""
    t = float(max_tf)
    return idf_val * t / (t + K1 * (1.0 - B))


def score_sql(tf: str, dl: str, avgdl: str, n_docs: str, df: str) -> str:
    """ANSI-SQL text of the formula -- identical string fed to Spark SQL
    and DuckDB so the correctness oracle computes the very same
    expression tree."""
    return (
        f"ln(1 + ({n_docs} - {df} + 0.5) / ({df} + 0.5)) * {tf} / "
        f"({tf} + {K1} * (1 - {B} + {B} * {dl} / {avgdl}))"
    )
