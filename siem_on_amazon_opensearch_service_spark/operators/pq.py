"""Product quantization (PQ / IVF-PQ) — the compressed ANN path for
10^12-vector scale.

The reference delegates vector search to OpenSearch's k-NN plugin
(Lucene/FAISS engines; behavior target only — no repo code).  FAISS's
IVF-PQ layout is the public algorithm restated here (Jégou, Douze,
Schmid: "Product Quantization for Nearest Neighbor Search", TPAMI
2011): split each d-dim vector into ``m`` subvectors, quantize each
against a ``ksub``-entry per-subspace codebook, store only the m code
bytes; at query time score by *asymmetric distance computation* (ADC):
a per-query (m × ksub) table of subspace inner products, summed by
code lookup — no decompression.

Why this is THE 100 TB shape:

* storage: 64-dim float32 = 256 B → m=8 codes = 8 B (32× smaller);
  the ADC scan is memory-bandwidth bound on the compressed table.
* the per-query work is a driver-side (m × ksub) table (metadata) +
  one narrow scan; composed with IVF cells the scan touches only
  ``nprobe / n_cells`` of the corpus via partition pruning.
* in THIS engine the ADC gather is a **native column expression**
  (``element_at`` per subspace, summed) — the scoring scan is
  whole-stage-codegen'd JVM, no Python in the query hot path.
  Encoding (build-time, one pass) is Arrow-batched numpy.

Deterministic codebooks: :func:`pq_codebooks` takes the ksub
lowest-id vectors' subvectors (the same fixed-"sample" contract as
``similarity.make_centroids`` — testable without randomness);
:func:`pq_train` refines them with per-subspace Lloyd iterations over
a driver-side sample (FAISS likewise trains on a sample).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import cosine_topk, ivf_assign, probe_cells
from ..detfloat import round_det

__all__ = [
    "pq_codebooks", "pq_train", "pq_encode", "adc_table", "pq_topk",
    "pq_topk_rescored", "ivfpq_encode", "ivfpq_topk",
]


def _as_matrix(rows: list, vec_col: str) -> np.ndarray:
    return np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)


def pq_codebooks(vecs: DataFrame, m: int, ksub: int,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> np.ndarray:
    """Deterministic (m, ksub, d/m) codebooks: subvector j of the ksub
    lowest-id vectors. ksub × d floats to the driver — metadata."""
    rows = vecs.orderBy(F.asc(id_col)).limit(ksub).collect()
    mat = _as_matrix(rows, vec_col)          # (ksub, d)
    if mat.shape[1] % m:
        raise ValueError(f"dim {mat.shape[1]} not divisible by m={m}")
    dsub = mat.shape[1] // m
    return np.stack([mat[:, j * dsub:(j + 1) * dsub] for j in range(m)])


def pq_train(vecs: DataFrame, m: int, ksub: int, n_iter: int = 10,
             sample_n: int = 10_000, id_col: str = "vec_id",
             vec_col: str = "embedding") -> np.ndarray:
    """Lloyd-refined codebooks from a deterministic driver-side sample
    (the sample_n lowest-id vectors — FAISS trains PQ on a sample for
    the same reason: codebooks are k·d-sized metadata, the corpus is
    not). Init = :func:`pq_codebooks`; empty code cells keep their
    previous centroid; pure function of the input."""
    rows = vecs.orderBy(F.asc(id_col)).limit(sample_n).collect()
    mat = _as_matrix(rows, vec_col)
    if mat.shape[1] % m:
        raise ValueError(f"dim {mat.shape[1]} not divisible by m={m}")
    dsub = mat.shape[1] // m
    books = []
    for j in range(m):
        sub = mat[:, j * dsub:(j + 1) * dsub]        # (n, dsub)
        cb = sub[:ksub].copy()                       # deterministic init
        for _ in range(n_iter):
            # argmin ||x - c||^2 == argmin (c·c - 2 x·c)
            d2 = (cb * cb).sum(1)[None, :] - 2.0 * sub @ cb.T
            code = d2.argmin(1)
            for c in range(ksub):
                sel = sub[code == c]
                if len(sel):
                    cb[c] = sel.mean(0)
        books.append(cb)
    return np.stack(books)                           # (m, ksub, dsub)


def pq_encode(vecs: DataFrame, codebooks: np.ndarray,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """One build-time pass: (id, codes array<int>) — code j = argmin-L2
    codebook entry for subvector j (ties break code asc, numpy argmin).
    Arrow-batched numpy; output rows are m small ints per vector."""
    import pandas as pd

    m, ksub, dsub = codebooks.shape
    cb = codebooks.copy()
    cnorm = (cb * cb).sum(2)                         # (m, ksub)

    def enc(batches):
        for b in batches:
            if not len(b):
                continue
            x = np.asarray(list(b[vec_col]), dtype=np.float64)
            codes = np.empty((len(b), m), dtype=np.int32)
            for j in range(m):
                sub = x[:, j * dsub:(j + 1) * dsub]
                d2 = cnorm[j][None, :] - 2.0 * sub @ cb[j].T
                codes[:, j] = d2.argmin(1)
            yield pd.DataFrame({id_col: b[id_col],
                                "codes": list(codes)})

    return vecs.select(id_col, vec_col).mapInPandas(
        enc, schema=f"{id_col} long, codes array<int>"
    )


def adc_table(query_vec: np.ndarray | list, codebooks: np.ndarray) -> np.ndarray:
    """(m, ksub) inner products of each query subvector with each
    codebook entry: approx q·x = Σ_j table[j, code_j]."""
    q = np.asarray(query_vec, dtype=np.float64)
    m, ksub, dsub = codebooks.shape
    return np.stack([codebooks[j] @ q[j * dsub:(j + 1) * dsub]
                     for j in range(m)])


def _adc_score_col(table: np.ndarray, codes_col: str = "codes") -> Column:
    """The ADC gather as a NATIVE expression: per-subspace literal
    array indexed by the stored code — whole-stage codegen, no Python
    in the scoring scan. m is small (4-16) so the expression tree is
    flat adds of element_at lookups."""
    m = table.shape[0]
    parts = [
        F.element_at(
            F.array(*[F.lit(float(v)) for v in table[j]]),
            F.col(codes_col)[j] + 1,
        )
        for j in range(m)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def pq_topk(codes: DataFrame, codebooks: np.ndarray,
            query_vec: list | np.ndarray, k: int = 10,
            id_col: str = "vec_id") -> DataFrame:
    """Approximate inner-product top-k over PQ codes (ADC).  One
    narrow scan + TakeOrderedAndProject; the only driver work is the
    (m × ksub) table.  Ties break by id asc."""
    t = adc_table(query_vec, codebooks)
    scored = codes.select(
        F.col(id_col), _adc_score_col(t).alias("score")
    )
    return (
        scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
        .select(id_col, round_det("score", 4).alias("score"))
    )


def pq_topk_rescored(codes: DataFrame, vecs: DataFrame,
                     codebooks: np.ndarray, query_vec: list,
                     k: int = 10, refine: int = 4,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """ADC shortlist (k·refine) then EXACT cosine rescore on the raw
    vectors of the shortlist only — the standard two-stage recall
    repair: the exact pass touches k·refine rows, never the corpus."""
    shortlist = pq_topk(codes, codebooks, query_vec, k * refine, id_col)
    cand = vecs.join(shortlist.select(id_col), id_col, "left_semi")
    return cosine_topk(cand, list(query_vec), k, id_col, vec_col)


def ivfpq_encode(vecs: DataFrame, centroids: DataFrame, m: int,
                 ksub: int, n_iter: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 cent_id: str = "cent_id",
                 cent_vec: str = "cent_vec") -> tuple[DataFrame, np.ndarray]:
    """IVF-PQ build: assign to cells (broadcast argmax), PQ-encode the
    RESIDUAL x − centroid(cell) (FAISS IVFPQ layout — residuals are
    tighter than raw vectors, so the same ksub buys more precision).
    Returns ((id, cell, codes), residual codebooks).  Write the frame
    ``partitionBy("cell")`` for probe-time partition pruning."""
    import pandas as pd

    assign = ivf_assign(vecs, centroids, id_col, vec_col,
                        cent_id, cent_vec)
    cent_rows = centroids.collect()
    cmap = {int(r[cent_id]): np.asarray(list(r[cent_vec]), dtype=np.float64)
            for r in cent_rows}
    joined = vecs.join(assign, id_col).select(id_col, vec_col, "cell")

    # residual frame via one Arrow pass (centroid map is k×d metadata)
    dim = len(next(iter(cmap.values())))

    def resid(batches):
        for b in batches:
            if not len(b):
                continue
            x = np.asarray(list(b[vec_col]), dtype=np.float64)
            cells = b["cell"].to_numpy()
            cent = np.stack([cmap[int(c)] for c in cells])
            r = x - cent
            yield pd.DataFrame({id_col: b[id_col], "cell": cells,
                                "residual": list(r)})

    residuals = joined.mapInPandas(
        resid, schema=f"{id_col} long, cell long, residual array<double>"
    )
    books = pq_train(residuals, m, ksub, n_iter,
                     id_col=id_col, vec_col="residual")
    codes = pq_encode(residuals, books, id_col, "residual")
    out = residuals.select(id_col, "cell").join(codes, id_col)
    return out, books


def ivfpq_topk(enc: DataFrame, centroids: DataFrame,
               codebooks: np.ndarray, query_vec: list | np.ndarray,
               k: int = 10, nprobe: int = 4,
               id_col: str = "vec_id", cent_id: str = "cent_id",
               cent_vec: str = "cent_vec") -> DataFrame:
    """IVF-PQ query: probe the nprobe closest cells, ADC-score their
    codes against per-cell residual tables.  q·x = q·cent_cell +
    Σ_j table_cell[j, code_j]; both the probe list and the per-cell
    tables are driver metadata, the scan is a literal ``cell IN``
    filter (partition pruning on a partitionBy("cell") layout) plus
    native gathers — one narrow job."""
    q = np.asarray(query_vec, dtype=np.float64)
    cells = probe_cells(centroids, list(query_vec), nprobe,
                        cent_id, cent_vec)
    cmap = {int(r[cent_id]): np.asarray(list(r[cent_vec]), dtype=np.float64)
            for r in centroids.collect()}
    scored = None
    for c in cells:
        t = adc_table(q - cmap[c], codebooks)  # residual table vs (q - cent)
        part = enc.filter(F.col("cell") == c).select(
            F.col(id_col),
            (_adc_score_col(t) + F.lit(float(q @ cmap[c]))).alias("score"),
        )
        scored = part if scored is None else scored.unionByName(part)
    return (
        scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
        .select(id_col, round_det("score", 4).alias("score"))
    )
