"""Product quantization: ADC math == numpy twin exactly; PQ ranking is
rank-identical to exact search when vectors are codebook-representable
(the lossless case pins the whole pipeline); two-stage rescore
recovers exact top-k; IVF-PQ residual path scores q·cent + ADC."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import pq
from siem_on_amazon_opensearch_service_spark.operators.similarity import (
    cosine_topk,
    make_centroids,
)

DIM, M, KSUB = 16, 4, 8


def _vecs_df(spark, mat):
    rows = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def lossless(spark):
    """Every vector's subvectors come from the first-KSUB codebook
    rows -> PQ reconstruction is exact, ADC == true inner product."""
    rng = np.random.RandomState(7)
    base = rng.randn(KSUB, DIM).astype(np.float32).astype(np.float64)
    dsub = DIM // M
    picks = rng.randint(0, KSUB, size=(120, M))
    mat = np.empty((120, DIM))
    for i in range(120):
        for j in range(M):
            mat[i, j * dsub:(j + 1) * dsub] = base[picks[i, j],
                                                   j * dsub:(j + 1) * dsub]
    mat[:KSUB] = base  # codebook rows ARE the lowest ids
    mat = mat.astype(np.float32).astype(np.float64)
    return mat, _vecs_df(spark, mat).persist()


def test_codebooks_are_first_rows(spark, lossless):
    mat, df = lossless
    books = pq.pq_codebooks(df, M, KSUB)
    dsub = DIM // M
    for j in range(M):
        np.testing.assert_allclose(
            books[j], mat[:KSUB, j * dsub:(j + 1) * dsub], atol=1e-12)
    with pytest.raises(ValueError, match="divisible"):
        pq.pq_codebooks(df, 5, KSUB)


def test_encode_matches_numpy_argmin(spark, lossless):
    mat, df = lossless
    books = pq.pq_codebooks(df, M, KSUB)
    got = {int(r["vec_id"]): list(r["codes"])
           for r in pq.pq_encode(df, books).collect()}
    dsub = DIM // M
    for i in range(len(mat)):
        for j in range(M):
            sub = mat[i, j * dsub:(j + 1) * dsub]
            d2 = ((books[j] - sub) ** 2).sum(1)
            assert got[i][j] == int(d2.argmin())


def test_adc_scores_equal_numpy_and_lossless_truth(spark, lossless):
    mat, df = lossless
    books = pq.pq_codebooks(df, M, KSUB)
    codes = pq.pq_encode(df, books)
    q = np.arange(DIM, dtype=np.float64) / DIM
    top = pq.pq_topk(codes, books, q, k=120)
    got = {int(r["vec_id"]): r["score"] for r in top.collect()}
    # lossless: ADC == exact inner product for every vector
    for i in range(len(mat)):
        assert got[i] == pytest.approx(float(mat[i] @ q), abs=1e-3)


def test_lossless_rank_identity_vs_exact(spark, lossless):
    mat, df = lossless
    books = pq.pq_codebooks(df, M, KSUB)
    codes = pq.pq_encode(df, books)
    q = np.arange(DIM, dtype=np.float64) / DIM
    approx = [int(r["vec_id"])
              for r in pq.pq_topk(codes, books, q, k=10).collect()]
    truth = sorted(range(len(mat)),
                   key=lambda i: (-(mat[i] @ q), i))[:10]
    assert approx == truth


def test_rescore_recovers_exact_topk(spark):
    """Lossy case: random vectors, coarse codebooks -- ADC alone may
    misrank, but the k*refine shortlist + exact cosine rescore must
    return the true top-k whenever the shortlist covers it (checked
    explicitly, no vacuous pass)."""
    rng = np.random.RandomState(11)
    mat = rng.randn(200, DIM)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    df = _vecs_df(spark, mat)
    books = pq.pq_train(df, M, KSUB, n_iter=8, sample_n=200)
    codes = pq.pq_encode(df, books).persist()
    q = list(mat[0] + 0.01 * rng.randn(DIM))

    truth = [int(r["vec_id"])
             for r in cosine_topk(df, q, k=5).collect()]
    short = {int(r["vec_id"])
             for r in pq.pq_topk(codes, books, np.asarray(q), k=40).collect()}
    assert set(truth) <= short, "shortlist must cover truth for this seed"
    got = [int(r["vec_id"])
           for r in pq.pq_topk_rescored(codes, df, books, q,
                                        k=5, refine=8).collect()]
    assert got == truth
    codes.unpersist()


def test_ivfpq_residual_scoring(spark, lossless):
    mat, df = lossless
    cents = make_centroids(df, 4)
    enc, books = pq.ivfpq_encode(df, cents, m=M, ksub=KSUB, n_iter=6)
    enc = enc.persist()
    q = np.arange(DIM, dtype=np.float64) / DIM

    # probe ALL cells -> every vector scored; score must equal
    # q·cent(cell) + ADC(residual) computed in numpy.
    got = {int(r["vec_id"]): r["score"]
           for r in pq.ivfpq_topk(enc, cents, books, q, k=120,
                                  nprobe=4).collect()}
    cmap = {int(r["cent_id"]): np.asarray(list(r["cent_vec"]))
            for r in cents.collect()}
    codes = {int(r["vec_id"]): (int(r["cell"]), list(r["codes"]))
             for r in enc.collect()}
    dsub = DIM // M
    for i, (cell, cd) in codes.items():
        t = np.stack([books[j] @ (q - cmap[cell])[j * dsub:(j + 1) * dsub]
                      for j in range(M)])
        want = float(q @ cmap[cell]) + sum(t[j, cd[j]] for j in range(M))
        assert got[i] == pytest.approx(want, abs=1e-3)
    enc.unpersist()
