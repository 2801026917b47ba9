"""Parameterized LSH (b, r) + k-means convergence criterion."""

import duckdb
import pytest

from siem_on_amazon_opensearch_service_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.01"


def test_lsh_threshold_curve():
    # defaults: b=4, r=2 -> (1/4)^(1/2) = 0.5
    assert dedup.lsh_threshold() == pytest.approx(0.5)
    # production-ish: b=16, r=8 -> ~0.707
    assert dedup.lsh_threshold(128, 16) == pytest.approx(
        (1 / 16) ** (1 / 8)
    )


def test_lsh_params_cross_engine(spark):
    """Non-default (n_hash=16, n_bands=4, r=4) must agree between the
    Spark operator and its DuckDB twin SQL."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        "doc_id < 200"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["n_bands"], r["est_jaccard"])
        for r in dedup.lsh_candidate_pairs(
            docs, n_hash=16, n_bands=4, max_bucket=32
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet' "
        "WHERE doc_id < 200"
    )
    sql = dedup.duckdb_lsh_pairs_sql(n_hash=16, n_bands=4, max_bucket=32)
    want = {
        (a, b): (n, j) for a, b, n, j in con.execute(sql).fetchall()
    }
    assert got == want


def test_kmeans_converges_early(spark):
    """With a generous iteration budget the tol-based stop must yield
    the same centroids as a long fixed run (converged fixpoint)."""
    vecs = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        "vec_id < 200"
    )
    a = {
        r["cent_id"]: tuple(round(x, 6) for x in r["cent_vec"])
        for r in similarity.kmeans_fit(vecs, 8, n_iter=25, tol=1e-6).collect()
    }
    b = {
        r["cent_id"]: tuple(round(x, 6) for x in r["cent_vec"])
        for r in similarity.kmeans_fit(vecs, 8, n_iter=40, tol=1e-6).collect()
    }
    assert a == b


def test_lsh_production_knobs_cross_engine(spark):
    """The PRODUCTION parameterization (n_hash=128, n_bands=16, r=8,
    S-curve threshold ~0.71) must agree with the DuckDB twin too --
    the toy defaults are not the only tested point."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        "doc_id < 150"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["n_bands"], r["est_jaccard"])
        for r in dedup.lsh_candidate_pairs(
            docs, n_hash=128, n_bands=16, max_bucket=64
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet' "
        "WHERE doc_id < 150"
    )
    sql = dedup.duckdb_lsh_pairs_sql(n_hash=128, n_bands=16, max_bucket=64)
    want = {
        (a, b): (n, j) for a, b, n, j in con.execute(sql).fetchall()
    }
    assert got == want
    # r=8 bands only collide on high similarity: every surviving pair
    # must carry a high estimated jaccard (the S-curve did its job).
    assert all(j >= 0.5 for _, j in got.values())
