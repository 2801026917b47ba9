"""DSIR importance resampling: Spark vs the single-statement DuckDB
oracle, plus the semantic property (target-like docs up-weighted) and
plan shape (broadcast ratio join, TakeOrdered selection)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators.dsir import (
    dsir_logweights,
    dsir_sample,
    duckdb_dsir_sql,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
B = 2048


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    return con


RAW_W = "doc_id < 300"
TGT_W = "doc_id >= 300 AND lang = 'en' AND n_chars > 300"


def _split(docs):
    raw = docs.filter(F.col("doc_id") < 300)
    tgt = docs.filter((F.col("doc_id") >= 300) & (F.col("lang") == "en")
                      & (F.col("n_chars") > 300))
    return raw, tgt


def test_dsir_sample_matches_duckdb(spark, docs, duck):
    raw, tgt = _split(docs)
    got = [(int(r.id), round(float(r.logw), 6))
           for r in dsir_sample(raw, tgt, k=40, n_buckets=B).collect()]
    want = [(int(a), round(float(b), 6)) for a, b in duck.execute(
        duckdb_dsir_sql(RAW_W, TGT_W, k=40, n_buckets=B)).fetchall()]
    assert got == want
    assert len(got) == 40


def test_dsir_deterministic(spark, docs):
    raw, tgt = _split(docs)
    a = dsir_sample(raw, tgt, k=20, n_buckets=B).collect()
    b = dsir_sample(raw, tgt, k=20, n_buckets=B).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_target_like_docs_upweighted(spark):
    """Semantic check on docs with DISTINCT topic vocabularies (the
    sf corpus shares one vocabulary across langs, so it cannot
    separate): raw docs written in the target topic must average a
    higher log-weight than off-topic raw docs of the same length."""
    med = ["alpha beta gamma delta epsilon zeta eta theta"] * 1
    web = ["click buy now free offer deal sale spam"] * 1

    def mk(ids, words):
        return [(i, " ".join(words * 5)) for i in ids]

    tgt = spark.createDataFrame(
        mk(range(100, 120), med[0].split()),
        "doc_id long, text string")
    like = mk(range(0, 10), med[0].split())
    unlike = mk(range(10, 20), web[0].split())
    raw = spark.createDataFrame(like + unlike,
                                "doc_id long, text string")
    w = {r.id: r.logw for r in
         dsir_logweights(raw, tgt, n_buckets=B).collect()}
    wl = [w[i] for i in range(0, 10)]
    wu = [w[i] for i in range(10, 20)]
    assert min(wl) > max(wu)


def test_plan_broadcast_ratio_and_takeordered(spark, docs):
    raw, tgt = _split(docs)
    out = dsir_sample(raw, tgt, k=10, n_buckets=B)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # ratio table never shuffles docs
