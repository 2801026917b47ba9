"""NB log-odds quality classifier: cross-engine fit+score identity and
classification sanity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators.classifier import (
    duckdb_nb_sql, nb_fit, nb_score,
)

EN = ["the quick brown fox jumps over the lazy dog and runs away",
      "a good page with useful clear text about science and history",
      "we describe the method and the results of the experiment",
      "this article explains how the system works in practice",
      "readers will find the guide helpful and easy to follow"]
JUNK = ["zzz qqq xxx kkk vvv www yyy zzz qqq xxx",
        "buy now click here buy now click here buy buy buy",
        "asdf jkl qwer uiop zxcv bnm asdf jkl qwer",
        "lorem ipsum dolor sit amet lorem ipsum dolor sit amet",
        "111 222 333 444 555 666 777 888 999 000"]


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i, t in enumerate(EN):
        rows.append((i, t, "en"))
    for i, t in enumerate(JUNK):
        rows.append((100 + i, t, "xx"))
    # held-out docs to score (ids >= 200): one of each flavor
    rows.append((200, "the method results of the science experiment "
                      "are clear and useful", "en"))
    rows.append((201, "qqq zzz xxx buy now click here asdf", "xx"))
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "lang string")


def test_cross_engine_fit_score_identity(spark, docs):
    train = docs.filter("doc_id < 200") \
        .withColumn("label", (F.col("lang") == "en").cast("int"))
    model = nb_fit(train, n_buckets=512)
    got = {r["id"]: (round(r["logit"], 6), r["keep"])
           for r in nb_score(docs, model).collect()}

    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = {r[0]: (round(r[1], 6), bool(r[2]))
            for r in con.execute(duckdb_nb_sql(
                "doc_id < 200", n_buckets=512)).fetchall()}
    assert set(got) == set(want)
    for i in got:
        assert abs(got[i][0] - want[i][0]) <= 1e-5, (i, got[i], want[i])
        assert got[i][1] == want[i][1], i


def test_classifies_held_out_docs(spark, docs):
    train = docs.filter("doc_id < 200") \
        .withColumn("label", (F.col("lang") == "en").cast("int"))
    model = nb_fit(train, n_buckets=512)
    got = {r["id"]: r for r in nb_score(docs, model).collect()}
    assert got[200]["keep"] is True
    assert got[201]["keep"] is False
    # training docs separate cleanly too
    for i in range(5):
        assert got[i]["logit"] > got[100 + i]["logit"]


def test_empty_doc_scores_bias(spark):
    train = spark.createDataFrame(
        [(0, "good text here", 1), (1, "bad junk there", 0)],
        "doc_id long, text string, label int")
    model = nb_fit(train, n_buckets=64)
    scored = nb_score(
        spark.createDataFrame([(9, "")], "doc_id long, text string"),
        model).collect()[0]
    assert abs(scored["logit"] - model.bias) < 1e-12
