"""Analyzer-chain extensions: Spark vs Python vs DuckDB parity, and
BM25 over an analyzed field via text re-materialization."""

import duckdb
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.analysis import (
    duckdb_tokens_sql, tokenize_py,
)
from siem_on_amazon_opensearch_service_spark.analysis_ext import (
    ENGLISH_STOPWORDS, analyzed_text, analyzed_tokens, duckdb_s_stem_sql,
    duckdb_stop_sql, duckdb_synonym_sql, py_analyzed_tokens, py_s_stem,
    s_stem,
)
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.query import bm25_topk
from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex

TEXTS = [
    "The quick foxes and the lazy dogs are chasing buses",
    "glasses misses kisses addresses",
    "ladies bodies ties pies lies",
    "status virus basis this his gas is as",
    "errors in the databases of these companies",
    "",
    "Chris discusses the crisis",
]

SYN = {"dogs": "canines", "quick": "fast"}


def test_s_stem_rules():
    cases = {
        "glasses": "glass", "misses": "miss", "buses": "buse",
        "ladies": "lady", "ties": "tie", "pies": "pie",
        "status": "status", "basis": "basis", "this": "this",
        "gas": "ga", "is": "is", "as": "as", "dogs": "dog",
        "errors": "error", "ss": "ss", "abs": "ab",
    }
    for w, exp in cases.items():
        assert py_s_stem(w) == exp, w


@pytest.fixture(scope="module")
def texts_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, text string")


@pytest.mark.parametrize("stop,syn,stem", [
    (None, None, True),
    (ENGLISH_STOPWORDS, None, False),
    (ENGLISH_STOPWORDS, SYN, True),
    (["the"], SYN, False),
])
def test_spark_matches_python(texts_df, stop, syn, stem):
    got = {
        r["id"]: list(r["a"])
        for r in texts_df.select(
            "id", analyzed_tokens("text", stop, syn, stem).alias("a")
        ).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == py_analyzed_tokens(t, stop, syn, stem), (i, t)


def test_duckdb_twins_match_python():
    con = duckdb.connect()
    arr = duckdb_tokens_sql("t")
    arr = duckdb_stop_sql(arr, ENGLISH_STOPWORDS)
    arr = duckdb_synonym_sql(arr, SYN)
    arr = f"list_transform({arr}, x -> ({duckdb_s_stem_sql('x')}))"
    for t in TEXTS:
        got = con.execute(
            f"SELECT {arr} FROM (SELECT ? AS t)", [t]).fetchone()[0]
        assert list(got) == py_analyzed_tokens(
            t, ENGLISH_STOPWORDS, SYN, True), t


def test_bm25_over_analyzed_field(spark, texts_df):
    # analyzed field -> standard build; oracle over python-analyzed
    # docs must be rank-identical (stopwords gone, synonyms folded)
    adf = texts_df.select(
        "id",
        analyzed_text("text", ENGLISH_STOPWORDS, SYN, True).alias("text"),
    )
    ix = build_index(spark, adf, id_col="id", salt_threshold=10)
    o = OracleIndex.build({
        i: " ".join(py_analyzed_tokens(t, ENGLISH_STOPWORDS, SYN, True))
        for i, t in enumerate(TEXTS)
    })
    for q in ("error database", "canines fast", "glass", "the"):
        got = bm25_topk(ix, q, k=5).collect()
        exp = o.search(q, 5)
        assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
            (d, round(s, 9)) for d, s in exp], q
    # stopword query matches nothing in the analyzed field
    assert bm25_topk(ix, "the and of", k=5).count() == 0