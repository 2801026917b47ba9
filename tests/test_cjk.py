"""CJK bigram analyzer: cross-engine token identity (Spark / Python /
DuckDB) and rank-identical BM25 over a Japanese corpus through the
tokenizer seam."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.analysis_ext import (
    cjk_tokens_col, duckdb_cjk_sql, py_cjk_tokens,
)
from siem_on_amazon_opensearch_service_spark.index import (
    bm25_topk, build_index,
)
from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex

DOCS = [
    "東京都の天気は晴れです",
    "大阪の天気は雨です 東京は晴れ",
    "spark で 分散処理 を実行する",
    "カタカナとひらがなの混在テキスト",
    "ログ解析 system with spark and 検索エンジン",
    "天",  # lone CJK char -> unigram
    "abc123 only latin here",
]


def test_python_twin_shapes():
    assert py_cjk_tokens("東京都") == ["東京", "京都"]
    assert py_cjk_tokens("天") == ["天"]
    assert py_cjk_tokens("Spark処理") == ["spark", "処理"]
    assert py_cjk_tokens("カタカナとひらがな") == [
        "カタ", "タカ", "カナ", "ナと", "とひ", "ひら", "らが", "がな"]
    assert py_cjk_tokens("") == []
    assert py_cjk_tokens("abc 123") == ["abc", "123"]


def test_cross_engine_token_identity(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(DOCS)],
                               "doc_id long, text string")
    got = {r["doc_id"]: list(r["toks"]) for r in df.select(
        "doc_id", cjk_tokens_col("text").alias("toks")).collect()}
    con = duckdb.connect()
    con.register("t", df.toPandas())
    duck = {r[0]: list(r[1]) for r in con.execute(
        f"SELECT doc_id, {duckdb_cjk_sql('text')} FROM t").fetchall()}
    for i, t in enumerate(DOCS):
        want = py_cjk_tokens(t)
        assert got[i] == want, (i, got[i], want)
        assert duck[i] == want, (i, duck[i], want)


def test_bm25_rank_identical_over_japanese_corpus(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(DOCS)],
                               "doc_id long, text string")
    ix = build_index(spark, df, id_col="doc_id",
                     tokenizer=cjk_tokens_col)
    oracle = OracleIndex.build({i: t for i, t in enumerate(DOCS)},
                               tokenizer=py_cjk_tokens)
    for q in ("東京の天気", "spark 処理", "カタカナ", "天"):
        got = [(r["doc_id"], r["score"])
               for r in bm25_topk(ix, q, k=5,
                                  tokenizer_py=py_cjk_tokens).collect()]
        want = oracle.search(q, k=5, tokenizer=py_cjk_tokens)
        assert [g[0] for g in got] == [w[0] for w in want], (q, got, want)
        for g, w in zip(got, want):
            assert math.isclose(g[1], w[1], rel_tol=1e-9), (q, g, w)


def test_default_tokenizer_unchanged(spark):
    # the seam must not disturb the shared core analyzer's behavior
    df = spark.createDataFrame([(0, "The Quick 東京 Fox")],
                               "doc_id long, text string")
    ix = build_index(spark, df, id_col="doc_id")
    terms = {r["term"] for r in ix.term_stats.select("term").collect()}
    assert terms == {"the", "quick", "fox"}  # CJK dropped, as before
