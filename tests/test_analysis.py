import duckdb
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.analysis import (
    duckdb_tokens_sql,
    tokenize_py,
    tokens_col,
    tokens_sql,
)

CASES = [
    "Hello, World 123",
    "the FAST fox--jumps_over 42 fences!!",
    "",
    "...",
    "a",
    "ALL CAPS AND 0trailing ",
    "tab\tsep\nnewline",
]


def test_tokenize_py():
    assert tokenize_py("Hello, World 123") == ["hello", "world", "123"]
    assert tokenize_py("") == []
    assert tokenize_py("...") == []


def test_three_engines_agree(spark):
    """The same analyzer definition must produce identical tokens in
    Python, Spark native expressions, and DuckDB SQL (the correctness
    oracle depends on this)."""
    sdf = spark.createDataFrame([(c,) for c in CASES], "s string")
    spark_toks = [
        r["t"] for r in sdf.select(tokens_col("s").alias("t")).collect()
    ]
    spark_sql_toks = [
        r["t"] for r in sdf.selectExpr(f"{tokens_sql('s')} as t").collect()
    ]
    con = duckdb.connect()
    duck_toks = [
        con.execute(f"SELECT {duckdb_tokens_sql('?')}", [c]).fetchone()[0]
        for c in CASES
    ]
    py_toks = [tokenize_py(c) for c in CASES]
    assert spark_toks == py_toks
    assert spark_sql_toks == py_toks
    assert duck_toks == py_toks


UNICODE_CASES = [
    "Café au lait, s'il vous plaît",
    "Größe straße ÜBER",
    "Привет МИР 42",
    "ひらがな カタカナ 漢字テスト",
    "mixed ASCII und Ümlaute 7x",
]


def test_unicode_analyzer_spark_duckdb_agree(spark):
    """The Unicode analyzer variant (\\p{L}\\p{N} word break) must
    produce identical tokens in Spark (Java regex) and DuckDB (RE2) —
    the two engines the oracle gate would compare if a corpus opted
    into Unicode analysis."""
    from siem_on_amazon_opensearch_service_spark.analysis import (
        duckdb_tokens_unicode_sql, tokens_col_unicode,
    )

    sdf = spark.createDataFrame([(c,) for c in UNICODE_CASES], "s string")
    spark_toks = [
        r["t"] for r in sdf.select(tokens_col_unicode("s").alias("t")).collect()
    ]
    con = duckdb.connect()
    duck_toks = [
        con.execute(
            f"SELECT {duckdb_tokens_unicode_sql('?')}", [c]
        ).fetchone()[0]
        for c in UNICODE_CASES
    ]
    assert spark_toks == duck_toks
    # sanity: scripts are preserved, case folded
    assert "café" in spark_toks[0]
    assert "мир" in spark_toks[2]
