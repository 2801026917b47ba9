"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -- flagship query (index-backed BM25 top-k) on sf0.001.
queries()     -- name -> (spark, sf_dir) -> DataFrame, one per
                 implemented operator from SURVEY.md section 2.
oracle_sql()  -- matching DuckDB ANSI-SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from siem_on_amazon_opensearch_service_spark import entry_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k through the salted block-compressed
    postings index, on the sf0.001 documents table."""
    return entry_queries.ft_bm25_topk_index(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.registry()


def oracle_sql() -> dict[str, str]:
    return entry_queries.oracles()
