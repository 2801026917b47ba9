"""Per-domain quotas: host extraction, deterministic caps, stats."""

import pytest

from siem_on_amazon_opensearch_service_spark.operators.scrub import (
    cap_per_domain, domain_stats, url_host,
)

URLS = [
    (0, "https://www.example.com:443/a", 0.9),
    (1, "https://example.com/b", 0.5),
    (2, "http://EXAMPLE.com:80/c", 0.7),
    (3, "https://other.net/x", 0.1),
    (4, "https://sub.example.com/y", 0.2),
    (5, "https://example.com/d", 0.3),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        URLS, "doc_id long, url string, quality double")


def test_url_host_normalization(spark, docs):
    hosts = {r["doc_id"]: r["h"] for r in
             docs.select("doc_id", url_host("url").alias("h")).collect()}
    assert hosts == {0: "example.com", 1: "example.com",
                     2: "example.com", 3: "other.net",
                     4: "sub.example.com", 5: "example.com"}


def test_cap_keeps_first_by_order(docs):
    kept = sorted(r["doc_id"]
                  for r in cap_per_domain(docs, 2).collect())
    # example.com has 4 docs -> first 2 by url asc:
    # http://EXAMPLE.com:80/c < https://example.com/b (bytewise)
    assert kept == [1, 2, 3, 4]
    # quality-ordered: keep the LOWEST order values -> pass a
    # descending key to keep best quality
    from pyspark.sql import functions as F
    best = sorted(r["doc_id"] for r in cap_per_domain(
        docs.withColumn("neg_q", -F.col("quality")),
        1, order_col="neg_q").collect())
    assert best == [0, 3, 4]   # q=0.9 wins example.com


def test_domain_stats_top(docs):
    rows = [(r["host"], r["n_docs"])
            for r in domain_stats(docs, top_n=2).collect()]
    assert rows == [("example.com", 4), ("other.net", 1)]
