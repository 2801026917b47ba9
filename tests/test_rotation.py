"""Dated-index rotation + range-limited alias query: BM25 over a
selected period range must equal the oracle over exactly those
periods' documents (per-selection stats, like OpenSearch dated-alias
fan-out)."""

import math

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import bm25_topk
from siem_on_amazon_opensearch_service_spark.index.rotation import (
    build_rotated,
    load_rotated,
)
from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex

QUERY = "w00000 w00042 w00007"
K = 10


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    pages = corpus.pages_df(spark, 600, seed=31, partitions=4)
    # the generator's warc_ts spans hours; spread docs across 4 months
    # deterministically (url-hashed) so rotation has real periods.
    pages = pages.withColumn(
        "warc_ts",
        F.to_timestamp(
            F.add_months("warc_ts", F.pmod(F.xxhash64("url"), F.lit(4)))
        ),
    )
    pages.persist().count()
    path = str(tmp_path_factory.mktemp("ix_rot"))
    periods = build_rotated(spark, pages, path, period="month",
                            salt_threshold=50)
    return pages, path, periods


def _oracle_rows(pages, months):
    rows = (
        pages.withColumn("_m", F.date_format("warc_ts", "yyyy-MM"))
        .filter(F.col("_m").isin(months))
        .select("url", "text")
        .collect()
    )
    return {r["url"]: r["text"] for r in rows}


def _check_against_oracle(spark, ix, docs_by_url):
    rank = {u: i for i, u in enumerate(sorted(docs_by_url))}
    # rotated ids differ from url rank: compare BY URL via the docs
    # side-table, scores to 1e-9.
    oracle = OracleIndex.build({rank[u]: t for u, t in docs_by_url.items()})
    inv = {v: k for k, v in rank.items()}
    exp = [(inv[d], s) for d, s in oracle.search(QUERY, K)]
    got = (
        bm25_topk(ix, QUERY, k=K)
        .join(ix.docs.select("doc_id", "url"), "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    )
    assert len(got) == len(exp)
    for r, (u, s) in zip(got, exp):
        assert math.isclose(r["score"], s, rel_tol=1e-9, abs_tol=1e-9)
    # url sets must agree rank-for-rank up to equal-score ties
    # (rotated doc ids break ties differently than url rank); verify
    # score-sorted url multisets instead of exact tie order.
    def keyed(items):
        return sorted((round(s, 9), u) for u, s in items)

    assert keyed([(r["url"], r["score"]) for r in got]) == keyed(exp)


def test_multiple_periods_created(setup):
    _, _, periods = setup
    assert len(periods) >= 2
    assert all(len(p) == 7 for p in periods)  # yyyy-MM


def test_full_range_equals_full_oracle(spark, setup):
    pages, path, periods = setup
    ix = load_rotated(spark, path)
    assert ix.n_docs == 600
    _check_against_oracle(spark, ix, _oracle_rows(pages, periods))


def test_subrange_prunes_and_rescopes_stats(spark, setup):
    pages, path, periods = setup
    sub = periods[: max(1, len(periods) // 2)]
    ix = load_rotated(spark, path, start=sub[0], end=sub[-1])
    docs_by_url = _oracle_rows(pages, sub)
    assert ix.n_docs == len(docs_by_url) < 600
    _check_against_oracle(spark, ix, docs_by_url)


def test_empty_range_raises(spark, setup):
    _, path, _ = setup
    with pytest.raises(ValueError):
        load_rotated(spark, path, start="1970-01", end="1970-02")


def test_bounds_more_precise_than_granularity_keep_boundary(spark, setup):
    """start='<first month>-15' over month labels must still open the
    first month (the period CONTAINING the bound), and a bare-year end
    must keep every month of that year."""
    pages, path, periods = setup
    first = periods[0]
    ix = load_rotated(spark, path, start=f"{first}-15", end=f"{periods[-1]}-28")
    # every period intersects [first-15, last-28]: the day precision
    # must not drop the boundary months.
    assert ix.n_docs == 600

    year = periods[-1][:4]
    in_year = [p for p in periods if p.startswith(year)]
    ix2 = load_rotated(spark, path, start=year, end=year)
    assert ix2.n_docs == len(_oracle_rows(pages, in_year))
