"""index.sort analog: range-bucketed sorted docs layout with
manifest-driven early termination — results must equal a full
orderBy/limit, and the read path must provably touch only the
boundary buckets."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.index.sortedindex import (
    SortedDocs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=rng.randrange(0, 500_000)),
         rng.choice(["en", "de", "fr"]), float(rng.randrange(1000)))
        for i in range(5000)
    ]
    # sprinkle nulls in the sort field
    rows += [(5000 + i, None, "en", 1.0) for i in range(7)]
    return spark.createDataFrame(
        rows, "doc_id long, ts timestamp, lang string, v double")


@pytest.fixture(scope="module")
def sdocs(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sorted"))
    SortedDocs.save(spark, docs, path, "ts", buckets=16)
    return SortedDocs.load(spark, path)


def _ids(df):
    return [r["doc_id"] for r in df.collect()]


@pytest.mark.parametrize("desc", [False, True])
def test_topk_matches_full_sort_and_prunes(spark, docs, sdocs, desc):
    got = sdocs.topk(50, desc=desc).select("doc_id", "ts").collect()
    c = F.col("ts")
    want = (docs.filter(c.isNotNull())
            .orderBy(c.desc() if desc else c.asc())
            .limit(50).select("doc_id", "ts").collect())
    # sort keys identical rank-by-rank (doc ties within equal ts are
    # order-free; minute-resolution timestamps can collide)
    assert [r["ts"] for r in got] == [r["ts"] for r in want]
    assert [r["doc_id"] for r in got]  # non-vacuous
    # early termination: the read touched a strict subset of buckets
    assert sdocs.last_read_buckets is not None
    assert 0 < len(sdocs.last_read_buckets) < len(sdocs.buckets)


def test_topk_with_predicate_widens_until_k(spark, docs, sdocs):
    pred = F.col("lang") == "de"
    got = sdocs.topk(30, desc=True, predicate=pred) \
        .select("doc_id", "ts", "lang").collect()
    want = (docs.filter(pred & F.col("ts").isNotNull())
            .orderBy(F.col("ts").desc()).limit(30)
            .select("doc_id", "ts", "lang").collect())
    assert [r["ts"] for r in got] == [r["ts"] for r in want]
    assert all(r["lang"] == "de" for r in got)


def test_nulls_fill_tail_only_when_needed(spark, docs, sdocs):
    total = docs.count()
    got = sdocs.topk(total, desc=False).collect()
    assert len(got) == total
    # nulls come last
    tail = [r["ts"] for r in got[-7:]]
    assert all(t is None for t in tail)
    assert all(r["ts"] is not None for r in got[:-7])
    # a k within the non-null range never reads the null bucket
    sdocs.topk(10).collect()
    assert "__null" not in sdocs.last_read_buckets


def test_selective_predicate_exhausts_layout(spark, docs, sdocs):
    pred = F.col("v") < 0  # matches nothing
    assert sdocs.topk(5, predicate=pred).count() == 0


def test_unknown_sort_field_raises(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="sort field"):
        SortedDocs.save(spark, docs, str(tmp_path / "x"), "nope")


def test_search_body_routes_sorted_layout(spark, docs, sdocs):
    """A match_all + single-field sort body answers from the sorted
    layout (subset read), identical sort keys to the document path;
    ineligible bodies fall back transparently."""
    from siem_on_amazon_opensearch_service_spark.index import build_index
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_body,
    )

    ix = build_index(
        spark,
        docs.filter(F.col("ts").isNotNull())
            .withColumn("text", F.concat(F.lit("w"), "doc_id")),
        id_col="doc_id", salt_threshold=60,
        keep_cols=["ts", "lang", "v"],
    )
    body = {"query": {"match_all": {}}, "size": 20,
            "sort": [{"ts": {"order": "desc"}}]}
    routed = search_body(ix, body, sorted_docs=sdocs)["hits"].collect()
    plain = search_body(ix, body)["hits"].collect()
    assert [r["ts"] for r in routed] == [r["ts"] for r in plain]
    assert 0 < len(sdocs.last_read_buckets) < len(sdocs.buckets)

    # a scoring query is NOT routed (falls back to the doc path)
    sdocs.last_read_buckets = None
    qbody = {"query": {"match": {"text": "w1 w2"}}, "size": 5,
             "sort": [{"ts": {"order": "desc"}}]}
    search_body(ix, qbody, sorted_docs=sdocs)["hits"].collect()
    assert sdocs.last_read_buckets is None


def test_topk_range_matches_filtered_sort(spark, docs, sdocs):
    """time-range + newest-first: topk_range equals the full
    filter+sort and reads only split-point-overlapping buckets."""
    import datetime as dt

    lo = dt.datetime(2024, 3, 1).replace(
        tzinfo=dt.timezone.utc).timestamp()
    hi = dt.datetime(2024, 5, 1).replace(
        tzinfo=dt.timezone.utc).timestamp()
    got = sdocs.topk_range(40, lo=lo, hi=hi, desc=True) \
        .select("doc_id", "ts").collect()
    v = F.col("ts").cast("double")
    want = (docs.filter((v >= lo) & (v <= hi))
            .orderBy(F.col("ts").desc()).limit(40)
            .select("doc_id", "ts").collect())
    assert [r["ts"] for r in got] == [r["ts"] for r in want]
    assert want, "empty range -- vacuous"
    assert 0 < len(sdocs.last_read_buckets) < len(sdocs.buckets)


def test_search_body_routes_range_on_sort_field(spark, docs, sdocs):
    from siem_on_amazon_opensearch_service_spark.index import build_index
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_body,
    )

    ix = build_index(
        spark,
        docs.filter(F.col("ts").isNotNull())
            .withColumn("text", F.concat(F.lit("w"), "doc_id")),
        id_col="doc_id", salt_threshold=60,
        keep_cols=["ts", "lang", "v"],
    )
    body = {"query": {"range": {"ts": {
                "gte": "2024-02-01", "lte": "2024-06-01"}}},
            "size": 15, "sort": [{"ts": {"order": "desc"}}]}
    routed = search_body(ix, body, sorted_docs=sdocs)["hits"].collect()
    assert 0 < len(sdocs.last_read_buckets) < len(sdocs.buckets)
    plain = search_body(ix, body)["hits"].collect()
    assert [r["ts"] for r in routed] == [r["ts"] for r in plain]
    assert routed, "no rows in range -- vacuous"


def test_cli_sort_build_and_topk(spark, docs, tmp_path, capsys):
    """the spark-submit entry: sort-build emits the manifest summary,
    sort-topk prints rank-ordered JSON rows (range + plain)."""
    import json

    from siem_on_amazon_opensearch_service_spark.cli import main

    src = str(tmp_path / "src")
    docs.write.parquet(src)
    out = str(tmp_path / "layout")
    main(["sort-build", "--input", src, "--out", out,
          "--sort-field", "ts", "--buckets", "8"])
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["status"] == "ok" and built["buckets"] > 1
    assert built["null_count"] == 7

    main(["sort-topk", "--layout", out, "--k", "5", "--desc"])
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 5
    ts = [x["ts"] for x in lines]
    assert ts == sorted(ts, reverse=True)

    main(["sort-topk", "--layout", out, "--k", "3",
          "--gte", "2024-02-01", "--lte", "2024-03-01"])
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(lines) <= 3
    for x in lines:
        assert "2024-02-01" <= x["ts"] <= "2024-03-01 00:00:00"
