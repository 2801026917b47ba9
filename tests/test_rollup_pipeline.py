"""Index-rollup job (build + query rewriting) and the long tail of
pipeline aggs (serial_diff / moving_fn / bucket_* / stats_bucket /
matrix_stats)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators.aggs import (
    bucket_script, bucket_selector, bucket_sort, matrix_stats, moving_fn,
    serial_diff, stats_bucket)
from siem_on_amazon_opensearch_service_spark.operators.rollup import (
    RollupSpec, rollup_answer, rollup_build, rollup_supports)


@pytest.fixture(scope="module")
def raw(spark):
    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(200):
        rows.append((base + dt.timedelta(minutes=17 * i),
                     "a" if i % 3 else "b",
                     float(i % 50) if i % 7 else None))
    return spark.createDataFrame(rows, "ts timestamp, site string, v double")


SPEC = RollupSpec("ts", 3600, ("site",), ("v",))


def test_rollup_supports_metadata_only():
    assert rollup_supports(SPEC, 86400, ["site"], [("v", "avg")])
    assert rollup_supports(SPEC, 7200, [], [("", "count")])
    # finer than stored / non-multiple interval
    assert not rollup_supports(SPEC, 1800, [], [("", "count")])
    assert not rollup_supports(SPEC, 5400, [], [("", "count")])
    # dim not stored
    assert not rollup_supports(SPEC, 86400, ["other"], [("", "count")])
    # metric column not stored
    assert not rollup_supports(SPEC, 86400, [], [("w", "sum")])


def test_rollup_answer_matches_direct(spark, raw):
    rolled = rollup_build(raw, SPEC)
    got = rollup_answer(
        rolled, SPEC, 86400, ["site"],
        [("", "count"), ("v", "sum"), ("v", "avg"), ("v", "min"),
         ("v", "max")],
    )
    direct = raw.groupBy(
        (F.floor(F.col("ts").cast("long") / 86400) * 86400)
        .alias("bucket_ts"), "site",
    ).agg(
        F.count("*").alias("_count"), F.sum("v").alias("v_sum"),
        F.avg("v").alias("v_avg"), F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
    )
    key = lambda r: (r.bucket_ts, r.site)  # noqa: E731
    g = {key(r): r for r in got.collect()}
    d = {key(r): r for r in direct.collect()}
    assert g.keys() == d.keys() and len(g) > 2
    for k in g:
        assert g[k]._count == d[k]._count
        # avg recombined from sum + value_count must be null-aware
        assert g[k].v_avg == pytest.approx(d[k].v_avg, rel=1e-12)
        assert g[k].v_min == d[k].v_min and g[k].v_max == d[k].v_max


def test_rollup_answer_rejects_unanswerable(spark, raw):
    rolled = rollup_build(raw, SPEC)
    with pytest.raises(ValueError):
        rollup_answer(rolled, SPEC, 1800, [], [("", "count")])


@pytest.fixture(scope="module")
def buckets(spark):
    return spark.createDataFrame(
        [(f"b{i:02d}", float(x)) for i, x in
         enumerate([5, 3, 8, 8, 1, 9, 2, 7])],
        "h string, n double",
    )


def test_pipeline_agg_tail(buckets):
    sd = {r.h: r.serial_diff
          for r in serial_diff(buckets, "h", "n", lag=2).collect()}
    assert sd["b00"] is None and sd["b01"] is None
    assert sd["b02"] == 3.0 and sd["b07"] == -2.0
    mf = {r.h: r.moving_fn
          for r in moving_fn(buckets, "h", "n", "max", 3).collect()}
    assert mf["b00"] == 5.0 and mf["b02"] == 8.0 and mf["b05"] == 9.0
    kept = {r.h for r in bucket_selector(
        buckets, F.col("n") >= 7).collect()}
    assert kept == {"b02", "b03", "b05", "b07"}
    top = [r.h for r in bucket_sort(
        buckets, [F.desc("n"), F.asc("h")], 3).collect()]
    assert top == ["b05", "b02", "b03"]
    scripted = {r.h: r.double
                for r in bucket_script(
                    buckets, "double", F.col("n") * 2).collect()}
    assert scripted["b04"] == 2.0
    st = stats_bucket(buckets, "n").collect()[0]
    assert (st["count"], st.min_bucket, st.max_bucket,
            st.sum_bucket) == (8, 1.0, 9.0, 43.0)


def test_matrix_stats_exact(spark):
    import statistics
    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 4.0, 5.0, 4.0, 5.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    out = {(r.field_a, r.field_b): r for r in
           matrix_stats(df, ["x", "y"]).collect()}
    assert out[("x", "x")].mean_a == pytest.approx(3.0)
    assert out[("x", "x")].var_a == pytest.approx(statistics.variance(xs))
    r = out[("x", "y")]
    assert r.cov == pytest.approx(statistics.covariance(xs, ys))
    assert r.corr == pytest.approx(statistics.correlation(xs, ys))


def test_rollup_sync_incremental_equals_batch(spark, raw, tmp_path):
    """Continuous mode: two syncs over a growing source must equal one
    batch build over everything; an empty delta is a no-op."""
    from siem_on_amazon_opensearch_service_spark.operators.rollup import (
        rollup_read, rollup_sync)

    path = str(tmp_path / "roll")
    cutoff = "2024-03-01 20:00:00"
    first = raw.filter(F.col("ts") <= F.lit(cutoff).cast("timestamp"))
    r1 = rollup_sync(first, SPEC, path)
    assert r1["new_rows"] == first.count()
    r2 = rollup_sync(raw, SPEC, path)
    assert r2["new_rows"] == raw.count() - first.count()
    # third pass: nothing new
    r3 = rollup_sync(raw, SPEC, path)
    assert r3["new_rows"] == 0 and r3["watermark"] == r2["watermark"]

    def canon(df):
        return sorted(
            (r["rollup_ts"], r["site"], r["rollup_count"],
             r["v__sum"], r["v__min"], r["v__max"], r["v__value_count"])
            for r in df.collect())

    assert canon(rollup_read(spark, path)) == canon(rollup_build(raw, SPEC))
    # and the merged rollup still answers coarse queries correctly
    got = rollup_answer(rollup_read(spark, path), SPEC, 86400, ["site"],
                        [("v", "avg"), ("", "count")]).collect()
    want = {(r["bucket_ts"], r["site"]): (r["v_avg"], r["_count"])
            for r in rollup_answer(rollup_build(raw, SPEC), SPEC, 86400,
                                   ["site"],
                                   [("v", "avg"), ("", "count")]).collect()}
    for r in got:
        wa, wc = want[(r["bucket_ts"], r["site"])]
        assert r["_count"] == wc
        assert abs(r["v_avg"] - wa) < 1e-9


def test_matrix_stats_exact_drops_rows_missing_any_field(spark):
    """matrix_stats_exact implements the OpenSearch matrix_stats
    document-drop rule: a row missing ANY field is excluded entirely
    (one shared n), so per-field NULLs can't deflate another field's
    moments. Baseline: the same frame pre-filtered to complete rows
    through the null-aware legacy matrix_stats."""
    from siem_on_amazon_opensearch_service_spark.operators.aggs import (
        matrix_stats, matrix_stats_exact)

    rows = [(float(i % 7) + 0.25, float(i % 3) if i % 5 else None)
            for i in range(40)]
    df = spark.createDataFrame(rows, "x double, y double")
    complete = df.filter("x IS NOT NULL AND y IS NOT NULL")
    want = {(r["field_a"], r["field_b"]):
            (r["mean_a"], r["var_a"], r["cov"], r["corr"])
            for r in matrix_stats(complete, ["x", "y"]).collect()}
    got = {(r["field_a"], r["field_b"]):
           (r["mean_a"], r["var_a"], r["cov"], r["corr"])
           for r in matrix_stats_exact(df, ["x", "y"]).collect()}
    assert set(got) == set(want)
    for k, g in got.items():
        for a, b in zip(g, want[k]):
            assert abs(a - b) < 1e-9, (k, g, want[k])


def test_welch_exact_branch_is_null_aware_like_default(spark):
    from siem_on_amazon_opensearch_service_spark.operators.aggs import (
        welch_t_test)

    rows = [("a", float(i % 11) + 0.5 if i % 4 else None)
            for i in range(40)] + \
           [("b", float(i % 7) + 2.25 if i % 6 else None)
            for i in range(40)]
    df = spark.createDataFrame(rows, "g string, v double")
    base = welch_t_test(df, F.col("v"), F.col("g") == "a",
                        F.col("g") == "b").collect()[0]
    ex = welch_t_test(df, F.col("v"), F.col("g") == "a",
                      F.col("g") == "b", exact_decimals=6).collect()[0]
    assert ex["doc_count"] == base["doc_count"]
    assert abs(ex["t_stat"] - base["t_stat"]) < 1e-9


def test_rollup_sync_recovers_from_swap_crash(spark, tmp_path):
    """Round-5 durability pin: a crash between rmtree(data) and
    rename(tmp, data) leaves the only rollup copy under the tmp dir
    with a STALE watermark; the next sync must adopt the tmp instead
    of rebuilding from the delta alone (which silently dropped the
    history)."""
    import os
    import shutil

    from siem_on_amazon_opensearch_service_spark.operators.rollup import (
        RollupSpec, rollup_read, rollup_sync)

    spec = RollupSpec("ts", 3600, ("k",), ("v",))
    rows1 = [(f"2024-01-01 0{h}:10:00", "a", float(h)) for h in range(5)]
    src1 = spark.createDataFrame(rows1, "ts string, k string, v double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    path = str(tmp_path / "ru")
    r1 = rollup_sync(src1, spec, path)
    assert r1["new_rows"] == 5
    # simulate the crash window: data/ renamed away to tmp, manifest
    # still carries the pre-crash watermark
    os.replace(os.path.join(path, "data"),
               os.path.join(path, "_data.sync.tmp"))
    rows2 = [("2024-01-01 06:10:00", "a", 60.0)]
    src2 = spark.createDataFrame(rows1 + rows2,
                                 "ts string, k string, v double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    r2 = rollup_sync(src2, spec, path)
    assert r2["new_rows"] == 1  # only the post-watermark row
    got = {(r["rollup_ts"], r["k"]): r["rollup_count"]
           for r in rollup_read(spark, path).collect()}
    assert len(got) == 6 and all(n == 1 for n in got.values())
    # torn-tmp case: stale tmp alongside intact data is discarded
    os.makedirs(os.path.join(path, "_data.sync.tmp"), exist_ok=True)
    r3 = rollup_sync(src2, spec, path)
    assert r3["new_rows"] == 0
    assert not os.path.isdir(os.path.join(path, "_data.sync.tmp"))
    assert rollup_read(spark, path).count() == 6
