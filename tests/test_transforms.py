"""Index Transforms plugin (pivot-shaped rollup sibling): full build
vs a pandas oracle, and the continuous-sync equivalence property —
any sequence of syncs over a growing source equals ONE build over the
final source, INCLUDING non-algebraic metrics (avg), which is exactly
the semantics a rollup merge cannot offer."""

import datetime as dt

import pandas as pd
import pytest

from siem_on_amazon_opensearch_service_spark.operators.transform import (
    TransformSpec, transform_build, transform_read, transform_sync,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)
SCHEMA = "cat string, v double, ts timestamp"


def mk_rows(n, start=0):
    rows = []
    for i in range(start, start + n):
        rows.append((
            "abc"[i % 3],
            float((i * 7) % 23) + 0.5,
            T0 + dt.timedelta(minutes=17 * i),
        ))
    return rows


def py_transform(rows, interval=3600):
    """pandas twin of transform_build for the spec used below."""
    pdf = pd.DataFrame(rows, columns=["cat", "v", "ts"])
    pdf["ts_bucket"] = (
        pdf["ts"].astype("int64") // 10**9 // interval * interval
    )
    g = pdf.groupby(["cat", "ts_bucket"])
    out = g.agg(
        transform_count=("v", "size"),
        v__sum=("v", "sum"),
        v__avg=("v", "mean"),
        v__value_count=("v", "count"),
    ).reset_index()
    return {
        (r.cat, int(r.ts_bucket)): (
            int(r.transform_count), round(r.v__sum, 9),
            round(r.v__avg, 9), int(r.v__value_count))
        for r in out.itertuples()
    }


SPEC = TransformSpec(
    groups=(("cat", "terms", None), ("ts", "date_histogram", 3600)),
    aggs=(("v", "sum"), ("v", "avg"), ("v", "value_count")),
    ts_col="ts",
)


def collect_built(df):
    return {
        (r["cat"], int(r["ts_bucket"])): (
            int(r["transform_count"]), round(r["v__sum"], 9),
            round(r["v__avg"], 9), int(r["v__value_count"]))
        for r in df.collect()
    }


def test_transform_build_vs_pandas(spark):
    rows = mk_rows(120)
    sdf = spark.createDataFrame(rows, SCHEMA)
    got = collect_built(transform_build(sdf, SPEC))
    assert got == py_transform(rows)
    assert len(got) > 5  # non-vacuous pivot spread


def test_transform_build_histogram_pivot(spark):
    rows = mk_rows(80)
    sdf = spark.createDataFrame(rows, SCHEMA)
    spec = TransformSpec(groups=(("v", "histogram", 5.0),),
                         aggs=(("v", "min"), ("v", "max")))
    got = {
        (r["v_hist"],): (int(r["transform_count"]),
                         r["v__min"], r["v__max"])
        for r in transform_build(sdf, spec).collect()
    }
    pdf = pd.DataFrame(rows, columns=["cat", "v", "ts"])
    pdf["v_hist"] = (pdf["v"] // 5.0) * 5.0
    g = pdf.groupby("v_hist")["v"]
    exp = {
        (k,): (int(g.size()[k]), g.min()[k], g.max()[k])
        for k in g.size().index
    }
    assert got == exp


def test_transform_sync_sequence_equals_full_build(
        spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("transform_sync"))
    # three growing prefixes; batch 3 revisits EARLY pivot buckets
    # (same cat + same hour as batch-1 rows is impossible with a
    # date_histogram pivot on ts, so pivot cat-only here to prove the
    # avg-recompute-on-old-bucket path).
    spec = TransformSpec(groups=(("cat", "terms", None),),
                         aggs=(("v", "sum"), ("v", "avg")),
                         ts_col="ts")
    all_rows = mk_rows(90)
    for cut in (30, 60, 90):
        src = spark.createDataFrame(all_rows[:cut], SCHEMA)
        res = transform_sync(src, spec, path)
        assert res["changed_buckets"] > 0
    got = {
        r["cat"]: (int(r["transform_count"]),
                   round(r["v__sum"], 9), round(r["v__avg"], 9))
        for r in transform_read(spark, path).collect()
    }
    full = spark.createDataFrame(all_rows, SCHEMA)
    exp = {
        r["cat"]: (int(r["transform_count"]),
                   round(r["v__sum"], 9), round(r["v__avg"], 9))
        for r in transform_build(full, spec).collect()
    }
    assert got == exp
    # avg really is non-algebraic evidence: per-batch avgs differ
    pdf = pd.DataFrame(all_rows, columns=["cat", "v", "ts"])
    assert got["a"][2] == round(pdf[pdf.cat == "a"]["v"].mean(), 9)


def test_transform_sync_noop_and_untouched_buckets(
        spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("transform_sync2"))
    rows = mk_rows(40)
    src = spark.createDataFrame(rows, SCHEMA)
    r1 = transform_sync(src, SPEC, path)
    assert r1["changed_buckets"] > 0
    # idempotent: same source again -> zero new rows, checkpoint kept
    r2 = transform_sync(src, SPEC, path)
    assert r2 == {"changed_buckets": 0, "checkpoint": r1["checkpoint"]}
    assert collect_built(transform_read(spark, path)) == \
        py_transform(rows)
    # append rows touching ONLY later buckets: early buckets' stored
    # rows survive the anti-join splice untouched
    rows2 = rows + mk_rows(20, start=40)
    r3 = transform_sync(spark.createDataFrame(rows2, SCHEMA), SPEC,
                        path)
    assert 0 < r3["changed_buckets"] < len(py_transform(rows2))
    assert collect_built(transform_read(spark, path)) == \
        py_transform(rows2)


def test_transform_requires_ts_for_sync(spark, tmp_path_factory):
    spec = TransformSpec(groups=(("cat", "terms", None),))
    src = spark.createDataFrame(mk_rows(5), SCHEMA)
    with pytest.raises(ValueError, match="ts_col"):
        transform_sync(src, spec,
                       str(tmp_path_factory.mktemp("transform_bad")))


def test_transform_unknown_kinds_rejected():
    with pytest.raises(ValueError, match="group kind"):
        TransformSpec(groups=(("cat", "bogus", None),)).group_cols()
    with pytest.raises(ValueError, match="agg kind"):
        TransformSpec(groups=(("cat", "terms", None),),
                      aggs=(("v", "median"),)).agg_cols()


def test_transform_sync_recovers_from_swap_crash(
        spark, tmp_path_factory):
    """Round-5 durability pin (same window as rollup/startree sync):
    data/ renamed away mid-swap with a stale checkpoint — the retry
    must adopt the stranded tmp so UNCHANGED buckets survive."""
    import os

    path = str(tmp_path_factory.mktemp("transform_crash"))
    spec = TransformSpec(groups=(("cat", "terms", None),),
                         aggs=(("v", "sum"),), ts_col="ts")
    rows = mk_rows(60)
    transform_sync(spark.createDataFrame(rows, SCHEMA), spec, path)
    # crash window simulation
    os.replace(os.path.join(path, "data"),
               os.path.join(path, "_data.sync.tmp"))
    # the delta touches ONLY cat 'a' buckets (row index 60 -> 'a')
    rows2 = rows + [("a", 1.5, T0 + dt.timedelta(days=30))]
    res = transform_sync(spark.createDataFrame(rows2, SCHEMA), spec, path)
    assert res["changed_buckets"] == 1
    got = {r["cat"]: round(r["v__sum"], 9)
           for r in transform_read(spark, path).collect()}
    exp = {r["cat"]: round(r["v__sum"], 9)
           for r in transform_build(
               spark.createDataFrame(rows2, SCHEMA), spec).collect()}
    assert got == exp  # 'b'/'c' buckets survived the crash
