"""Sequence packing, deterministic sampling, shard export."""

from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import packing


def test_pack_sequences_semantics(spark):
    rows = [(i, "s", 100) for i in range(10)] + [(100, "s", 1000)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, tokens long")
    out = {
        r["doc_id"]: (r["pack_id"], r["oversize"])
        for r in packing.pack_sequences(df, "tokens", budget=300,
                                        shard_col="shard").collect()
    }
    # cum_before: 0,100,200,...,900 -> packs 0,0,0,1,1,1,2,2,2,3
    assert [out[i][0] for i in range(10)] == [0, 0, 0, 1, 1, 1, 2, 2, 2, 3]
    assert out[100] == (3, True)               # oversize flagged, kept
    # per-pack totals near budget (approximate-greedy bound: <= budget
    # + largest member)
    sums = {}
    for i in range(10):
        sums[out[i][0]] = sums.get(out[i][0], 0) + 100
    assert all(v <= 300 for v in sums.values())


def test_hash_sample_deterministic_and_calibrated(spark):
    df = spark.createDataFrame([(i,) for i in range(20_000)], "k long")
    kept1 = df.filter(packing.hash_sample_pred("k", 0.3)).count()
    kept2 = df.filter(packing.hash_sample_pred("k", 0.3)).count()
    assert kept1 == kept2                      # run-to-run identical
    assert abs(kept1 / 20_000 - 0.3) < 0.02    # calibrated
    # different seed -> different (but still calibrated) subset
    kept_seeded = df.filter(packing.hash_sample_pred("k", 0.3, seed="x")).count()
    assert abs(kept_seeded / 20_000 - 0.3) < 0.02
    # monotone: fraction 0 / 1 edges
    assert df.filter(packing.hash_sample_pred("k", 0.0)).count() == 0
    assert df.filter(packing.hash_sample_pred("k", 1.0)).count() == 20_000


def test_stratified_sample(spark):
    rows = [(i, "en" if i % 2 else "de") for i in range(10_000)]
    df = spark.createDataFrame(rows, "k long, lang string")
    out = packing.stratified_sample(df, "lang", {"en": 0.1}, key_col="k",
                                    default=0.9)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["en"] / 5000 - 0.1) < 0.03
    assert abs(counts["de"] / 5000 - 0.9) < 0.03


def test_write_training_shards(spark, tmp_path):
    df = spark.createDataFrame([(i, f"text{i}") for i in range(2000)],
                               "doc_id long, text string")
    path = str(tmp_path / "shards")
    packing.write_training_shards(df, path, "doc_id", n_shards=8)
    back = spark.read.parquet(path)
    assert back.count() == 2000
    shards = {r["shard"] for r in back.select("shard").distinct().collect()}
    assert shards == set(range(8))
    # assignment is content-deterministic: re-deriving it matches
    rederived = df.withColumn("shard", packing.shard_id("doc_id", 8))
    joined = back.select("doc_id", "shard").join(
        rederived.select("doc_id", F.col("shard").alias("shard2")), "doc_id"
    )
    assert joined.filter("shard <> shard2").count() == 0
    # shards reasonably balanced (md5 uniformity)
    sizes = [r["n"] for r in back.groupBy("shard").agg(
        F.count("*").alias("n")).collect()]
    assert max(sizes) < 2 * min(sizes)
