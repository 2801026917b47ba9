"""Round-5 pin: startree_sync adopts a stranded swap tmp."""

import os

from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators.startree import (
    StarTree, startree_build, startree_query, startree_sync,
)


def test_startree_sync_recovers_from_swap_crash(spark, tmp_path):
    rows1 = [(f"2024-01-01 0{h}:10:00", "a", float(h)) for h in range(4)]
    docs1 = spark.createDataFrame(
        rows1, "ts string, k string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    path = str(tmp_path / "st")
    st = startree_build(
        docs1,
        ["k", {"date_histogram": {"field": "ts",
                                  "calendar_interval": "hour"}}],
        {"v": ["sum", "value_count"]})
    st.save(path, watermark="2024-01-01 03:10:00")

    # crash window: data renamed away, tmp holds the only copy
    os.replace(os.path.join(path, "data"),
               os.path.join(path, "_data.sync.tmp"))

    rows2 = rows1 + [("2024-01-01 05:10:00", "a", 50.0)]
    docs2 = spark.createDataFrame(
        rows2, "ts string, k string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = startree_sync(spark, path, docs2, "ts")
    assert out["delta_docs"] == 1  # only the post-watermark row
    st2 = StarTree.load(spark, path)
    got = startree_query(st2, ["k"], [("v", "sum")]).collect()
    assert len(got) == 1 and got[0]["doc_count"] == 5
    assert got[0]["v_sum"] == sum(v for *_, v in rows2)
