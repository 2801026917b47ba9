"""CLI wiring (in-process) and doc-id determinism guarantees."""

import json

from siem_on_amazon_opensearch_service_spark import cli, corpus
from siem_on_amazon_opensearch_service_spark.index.docids import assign_doc_ids


def test_doc_ids_stable_across_partitionings(spark):
    """doc_id == global url rank, independent of how the input is
    partitioned (the determinism the resumability story leans on)."""
    pdf = corpus.make_pages_pdf(400, seed=21)
    expected = {u: i for i, u in enumerate(sorted(pdf["url"]))}
    for nparts in (2, 7):
        sdf = spark.createDataFrame(pdf).repartition(nparts)
        got = {
            r["url"]: r["doc_id"]
            for r in assign_doc_ids(sdf).select("url", "doc_id").collect()
        }
        assert got == expected, nparts


def test_doc_ids_dense_and_unique(spark):
    sdf = spark.createDataFrame(corpus.make_pages_pdf(300, seed=3))
    ids = sorted(
        r["doc_id"] for r in assign_doc_ids(sdf).select("doc_id").collect()
    )
    assert ids == list(range(300))


def test_cli_build_and_query(spark, tmp_path, capsys):
    """Drive the spark-submit entry point in-process: build, query,
    pruned query, resumable build + metrics."""
    pages = spark.createDataFrame(
        corpus.make_pages_pdf(200, seed=8)[["url", "text"]]
    )
    inp = str(tmp_path / "pages")
    pages.write.parquet(inp)

    ixp = str(tmp_path / "ix")
    cli.main(["build", "--input", inp, "--output", ixp,
              "--salt-threshold", "100"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "ok" and out["n_docs"] == 200

    cli.main(["query", "--index", ixp, "--query", "w00000", "--k", "3"])
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(rows) <= 3 and "score" in rows[0]

    cli.main(["query", "--index", ixp, "--query", "w00000", "--k", "3",
              "--pruned"])
    prows = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in prows] == [r["doc_id"] for r in rows]

    ckpt = str(tmp_path / "ckpt")
    cli.main(["build", "--input", inp, "--output", ckpt, "--resumable",
              "--parts", "3", "--salt-threshold", "100"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["partitions"] == 3 and out["n_docs"] == 200

    cli.main(["metrics", "--index-checkpoint", ckpt])
    mrows = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert len(mrows) == 3 and all(m["n_docs"] > 0 for m in mrows)

    # positional build + phrase query through the CLI
    pixp = str(tmp_path / "pix")
    cli.main(["build", "--input", inp, "--output", pixp, "--positional",
              "--salt-threshold", "100"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "positional" and out["n_docs"] == 200
    cli.main(["query", "--index", pixp, "--query", "w00000", "--k", "3",
              "--phrase"])
    prows = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(prows) <= 3 and "score" in prows[0]


def test_cli_delete_compact_rotated(spark, tmp_path, capsys):
    """Round-2 CLI surfaces: tombstone delete + compact, rotated build
    + period-range query."""
    from pyspark.sql import functions as F

    pdf = corpus.make_pages_pdf(150, seed=9)[["url", "warc_ts", "text"]]
    pages = spark.createDataFrame(pdf).withColumn(
        "warc_ts",
        F.to_timestamp(
            F.add_months("warc_ts", F.pmod(F.xxhash64("url"), F.lit(3)))
        ),
    )
    inp = str(tmp_path / "pages")
    pages.write.parquet(inp)

    ixp = str(tmp_path / "ix")
    cli.main(["build", "--input", inp, "--output", ixp,
              "--salt-threshold", "100"])
    capsys.readouterr()

    victim = sorted(pdf["url"])[0]
    cli.main(["delete", "--index", ixp, "--url", victim])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tombstoned"] == 1

    cp = str(tmp_path / "ix_compacted")
    cli.main(["compact", "--index", ixp, "--output", cp,
              "--salt-threshold", "100"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] == 149

    rot = str(tmp_path / "rot")
    cli.main(["build-rotated", "--input", inp, "--output", rot,
              "--period", "month", "--salt-threshold", "100"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    periods = out["periods"]
    assert len(periods) >= 2

    cli.main(["query-rotated", "--index", rot, "--query", "w00000",
              "--start", periods[0], "--end", periods[0], "--k", "3"])
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert rows and "score" in rows[0]


def test_release_doc_ids_unpersists(spark):
    """The pinned range-partition cache must actually release (a
    withColumn wrapper used to drop the handle silently)."""
    from siem_on_amazon_opensearch_service_spark.index.docids import (
        release_doc_ids,
    )

    sdf = spark.createDataFrame(corpus.make_pages_pdf(60, seed=4))
    out = assign_doc_ids(sdf)
    out.count()
    pinned = out._spark_graft_pinned
    assert pinned.is_cached
    release_doc_ids(out)
    assert not pinned.is_cached


def test_cli_chunk_and_startree(spark, tmp_path, capsys):
    pages = corpus.pages_df(spark, 120, seed=5, partitions=2)
    inp = str(tmp_path / "pages")
    pages.write.parquet(inp)

    cli.main(["chunk", "--input", inp, "--output",
              str(tmp_path / "chunks"), "--chunk", "16",
              "--overlap", "4", "--id-col", "url"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "ok" and out["chunks"] > 0

    stp = str(tmp_path / "st")
    cli.main(["startree", "--input", inp, "--output", stp,
              "--dim", "lang", "--dim", "warc_ts:month",
              "--metric", "url:value_count",
              "--watermark-col", "warc_ts"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "build" and out["dims"] == [
        "lang", "warc_ts__month"]

    cli.main(["startree", "--input", inp, "--output", stp, "--sync",
              "--dim", "lang", "--metric", "url:value_count",
              "--watermark-col", "warc_ts"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "sync" and out["delta_docs"] == 0


def test_cli_build_accepts_preassigned_doc_id(spark, tmp_path, capsys):
    """`build` on an input that already carries doc_id (no url column,
    the testdata/documents shape) must reuse it instead of crashing on
    the url-rank assignment."""
    pdf = corpus.make_pages_pdf(120, seed=12)
    pdf.insert(0, "doc_id", range(len(pdf)))
    inp = str(tmp_path / "docs")
    spark.createDataFrame(pdf[["doc_id", "text"]]).write.parquet(inp)
    ixp = str(tmp_path / "ix")
    cli.main(["build", "--input", inp, "--output", ixp,
              "--salt-threshold", "1000", "--buckets", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "ok" and out["n_docs"] == 120
    cli.main(["query", "--index", ixp, "--query", "w00001", "--k", "3"])
    lines = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(x) for x in lines if x.startswith("{")]
    assert all("doc_id" in r for r in rows)
