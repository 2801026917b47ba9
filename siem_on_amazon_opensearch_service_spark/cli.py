"""Command-line entry points, runnable under ``spark-submit``.

The north_rule deployment shape is ``spark-submit --py-files pkg.zip
job.py`` on a multi-executor cluster; this module is the ``job.py``.
It only ever calls ``SparkSession.builder.getOrCreate()`` so the
cluster master, executor counts and memory all come from
spark-submit/cluster conf, never from code.

    spark-submit --py-files pkg.zip -m ... cli.py build \
        --input  /data/pages_parquet \
        --output /data/index \
        [--salt-threshold 100000] [--resumable --parts 512]

    ... cli.py query  --index /data/index --query "some terms" --k 10
    ... cli.py metrics --index-checkpoint /data/index_ckpt

Packaging: ``python tools/make_pyfiles_zip.py`` produces the
``--py-files`` zip of this package.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cmd_build(args: argparse.Namespace) -> None:
    spark = _spark()
    pages = spark.read.parquet(args.input)
    if args.resumable:
        from siem_on_amazon_opensearch_service_spark.plans import checkpoint

        manifest = checkpoint.checkpointed_build(
            spark, pages, args.output, num_parts=args.parts,
            salt_threshold=args.salt_threshold,
        )
        ix = checkpoint.merge(spark, args.output,
                              salt_threshold=args.salt_threshold)
        done = sum(1 for e in manifest["partitions"].values()
                   if e["status"] == "ok")
        print(json.dumps({
            "status": "ok", "mode": "resumable", "partitions": done,
            "n_docs": ix.n_docs, "avgdl": round(ix.avgdl, 4),
            "index": f"{args.output}/merged",
        }))
    elif args.positional:
        from siem_on_amazon_opensearch_service_spark.index.docids import (
            assign_doc_ids,
        )
        from siem_on_amazon_opensearch_service_spark.index.positional import (
            build_positional_index,
        )

        if "doc_id" not in pages.columns:
            pages = assign_doc_ids(pages, order_col="url")
        ix = build_positional_index(spark, pages, text_col=args.text_col,
                                    salt_threshold=args.salt_threshold)
        ix.save(spark, args.output, buckets=args.buckets)
        print(json.dumps({
            "status": "ok", "mode": "positional", "n_docs": ix.n_docs,
            "avgdl": round(ix.avgdl, 4), "index": args.output,
        }))
    else:
        from siem_on_amazon_opensearch_service_spark.index import build_index

        # id column: honor an explicit --id-col; otherwise reuse an
        # existing doc_id column, else fall back to url-rank
        # assignment (which requires a url column — the input_hint
        # shape). Previously a doc_id-only input crashed on the url
        # repartition inside assign_doc_ids.
        id_col = args.id_col or (
            "doc_id" if "doc_id" in pages.columns else None)
        ix = build_index(spark, pages, text_col=args.text_col,
                         id_col=id_col,
                         salt_threshold=args.salt_threshold)
        ix.save(spark, args.output, buckets=args.buckets)
        print(json.dumps({
            "status": "ok", "mode": "batch", "n_docs": ix.n_docs,
            "avgdl": round(ix.avgdl, 4), "index": args.output,
        }))


def cmd_query(args: argparse.Namespace) -> None:
    spark = _spark()
    from siem_on_amazon_opensearch_service_spark.index import (
        PostingsIndex, bm25_topk,
    )

    ix = PostingsIndex.load(spark, args.index)
    if args.phrase:
        from siem_on_amazon_opensearch_service_spark.index.positional import (
            phrase_topk,
        )

        rows = phrase_topk(ix, args.query, k=args.k).collect()
    elif args.pruned:
        from siem_on_amazon_opensearch_service_spark.plans.pruning import (
            bm25_topk_pruned,
        )

        rows = bm25_topk_pruned(ix, args.query, k=args.k).collect()
    else:
        rows = bm25_topk(ix, args.query, k=args.k,
                         with_url=args.with_url).collect()
    for r in rows:
        print(json.dumps(r.asDict()))


def cmd_ppl(args: argparse.Namespace) -> None:
    """Run a PPL pipeline over parquet tables: each --table name=path
    registers a source; rows print as JSON lines."""
    spark = _spark()
    from siem_on_amazon_opensearch_service_spark.ppl import ppl_query

    tables = {}
    for spec in args.table:
        name, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--table needs name=path, got {spec!r}")
        tables[name] = spark.read.parquet(path)
    for r in ppl_query(spark, args.pipeline, tables).collect():
        print(json.dumps(r.asDict(), default=str))


def cmd_metrics(args: argparse.Namespace) -> None:
    spark = _spark()
    from siem_on_amazon_opensearch_service_spark.plans import checkpoint

    for r in checkpoint.build_metrics(spark, args.index_checkpoint).collect():
        print(json.dumps(r.asDict()))


def cmd_delete(args: argparse.Namespace) -> None:
    """Tombstone documents by url (the _id-style delete; see
    index/tombstones.py). Physical removal happens at `compact`."""
    spark = _spark()
    from siem_on_amazon_opensearch_service_spark.index.tombstones import (
        delete_by_url,
    )

    n = delete_by_url(spark, args.index, args.url)
    print(json.dumps({"status": "ok", "tombstoned": n}))


def cmd_compact(args: argparse.Namespace) -> None:
    spark = _spark()
    from siem_on_amazon_opensearch_service_spark.index.tombstones import (
        compact,
    )

    ix = compact(spark, args.index, args.output,
                 salt_threshold=args.salt_threshold)
    print(json.dumps({
        "status": "ok", "n_docs": ix.n_docs,
        "avgdl": round(ix.avgdl, 4), "index": args.output,
    }))


def cmd_build_rotated(args: argparse.Namespace) -> None:
    spark = _spark()
    from siem_on_amazon_opensearch_service_spark.index.rotation import (
        build_rotated,
    )

    pages = spark.read.parquet(args.input)
    periods = build_rotated(
        spark, pages, args.output, period=args.period,
        ts_col=args.ts_col, salt_threshold=args.salt_threshold,
    )
    print(json.dumps({"status": "ok", "periods": periods}))


def cmd_query_rotated(args: argparse.Namespace) -> None:
    spark = _spark()
    from siem_on_amazon_opensearch_service_spark.index import bm25_topk
    from siem_on_amazon_opensearch_service_spark.index.rotation import (
        load_rotated,
    )

    ix = load_rotated(spark, args.index, start=args.start, end=args.end)
    for r in bm25_topk(ix, args.query, k=args.k).collect():
        print(json.dumps(r.asDict()))


def cmd_chunk(args: argparse.Namespace) -> None:
    spark = _spark()
    from siem_on_amazon_opensearch_service_spark.operators.packing import (
        chunk_documents,
    )

    docs = spark.read.parquet(args.input)
    out = chunk_documents(docs, args.chunk, args.overlap,
                          text_col=args.text_col, id_col=args.id_col)
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"status": "ok", "chunks": int(n),
                      "chunk": args.chunk, "overlap": args.overlap}))


def cmd_startree(args: argparse.Namespace) -> None:
    spark = _spark()
    from siem_on_amazon_opensearch_service_spark.operators.startree import (
        startree_build, startree_sync,
    )

    docs = spark.read.parquet(args.input)
    if args.sync:
        # sync reads dims/metrics from the cube's own meta.json --
        # --dim/--metric are build-time arguments
        if not args.watermark_col:
            raise SystemExit(
                "startree --sync requires --watermark-col")
        res = startree_sync(spark, args.output, docs, args.watermark_col)
        print(json.dumps({"status": "ok", "mode": "sync", **res}))
        return
    if not args.dim or not args.metric:
        raise SystemExit("startree build requires --dim and --metric")
    dims: list = []
    for d in args.dim:
        name, _, interval = d.partition(":")
        dims.append({"date_histogram": {
            "field": name, "calendar_interval": interval}}
            if interval else name)
    metrics: dict[str, list[str]] = {}
    for m in args.metric:
        field, _, kind = m.partition(":")
        metrics.setdefault(field, []).append(kind or "sum")
    st = startree_build(docs, dims, metrics)
    wm = None
    if args.watermark_col:
        from pyspark.sql import functions as F

        wm = docs.agg(F.max(args.watermark_col)).head()[0]
    st.save(args.output, watermark=wm)
    print(json.dumps({"status": "ok", "mode": "build",
                      "dims": st.dims, "metrics": st.metrics}))


def cmd_sort_build(args: argparse.Namespace) -> None:
    spark = _spark()
    from siem_on_amazon_opensearch_service_spark.index import SortedDocs

    sd = SortedDocs.save(spark, spark.read.parquet(args.input),
                         args.out, args.sort_field,
                         buckets=args.buckets)
    print(json.dumps({"status": "ok", "buckets": len(sd.buckets),
                      "null_count": sd.null_count}))


def cmd_sort_topk(args: argparse.Namespace) -> None:
    spark = _spark()
    from siem_on_amazon_opensearch_service_spark.index import SortedDocs

    def _num(x):
        if x is None:
            return None
        try:
            return float(x)
        except ValueError:
            import datetime as dt
            return dt.datetime.fromisoformat(x).replace(
                tzinfo=dt.timezone.utc).timestamp()

    sd = SortedDocs.load(spark, args.layout)
    lo, hi = _num(args.gte), _num(args.lte)
    if lo is not None or hi is not None:
        rows = sd.topk_range(args.k, lo=lo, hi=hi, desc=args.desc)
    else:
        rows = sd.topk(args.k, desc=args.desc)
    for r in rows.collect():
        print(json.dumps(r.asDict(), default=str))
    print(json.dumps({"buckets_read": sd.last_read_buckets}),
          file=sys.stderr)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="spark-webtext-index")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--text-col", default="text")
    b.add_argument("--salt-threshold", type=int, default=100_000)
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--id-col", default=None,
                   help="pre-existing long id column (default: doc_id "
                        "if present, else ids assigned by url rank)")
    b.add_argument("--resumable", action="store_true")
    b.add_argument("--positional", action="store_true",
                   help="store term positions (enables phrase queries)")
    b.add_argument("--parts", type=int, default=64)
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="BM25 top-k")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--pruned", action="store_true")
    q.add_argument("--phrase", action="store_true",
                   help="exact-phrase match (needs a --positional index)")
    q.add_argument("--with-url", action="store_true")
    q.set_defaults(fn=cmd_query)

    pp = sub.add_parser("ppl", help="run a PPL pipeline over parquet")
    pp.add_argument("--table", action="append", required=True,
                    help="repeatable: name=path source registration")
    pp.add_argument("pipeline", help="PPL text, e.g. "
                    "\"source=events | stats count() by event_type\"")
    pp.set_defaults(fn=cmd_ppl)

    m = sub.add_parser("metrics", help="per-partition build lineage")
    m.add_argument("--index-checkpoint", required=True)
    m.set_defaults(fn=cmd_metrics)

    d = sub.add_parser("delete", help="tombstone documents by url")
    d.add_argument("--index", required=True)
    d.add_argument("--url", action="append", required=True,
                   help="repeatable: url of a doc to tombstone")
    d.set_defaults(fn=cmd_delete)

    c = sub.add_parser("compact",
                       help="physically drop tombstoned docs (segment merge)")
    c.add_argument("--index", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--salt-threshold", type=int, default=100_000)
    c.set_defaults(fn=cmd_compact)

    br = sub.add_parser("build-rotated",
                        help="one index per time period (dated indices)")
    br.add_argument("--input", required=True)
    br.add_argument("--output", required=True)
    br.add_argument("--period", choices=["day", "month", "year"],
                    default="month")
    br.add_argument("--ts-col", default="warc_ts")
    br.add_argument("--salt-threshold", type=int, default=100_000)
    br.set_defaults(fn=cmd_build_rotated)

    qr = sub.add_parser("query-rotated",
                        help="BM25 top-k over a period range")
    qr.add_argument("--index", required=True)
    qr.add_argument("--query", required=True)
    qr.add_argument("--start", default=None)
    qr.add_argument("--end", default=None)
    qr.add_argument("--k", type=int, default=10)
    qr.set_defaults(fn=cmd_query_rotated)

    ch = sub.add_parser("chunk",
                        help="sliding-window document chunking")
    ch.add_argument("--input", required=True)
    ch.add_argument("--output", required=True)
    ch.add_argument("--chunk", type=int, default=512)
    ch.add_argument("--overlap", type=int, default=64)
    ch.add_argument("--text-col", default="text")
    ch.add_argument("--id-col", default="doc_id")
    ch.set_defaults(fn=cmd_chunk)

    stp = sub.add_parser(
        "startree", help="build or sync a star-tree aggregation cube")
    stp.add_argument("--input", required=True)
    stp.add_argument("--output", required=True)
    stp.add_argument("--dim", action="append", default=None,
                     help="repeatable (build): column, or col:interval "
                          "for a date_histogram dim (e.g. ts:day)")
    stp.add_argument("--metric", action="append", default=None,
                     help="repeatable (build): field:kind "
                          "(sum/min/max/value_count)")
    stp.add_argument("--watermark-col", default=None)
    stp.add_argument("--sync", action="store_true",
                     help="incremental merge past the stored watermark")
    stp.set_defaults(fn=cmd_startree)

    sb = sub.add_parser(
        "sort-build",
        help="materialize the index.sort layout (range-bucketed, "
             "sorted runs + manifest)")
    sb.add_argument("--input", required=True, help="docs parquet path")
    sb.add_argument("--out", required=True)
    sb.add_argument("--sort-field", required=True)
    sb.add_argument("--buckets", type=int, default=32)
    sb.set_defaults(fn=cmd_sort_build)

    sq = sub.add_parser(
        "sort-topk",
        help="top-k by the sorted field, boundary-bucket reads only")
    sq.add_argument("--layout", required=True)
    sq.add_argument("--k", type=int, default=10)
    sq.add_argument("--desc", action="store_true")
    sq.add_argument("--gte", help="range lower bound (number or ISO date)")
    sq.add_argument("--lte", help="range upper bound (number or ISO date)")
    sq.set_defaults(fn=cmd_sort_topk)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
