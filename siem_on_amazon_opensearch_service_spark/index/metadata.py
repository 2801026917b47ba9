"""Index metadata APIs: ``_field_caps``, ``GET /{index}/_mapping``,
and ``_cat/indices``.

Reference semantics target: the read-side metadata endpoints the
dashboards hit before every visualization render — ``_field_caps``
(which fields exist, their type, whether they are searchable /
aggregatable; index-pattern resolution in the UI), ``GET _mapping``
(the concrete field mapping), and ``_cat/indices`` (per-index health:
doc count, store size).  The reference deploys these via OpenSearch;
the loader side (``source/lambda/es_loader``) never implements them,
so this is the engine-side half a dashboard consumer needs.

Spark-first shape: all three are DRIVER-SIDE metadata walks — schema
introspection on the docs DataFrame, ``stats`` manifest reads, and
``os.walk`` byte totals.  None launches a Spark job unless the caller
asks ``_cat`` for exact live-doc counts (then one count per index,
still metadata-sized output).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .build import PostingsIndex

__all__ = ["field_caps", "get_mapping", "cat_indices", "termvectors"]

#: Spark type -> OpenSearch field type (mapping read-back direction;
#: the write direction lives in ``mappings.parse_template``).
_SPARK_TO_OS = {
    T.StringType(): "keyword",
    T.LongType(): "long",
    T.IntegerType(): "integer",
    T.ShortType(): "short",
    T.DoubleType(): "double",
    T.FloatType(): "float",
    T.BooleanType(): "boolean",
    T.TimestampType(): "date",
    T.BinaryType(): "binary",
    T.DateType(): "date",
}


def _os_type(dt: T.DataType) -> str:
    if isinstance(dt, T.ArrayType):
        # OpenSearch has no array type: the element type IS the type
        return _os_type(dt.elementType)
    return _SPARK_TO_OS.get(dt, dt.simpleString())


def field_caps(ix: PostingsIndex, fields: list[str] | None = None,
               text_field: str = "text") -> dict:
    """``_field_caps``: per-field capabilities.  The indexed
    ``text_field`` reports as a searchable (BM25) non-aggregatable
    ``text`` field; every other docs column is keyword-style —
    filterable and aggregatable (the engine evaluates term-level
    predicates and aggs on any docs column, including runtime fields
    already derived onto the handle)."""
    out: dict = {}
    # the indexed text field lives in the postings, not the docs
    # table (the corpus text is not stored alongside doc metadata)
    if fields is None or text_field in fields:
        out[text_field] = {"text": {"type": "text", "searchable": True,
                                    "aggregatable": False}}
    for f in ix.docs.schema.fields:
        if fields is not None and f.name not in fields:
            continue
        if f.name == text_field:
            continue
        if f.name == "doc_id":
            typ, searchable, aggregatable = "long", True, True
        else:
            typ = _os_type(f.dataType)
            searchable, aggregatable = True, typ != "binary"
        out[f.name] = {typ: {"type": typ, "searchable": searchable,
                             "aggregatable": aggregatable}}
    if fields is not None:
        missing = [f for f in fields if f not in out]
        if missing:
            raise ValueError(f"unknown fields: {missing}")
    return out


def get_mapping(ix: PostingsIndex, text_field: str = "text") -> dict:
    """``GET /{index}/_mapping`` read-back: the concrete mapping the
    docs schema implies (inverse of ``mappings.apply_mapping``'s
    write-side projection)."""
    props = {text_field: {"type": "text"}}
    for f in ix.docs.schema.fields:
        if f.name != text_field:
            props[f.name] = {"type": _os_type(f.dataType)}
    return {"mappings": {"properties": props}}


def _dir_bytes(path: str) -> int:
    total = 0
    for base, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(base, f))
    return total


def cat_indices(spark: SparkSession, paths: dict[str, str],
                live_counts: bool = False) -> list[dict]:
    """``_cat/indices`` over saved index roots ``{name: path}``: doc
    count, deleted-doc count, store bytes, term count.  Counts come
    from the stats manifest + tombstone table; ``live_counts=True``
    recounts docs with one Spark job per index (exact after external
    mutation)."""
    import json

    from .tombstones import load_tombstones

    out = []
    for name in sorted(paths):
        path = paths[name]
        stats_dir = os.path.join(path, "stats")
        if not os.path.isdir(stats_dir):
            raise ValueError(f"no index at {path!r}")
        row = {"index": name, "store_bytes": _dir_bytes(path)}
        # stats manifest: one tiny parquet; read driver-side via Spark
        srow = spark.read.parquet(stats_dir).collect()[0]
        row["docs_count"] = int(srow["n_docs"])
        row["avgdl"] = float(srow["avgdl"])
        tomb = os.path.join(path, "tombstones")
        row["docs_deleted"] = (
            load_tombstones(spark, path).count()
            if os.path.isdir(tomb) else 0)
        if live_counts:
            row["docs_count"] = (
                spark.read.parquet(os.path.join(path, "docs")).count()
                - row["docs_deleted"])
        mpath = os.path.join(path, "pit.json")
        if os.path.isfile(mpath):           # a PIT root is an index too
            with open(mpath) as fh:
                row["pit"] = json.load(fh)["pit_id"]
        out.append(row)
    return out


def termvectors(ix: PostingsIndex, source_docs, doc_id: int,
                text_field: str = "text",
                term_statistics: bool = True) -> dict:
    """``_termvectors``: one document's term vector — per-term tf,
    positions, character offsets, plus corpus term statistics (df).
    Like OpenSearch with unstored term vectors, the vector is
    recomputed from ``_source`` (here: the corpus table) at request
    time; the corpus-side cost is a doc_id-pruned single-row read plus
    ONE term-pruned dictionary scan collecting <= |distinct terms|
    stats rows."""
    from pyspark.sql import functions as F

    from ..analysis_ext import analyze_text

    rows = (source_docs.filter(F.col("doc_id") == int(doc_id))
            .select(text_field).collect())
    if not rows:
        raise ValueError(f"doc {doc_id} not found in source_docs")
    stream = analyze_text(rows[0][text_field])

    terms: dict = {}
    for t in stream:
        e = terms.setdefault(t["token"], {"term_freq": 0, "tokens": []})
        e["term_freq"] += 1
        e["tokens"].append({"position": t["position"],
                            "start_offset": t["start_offset"],
                            "end_offset": t["end_offset"]})
    if term_statistics and terms:
        stats = (ix.term_stats
                 .filter(F.col("term").isin(list(terms)))
                 .select("term", "df").collect())
        dfs = {r["term"]: int(r["df"]) for r in stats}
        for term, e in terms.items():
            e["doc_freq"] = dfs.get(term, 0)
    return {"doc_id": int(doc_id),
            "field": text_field,
            "doc_count": ix.n_docs,
            "terms": terms}


def terms_enum(ix: PostingsIndex, field: str, string: str = "",
               size: int = 10, case_insensitive: bool = False,
               search_after: str | None = None,
               text_field: str = "text"):
    """``POST /{index}/_terms_enum``: the first ``size`` terms of
    ``field`` (sorted ascending) that start with ``string`` — the
    keyword-autocomplete endpoint (Kibana filter-pill value
    suggestions hit it on every keystroke).

    Plan shape: for the indexed text field the walk reads the TERM
    DICTIONARY (term_stats — vocabulary-sized, one row per term, the
    Lucene terms-index analog), so the prefix pushes to the parquet
    scan as StringStartsWith and the page is a TakeOrdered over
    vocabulary rows, zero document I/O.  For any other column it is a
    distinct over the docs projection — one pruned-column scan.
    ``search_after`` makes deep paging a filter, not an offset."""
    from pyspark.sql import functions as F

    if field == text_field:
        src = ix.term_stats.select(
            F.col("term").cast("string").alias("term"))
    else:
        src = (ix.docs.select(F.col(field).cast("string").alias("term"))
               .filter(F.col("term").isNotNull()).distinct())
    if string:
        if case_insensitive:
            src = src.filter(
                F.lower(F.col("term")).startswith(string.lower()))
        else:
            src = src.filter(F.col("term").startswith(string))
    if search_after is not None:
        src = src.filter(F.col("term") > str(search_after))
    return src.orderBy("term").limit(int(size))
