"""JSON record source (reference S3: siem/fileformat_json.py:57-89).

The reference walks concatenated JSON with raw_decode, optionally
exploding a nested array (``json_delimiter``, e.g. CloudTrail's
``Records``) and stripping EventBridge envelopes. Spark-native:
``from_json`` + ``explode`` — schema-on-read, codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_json_col(df: DataFrame, col: str, schema: str,
                   out: str = "rec") -> DataFrame:
    """Parse a JSON-string column against a DDL schema. Malformed rows
    yield null (the reference's regex_error-counter analog is a
    ``filter(col.isNull())`` side-output, not an exception)."""
    return df.withColumn(out, F.from_json(F.col(col), schema))


def parse_json_col_repaired(df: DataFrame, col: str, schema: str,
                            out: str = "rec") -> DataFrame:
    """F9 parity (ref siem/fileformat_json.py:91-110): some producers
    emit invalid ``\\xNN`` escapes inside JSON strings; the reference
    retries the parse after escaping the backslash. Same here: plain
    ``from_json`` first, and rows it nulls are retried with
    ``\\x`` -> ``\\\\x`` repaired -- a per-row conditional between two
    native parses, no Python."""
    c = F.col(col)
    # PERMISSIVE from_json yields a struct of nulls on failure, not a
    # null struct -- probe with a corrupt-record column to know which
    # parse actually succeeded.
    probe = schema + ", _corrupt string"
    opts = {"columnNameOfCorruptRecord": "_corrupt"}
    plain = F.from_json(c, probe, opts)
    repaired = F.from_json(
        F.regexp_replace(c, r"\\x", r"\\\\x"), probe, opts
    )

    def ok(s: Column) -> Column:
        return s.isNotNull() & s["_corrupt"].isNull()

    chosen = F.when(ok(plain), plain).when(ok(repaired), repaired)
    return df.withColumn(out, chosen.dropFields("_corrupt"))


def explode_records(df: DataFrame, col: str, records_field: str,
                    out: str = "rec") -> DataFrame:
    """CloudTrail-style nested array explode: one output row per
    element of ``col.records_field`` (ref json_delimiter handling,
    fileformat_json.py:76-83)."""
    return df.select(
        "*", F.explode(F.col(f"{col}.{records_field}")).alias(out)
    ).drop(col)


def strip_envelope(df: DataFrame, col: str,
                   detail_field: str = "detail") -> Column:
    """EventBridge envelope: if the parsed struct schema carries a
    ``detail`` wrapper, surface the inner detail (ref
    fileformat_json.py:112-125). A plan-time (schema) decision — the
    envelope shape is per-source config, not per-row — so the output
    type stays stable."""
    struct_type = df.schema[col].dataType
    names = getattr(struct_type, "names", [])
    if detail_field in names:
        return F.col(f"{col}.{detail_field}")
    return F.col(col)
