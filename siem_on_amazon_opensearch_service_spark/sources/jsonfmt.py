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
