"""Multiline record assembly (reference S5:
siem/fileformat_multiline.py:73-121).

The reference buffers lines until the next first-line-regex match.
Distributed restatement: lines carry (file_id, line_no); a running
count of first-line matches within each file (window cumulative sum)
is the record id — a pure DataFrame groupBy, no stateful Python.
Requires co-partitioning by file (one window partition per file),
which matches the input layout: a file's lines arrive together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assemble_records(df: DataFrame, line_col: str, file_col: str,
                     lineno_col: str, first_re: str,
                     out: str = "record") -> DataFrame:
    """(file_id, record_id, record) — lines joined by newline, records
    delimited by lines matching ``first_re``. Lines before the first
    delimiter form record 0 (the reference drops them; we keep them
    flagged so the caller decides)."""
    w = (
        Window.partitionBy(file_col)
        .orderBy(lineno_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = df.withColumn(
        "_rec_id",
        # anchored like the reference's re.match: rlike alone is a
        # SUBSTRING search, so a continuation line merely containing
        # the delimiter pattern mid-line would start a new record
        F.sum(F.when(F.col(line_col).rlike(f"^(?:{first_re})"), 1)
              .otherwise(0)).over(w),
    )
    return (
        marked.groupBy(file_col, "_rec_id")
        .agg(
            F.concat_ws(
                "\n", F.array_sort(F.collect_list(F.struct(lineno_col, line_col)))
                .getField(line_col)
            ).alias(out)
        )
        .withColumnRenamed("_rec_id", "record_id")
    )
