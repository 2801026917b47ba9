"""CSV source (reference S4: siem/fileformat_csv.py:27-115).

Reference behavior: header row defines field names, ``-`` in names
rewritten to ``_`` (safe-key rule, siem/utils.py:1021-1038),
delimiter or whitespace split. Spark-native: ``from_csv`` against a
header-derived schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def safe_names(names: list[str]) -> list[str]:
    """The reference's key-hygiene rule: '-' -> '_' (P13)."""
    return [n.strip().replace("-", "_") for n in names]


def parse_csv_col(df: DataFrame, col: str, header: str,
                  sep: str = ",", out_prefix: str = "") -> DataFrame:
    """Parse a CSV-line column using ``header`` (a CSV header line)
    for names; all fields string-typed (dynamic-mapping analog —
    downstream casts are explicit, like the reference's per-logtype
    ecs config)."""
    names = safe_names(header.split(sep))
    schema = ", ".join(f"`{n}` string" for n in names)
    parsed = df.withColumn(
        "_csv", F.from_csv(F.col(col), schema, {"sep": sep})
    )
    cols = [
        F.col(f"_csv.{n}").alias(f"{out_prefix}{n}") for n in names
    ]
    return parsed.select("*", *cols).drop("_csv")
