"""Regex text-line source (reference S2: siem/fileformat_text.py:52-80).

The reference matches each line against a named-group regex and emits
the group dict; unmatched lines increment ``regex_error``. Spark:
one ``regexp_extract`` per group (all native; Catalyst collapses the
repeated pattern), plus a match flag for the error side-channel.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Apache/ALB-style access-log pattern (the reference's flagship text
#: logtype, ref aws.ini apache sections + sf_apache_access.py).
APACHE_PATTERN = (
    r"^(\S+) \S+ (\S+) \[([^\]]+)\] \"(\S+) (\S+) ([^\"]+)\" (\d{3}) (\d+|-)"
)
APACHE_GROUPS = [
    "client_ip", "user", "ts_raw", "method", "request", "http_version",
    "status", "bytes",
]


def regex_parse(df: DataFrame, line_col: str, pattern: str,
                groups: list[str]) -> DataFrame:
    """Extract ``groups`` (1-indexed regex groups) as columns; rows
    that don't match get ``_matched = false`` and empty strings —
    the caller routes them to a quarantine side-output instead of
    failing the job (ref regex_error counter)."""
    c = F.col(line_col)
    cols = [
        F.regexp_extract(c, pattern, i + 1).alias(g)
        for i, g in enumerate(groups)
    ]
    return df.select("*", *cols, c.rlike(pattern).alias("_matched"))


def compile_check(pattern: str) -> int:
    """Fail fast at plan time on bad patterns; returns group count."""
    return re.compile(pattern).groups
