"""Tokenizer: THE single analyzer definition shared by index build,
query parsing, the pure-Python oracle, and the DuckDB oracle SQL.

Reference behavior target: OpenSearch/Lucene ``standard`` analyzer
(Unicode word break + lowercase) -- selected implicitly because the
reference's index templates map 92 fields as ``type: text`` and never
set a custom ``analyzer`` (reference deploy_es/data.ini:104 and
siblings). For cross-engine determinism (Spark Java regex == DuckDB
RE2 == Python re) we pin an ASCII-alnum word segmentation:

    lowercase(s)  then split on  [^a-z0-9]+  and drop empties.

The pattern is a module constant; every consumer derives from it so
index-time and query-time analysis can never diverge (the Lucene
invariant).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: split pattern -- identical semantics in Java regex, RE2 and Python re.
TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"

#: Lucene hard term-size cap (bytes). Ref: siem/__init__.py:1131-1147
#: truncates strings at this limit before indexing.
MAX_TERM_BYTES = 32766

_SPLIT_RE = re.compile(TOKEN_SPLIT_PATTERN)


def tokenize_py(text: str) -> list[str]:
    """Pure-Python analyzer (oracle + query-string path)."""
    if not text:
        return []
    return [t for t in _SPLIT_RE.split(text.lower()) if t]


def tokens_col(col: Column | str) -> Column:
    """Spark Column: array<string> of tokens for a text column.

    Built from native expressions only (lower/split/filter) so it stays
    inside WholeStageCodegen -- no Python in the hot tokenize path.
    """
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(F.lower(c), TOKEN_SPLIT_PATTERN)
    # split() emits '' for leading/trailing separators; drop them JVM-side.
    return F.filter(arr, lambda t: t != "")


def tokens_sql(expr: str) -> str:
    """Spark SQL fragment equivalent of :func:`tokens_col`."""
    return (
        f"filter(split(lower({expr}), '{TOKEN_SPLIT_PATTERN}'), t -> t <> '')"
    )


def duckdb_tokens_sql(expr: str) -> str:
    """DuckDB SQL fragment producing the identical token array."""
    return (
        "list_filter(regexp_split_to_array(lower("
        + expr
        + f"), '{TOKEN_SPLIT_PATTERN}'), t -> t <> '')"
    )


# ---------------------------------------------------------------------------
# Unicode analyzer variant — closer to Lucene's `standard` analyzer
# (Unicode word break over letters/digits). Java regex and RE2 both
# support \p{L}/\p{N}, so Spark and DuckDB agree; Python's `re` does
# not, which is why the ORACLE-GATED default stays the ASCII pattern
# above (three-engine determinism). Select per field, like Lucene's
# per-field analyzer config.
# ---------------------------------------------------------------------------

UNICODE_SPLIT_PATTERN = r"[^\p{L}\p{N}]+"


def tokens_col_unicode(col: Column | str) -> Column:
    """Unicode-aware tokens (Spark native; letters+digits of any
    script kept, lowercase)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(F.lower(c), UNICODE_SPLIT_PATTERN)
    return F.filter(arr, lambda t: t != "")


def duckdb_tokens_unicode_sql(expr: str) -> str:
    return (
        "list_filter(regexp_split_to_array(lower("
        + expr
        + f"), '{UNICODE_SPLIT_PATTERN}'), t -> t <> '')"
    )
