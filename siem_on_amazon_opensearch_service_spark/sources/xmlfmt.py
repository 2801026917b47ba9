"""Generic XML record source (reference S6:
siem/fileformat_xml.py:58-86).

The reference assembles records by first-line regex and parses with
``xmltodict``. Spark restatement: records arrive as an XML-string
column (use sources.multiline to assemble if needed); parsing runs
``xmltodict`` inside an Arrow-batched ``mapInPandas`` and projects a
caller-declared set of dotted paths into string columns (dynamic
nested dicts cannot be a static DataFrame schema — the path
projection IS the schema declaration, mirroring the reference's
per-logtype ecs config).

Gated: importing this module works without ``xmltodict``; calling
:func:`parse_xml_paths` raises a clear error if it is absent.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # gate the optional dependency
    import xmltodict as _xmltodict
except Exception:  # pragma: no cover
    _xmltodict = None


def _get_path(d, path: str):
    cur = d
    for part in path.split("."):
        if isinstance(cur, dict):
            cur = cur.get(part)
        else:
            return None
    if isinstance(cur, (dict, list)):
        return None
    return None if cur is None else str(cur)


def parse_xml_paths(df: DataFrame, xml_col: str,
                    paths: dict[str, str]) -> DataFrame:
    """Project dotted paths out of an XML-string column.

    ``paths``: output column -> dotted path (attributes are ``@name``
    keys, text nodes ``#text`` — xmltodict conventions). Unparseable
    rows yield nulls plus ``_xml_error = true`` (quarantine pattern,
    ref fileformat_xml error handling).
    """
    if _xmltodict is None:
        raise ImportError(
            "xmltodict is required for parse_xml_paths; install it or "
            "use sources.winevt for the fixed-schema regex parser"
        )
    names = list(paths)
    out_schema = ", ".join(
        [f"`{xml_col}` string"]
        + [f"`{n}` string" for n in names]
        + ["`_xml_error` boolean"]
    )
    cols = df.select(xml_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            rows = []
            for xml in b[xml_col]:
                try:
                    doc = _xmltodict.parse(xml)
                    rows.append(
                        [xml] + [_get_path(doc, p) for p in paths.values()]
                        + [False]
                    )
                except Exception:
                    rows.append([xml] + [None] * len(names) + [True])
            yield pd.DataFrame(rows, columns=[xml_col, *names, "_xml_error"])

    return cols.mapInPandas(run, schema=out_schema)
