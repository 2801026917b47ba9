"""flat_object fields: arbitrary JSON indexed without mapping explosion.

OpenSearch's ``flat_object`` mapping type stores a whole JSON subtree
as leaf-path/value pairs so free-form payloads (exactly what the
reference ingests — es_loader flattens nested event dicts into dotted
keys, reference siem/utils.py:445-470 value_from_nesteddict /
put_value_into_nesteddict) stay queryable by ``root`` or
``root.inner.path`` without a field per key.  Lucene-side it is two
keyword fields (``_value`` and ``_valueAndPath``); the Spark-native
dual is ONE ``map<string, array<string>>`` column:

* key   = dotted leaf path under the root field
* value = the leaf's stringified values (arrays keep every element —
  Lucene multi-valued keyword semantics: a query matches if ANY
  value matches)

Query routing lives in ``querystring.flat_field_pred``: term /
wildcard / in / range / exists leaves whose field's first segment is
a map-typed docs column compile to native higher-order ``exists``
over ``element_at(map, 'sub.path')`` (leaf search) or
``flatten(map_values(map))`` (root search) — per-row whole-stage
codegen, no explode, no join, no shuffle.  Values are stored AS
STRINGS like the upstream keyword fields; range bounds follow the
engine's shared dialect (numeric bounds compare numerically, ISO
dates as timestamps, else lexically) — a superset of the upstream
type's lexical-only ranges.

At 100 TB the map column costs what the JSON blob already cost —
flattening is one Arrow-batched pass at ingest, and parquet encodes
the repeated key strings dictionary-style.  No per-key schema growth
means the mapping stays O(1) regardless of payload diversity — the
exact problem the upstream type exists to solve (mapping explosions
from adversarial/diverse log keys).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _leaf_str(v) -> str:
    """Stringify a JSON scalar the way the keyword doc-values would
    render it (bools lowercase, numbers as-written by json)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    return json.dumps(v)


def flatten_py(obj, prefix: str = "") -> dict[str, list[str]]:
    """Pure-Python flattener (shared by the Spark op and tests):
    nested dicts extend the dotted path, arrays contribute each
    element at the SAME path (array-of-object elements recurse), null
    leaves are dropped (an absent key and a null key are equally
    unsearchable, as upstream)."""
    out: dict[str, list[str]] = {}

    def walk(node, path: str) -> None:
        if node is None:
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}.{k}" if path else str(k))
            return
        if isinstance(node, list):
            for v in node:
                walk(v, path)
            return
        if path:
            out.setdefault(path, []).append(_leaf_str(node))

    walk(obj, prefix)
    return out


def flatten_json(df: DataFrame, src_col: str,
                 out_col: str) -> DataFrame:
    """Add a flat_object column parsed from the JSON strings in
    ``src_col``.  One Arrow-batched ``mapInPandas`` pass (JSON has no
    closed-form schema, so a native ``from_json`` cannot apply);
    malformed or non-object payloads yield NULL, which no flat query
    matches — the upstream ignore_malformed posture."""
    schema = StructType(list(df.schema.fields) + [StructField(
        out_col, MapType(StringType(), ArrayType(StringType())))])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            maps = []
            for txt in pdf[src_col]:
                if txt is None:
                    maps.append(None)
                    continue
                try:
                    obj = json.loads(txt)
                except (TypeError, ValueError):
                    maps.append(None)
                    continue
                if not isinstance(obj, dict):
                    maps.append(None)
                    continue
                maps.append(flatten_py(obj))
            pdf[out_col] = maps
            yield pdf

    return df.mapInPandas(gen, schema)
