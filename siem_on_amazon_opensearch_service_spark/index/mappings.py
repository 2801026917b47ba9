r"""Index-template / field-mapping compiler.

Reference parity: the deploy side ships OpenSearch component templates
(`deploy_es/data.ini:84-353`) declaring per-field mappings -- ``@id:
keyword``, ``@message: text``, ``@timestamp: date``,
``cwl_timestamp: date (epoch_millis)``, ``destination.ip: ip``,
``destination.geo.location: geo_point``, numerics
(long/integer/short/float), multi-fields
(``http.request.body.content: keyword + fields.text: text``,
data.ini:193), a dynamic template mapping every undeclared string to
``keyword`` (data.ini:95-99), and
``index.mapping.ignore_malformed: true`` (data.ini:88).  OpenSearch
uses this to decide how each field is stored, indexed, and queried.

Spark restatement: the template compiles to

* :func:`apply_mapping` -- a typed projection over the ingest
  DataFrame: one ``select`` of native cast/parse expressions (date
  strptime vs epoch_millis, ip validation, ``lat,lon`` geo_point
  parse, ``try_cast`` numerics).  ``ignore_malformed`` maps to
  null-on-failure casts (Spark's try_cast / to_timestamp semantics),
  the OpenSearch behavior of indexing the doc with the bad field
  dropped.  Purely plan-time: no UDF, no extra scan, and Catalyst
  folds the casts into the first projection over the source.
* :func:`index_plan` -- which fields feed which index: ``text``
  fields (and multi-field ``.text`` subs) are BM25-analyzed spaces
  (the ``build_multi_index`` fields dict), ``keyword``/numeric/date
  fields stay docs-side columns (filter/agg surface, i.e. Lucene
  doc-values -- ``doc_values: false`` fields are flagged as
  filter-only), consistent with how the query DSL here routes
  text-field clauses to postings and any other field to docs columns.

Dotted names stay FLAT (the reference declares them flat); Spark
handles them as quoted column names.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: mapping type -> Spark cast target for scalar types
_SPARK_TYPES = {
    "keyword": "string",
    "text": "string",
    "ip": "string",
    "integer": "int",
    "short": "smallint",
    "byte": "tinyint",
    "long": "bigint",
    "float": "float",
    "half_float": "float",
    "double": "double",
    "boolean": "boolean",
}

_IP4_RE = (
    r"^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
    r"(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$"
)
# permissive v6 shape check (full validation lives in
# functions/scalars.py; a mapping only needs malformed-detection)
_IP6_RE = r"^[0-9A-Fa-f:.]+:[0-9A-Fa-f:.]*$"


@dataclass
class IndexMapping:
    """Parsed template: flat dotted field name -> mapping dict."""

    properties: dict = dc_field(default_factory=dict)
    dynamic_string_type: str = "keyword"
    ignore_malformed: bool = True


def parse_template(tpl: dict) -> IndexMapping:
    """Accept a full component template (``{"template": {"settings",
    "mappings"}}``), a bare ``{"mappings": ...}``, or bare
    ``{"properties": ...}``."""
    settings = {}
    node = tpl
    if "template" in node:
        node = node["template"]
        settings = node.get("settings", {})
    mappings = node.get("mappings", node)
    props = {
        name: (dict(spec) if isinstance(spec, dict)
               else {"type": str(spec)})
        for name, spec in mappings.get("properties", {}).items()
    }
    dyn = "keyword"
    for d in mappings.get("dynamic_templates", []):
        rule = next(iter(d.values()))
        if rule.get("match_mapping_type") == "string":
            dyn = rule.get("mapping", {}).get("type", "keyword")
    return IndexMapping(
        properties=props,
        dynamic_string_type=dyn,
        ignore_malformed=bool(
            settings.get("index.mapping.ignore_malformed", True)),
    )


def _cast_expr(col: Column, spec: dict, lenient: bool) -> Column:
    t = spec.get("type", "object")
    if t == "date":
        fmt = spec.get("format", "")
        if "epoch_millis" in fmt:
            ms = col.cast("string").try_cast("long") if lenient \
                else col.cast("long")
            return F.timestamp_millis(ms)
        if "epoch_second" in fmt:
            s = col.cast("string").try_cast("long") if lenient \
                else col.cast("long")
            return F.timestamp_seconds(s)
        # ISO and friends; ANSI mode makes to_timestamp throw, so
        # ignore_malformed maps to try_to_timestamp (null-on-failure)
        if lenient:
            return F.try_to_timestamp(col.cast("string"))
        return F.to_timestamp(col.cast("string"))
    if t == "ip":
        s = F.trim(col.cast("string"))
        valid = s.rlike(_IP4_RE) | s.rlike(_IP6_RE)
        return F.when(valid, s) if lenient else s
    if t == "geo_point":
        # the reference writes "lat,lon" strings (geodb.py builds
        # location that way); also accept an existing struct
        s = col.cast("string")
        lat = F.split(s, ",").getItem(0).try_cast("double")
        lon = F.split(s, ",").getItem(1).try_cast("double")
        ok = lat.isNotNull() & lon.isNotNull() & \
            (F.abs(lat) <= 90.0) & (F.abs(lon) <= 180.0)
        pt = F.struct(lat.alias("lat"), lon.alias("lon"))
        return F.when(ok, pt) if lenient else pt
    if t in _SPARK_TYPES:
        target = _SPARK_TYPES[t]
        if lenient and target != "string":
            return col.cast("string").try_cast(target)
        return col.cast(target)
    # object / unknown containers pass through untouched
    return col


def apply_mapping(df: DataFrame, mapping: IndexMapping) -> DataFrame:
    """ONE typed projection implementing the template over whatever
    declared fields exist in ``df`` (missing fields are simply not
    projected -- OpenSearch mappings are declarations, not
    requirements).  Undeclared columns pass through (strings become
    the dynamic type, which for keyword is a no-op cast)."""
    lenient = mapping.ignore_malformed
    cols = []
    for name in df.columns:
        col = F.col(f"`{name}`")
        spec = mapping.properties.get(name)
        if spec is None:
            cols.append(col.alias(name))
            continue
        cols.append(_cast_expr(col, spec, lenient).alias(name))
    return df.select(*cols)


def index_plan(mapping: IndexMapping,
               columns: list[str] | None = None) -> dict:
    """Which field goes to which index structure:

    - ``text_fields``: BM25-analyzed postings spaces -- declared
      ``text`` fields plus multi-field ``fields.<sub>: text`` subs
      (named ``parent.sub``).  Feed these to ``build_multi_index``.
    - ``keyword_fields``: exact-match/agg docs columns (declared
      keyword + multi-field keyword parents).
    - ``filter_only``: ``doc_values: false`` fields -- queryable but
      flagged not-aggregatable (OpenSearch would reject aggs on
      them).
    - ``typed_fields``: everything with a non-string scalar parse
      (date/ip/geo_point/numeric), with the mapping type.
    """
    text_fields: list[str] = []
    keyword_fields: list[str] = []
    filter_only: list[str] = []
    typed_fields: dict[str, str] = {}
    for name, spec in mapping.properties.items():
        if columns is not None and name not in columns:
            continue
        t = spec.get("type", "object")
        if t == "text":
            text_fields.append(name)
        elif t == "keyword":
            keyword_fields.append(name)
            if spec.get("doc_values") is False:
                filter_only.append(name)
        elif t != "object":
            typed_fields[name] = t
        for sub, sspec in (spec.get("fields") or {}).items():
            if sspec.get("type") == "text":
                text_fields.append(f"{name}.{sub}")
            elif sspec.get("type") == "keyword":
                keyword_fields.append(f"{name}.{sub}")
    return {
        "text_fields": sorted(text_fields),
        "keyword_fields": sorted(keyword_fields),
        "filter_only": sorted(filter_only),
        "typed_fields": typed_fields,
        "dynamic_string_type": mapping.dynamic_string_type,
    }


#: Spark dtype -> the _field_caps wire type it presents as.
_CAPS_TYPES = {
    "string": "keyword", "bigint": "long", "int": "integer",
    "smallint": "short", "tinyint": "byte",
    "double": "double", "float": "float", "boolean": "boolean",
    "timestamp": "date", "date": "date", "binary": "binary",
}


def field_caps(df: DataFrame, text_fields: tuple[str, ...] = ("text",),
               ) -> dict[str, dict]:
    """``GET /{index}/_field_caps``: per-field type + capability flags
    derived from the docs schema — pure driver metadata (the schema is
    already on the driver; zero jobs run).

    ``text_fields`` marks analyzed columns (searchable, NOT
    aggregatable — Lucene fielddata semantics); arrays of floats
    present as ``knn_vector``, maps of floats as ``rank_features``,
    other maps/structs as ``object``."""
    caps: dict[str, dict] = {}
    for f_ in df.schema.fields:
        st = f_.dataType.simpleString()
        if f_.name in text_fields and st == "string":
            typ, searchable, aggregatable = "text", True, False
        elif st in _CAPS_TYPES:
            typ, searchable, aggregatable = _CAPS_TYPES[st], True, True
        elif st.startswith("array<float") or st.startswith("array<double"):
            typ, searchable, aggregatable = "knn_vector", True, False
        elif st.startswith("map<string,float") or \
                st.startswith("map<string,double"):
            typ, searchable, aggregatable = "rank_features", True, False
        elif st.startswith(("map<", "struct<")):
            typ, searchable, aggregatable = "object", False, False
        elif st.startswith("array<"):
            inner = st[6:-1]
            typ = _CAPS_TYPES.get(inner, "object")
            searchable = aggregatable = inner in _CAPS_TYPES
        else:
            typ, searchable, aggregatable = "object", False, False
        caps[f_.name] = {"type": typ, "searchable": searchable,
                         "aggregatable": aggregatable}
    return caps
