"""OpenSearch ingest pipelines (``PUT _ingest/pipeline``) compiled to
DataFrame transforms.

The reference replaces OpenSearch ingest-node pipelines with its own
Lambda ETL (``es_loader``); ``config.py`` restates THAT (aws.ini)
surface.  This module adds the OpenSearch-native declarative form —
the processor-chain JSON a user of the real service would have
deployed — so both config dialects drive the same engine.

A pipeline ``{"processors": [{...}, ...]}`` compiles ONCE on the
driver into a ``DataFrame -> DataFrame`` function: every processor is
a native column expression (zero per-row Python), so the whole chain
is one Catalyst projection pipeline that fuses into the scan.

Supported processors (document fields == columns):

    set        {field, value | copy_from, override=True}
    append     {field, value}                (array column += value)
    remove     {field | [fields], ignore_missing}
    rename     {field, target_field}
    convert    {field, type, target_field?, ignore_missing}
               types: integer/long/float/double/string/boolean
               (try_cast semantics: unparseable -> NULL, the
               ignore_malformed analog)
    gsub       {field, pattern, replacement, target_field?}
    split      {field, separator(regex), target_field?}
    join       {field, separator, target_field?}
    lowercase / uppercase / trim   {field, target_field?}
    grok       {field, patterns: [ONE pattern], pattern_definitions?}
               %{SYNTAX:name} over a built-in pattern set; named
               captures become columns (regexp_extract per capture —
               one regex evaluation per field, constant-folded by
               codegen's common-subexpression elimination)
    dissect    {field, pattern}  e.g. '%{client} - [%{ts}] "%{req}"'
    kv         {field, field_split, value_split, target_field}
               -> MapType column (native str_to_map)
    csv        {field, target_fields, separator=','}
    json       {field, target_field?}  -> MapType(string,string)
    date       {field, formats: [...], target_field='@timestamp',
                timezone?}  formats: Spark datetime patterns plus the
               named ISO8601 / UNIX / UNIX_MS; first parse wins
    user_agent {field, target_field='user_agent'}  (reference
               siem/user_agent.py analog -> struct(family, version))
    script     {lang: 'spark-sql', source: '<expr>', target_field}
               (the engine's Painless stand-in, same stance as
               runtime_mappings in the _search body)
    drop       {if: '<bool expr>'}   (drop matching docs)
    fail       {if: '<bool expr>', message}  (raise at compile if the
               predicate is statically true is impossible -> runtime
               guard column + ANSI error is NOT Spark-shaped; instead
               failing docs are tagged in `_ingest_failed`)
    pipeline   {name}  (invoke another pipeline from `registry`)

Every processor accepts ``if`` (a Spark-SQL boolean expression over
the current columns): the transform applies per-document, i.e. the
new value is ``CASE WHEN cond THEN transformed ELSE old END`` — the
exact ingest-node semantics, still one projection.

``simulate(pipeline, docs)`` is the ``_ingest/pipeline/_simulate``
analog for tests/notebooks.

Reference context: the es_loader's transform steps
(``siem/__init__.py:519-574``) map 1:1 onto these processors (rename,
timestamp=date, static=set, regex=grok/dissect, key cleanup=rename).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class IngestError(ValueError):
    pass


# ---------------------------------------------------------------------------
# grok pattern set (the subset the reference's log formats need)
# ---------------------------------------------------------------------------

GROK_PATTERNS: dict[str, str] = {
    # every definition valid in BOTH Java regex (Spark) and RE2
    # (DuckDB oracle): no backreferences / lookaround, internal
    # groups all non-capturing so binding indices stay aligned
    "WORD": r"\w+",
    "INT": r"[+-]?\d+",
    "POSINT": r"\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "IPV4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "HOSTNAME": (r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})"
                 r"(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b"),
    "IPORHOST": "(?:%{IP}|%{HOSTNAME})",
    "LOGLEVEL": (r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|"
                 r"[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|"
                 r"WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|"
                 r"[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|"
                 r"[Ss]evere|SEVERE|[Ee]merg(?:ency)?|EMERG(?:ENCY)?)"),
    "TIMESTAMP_ISO8601": (r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}"
                          r"(?::\d{2}(?:[.,]\d+)?)?"
                          r"(?:Z|[+-]\d{2}:?\d{2})?"),
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2}(?: [+-]\d{4})?",
    "QUOTEDSTRING": r"\"[^\"]*\"",   # simplified: no escape handling
    "QS": r"\"[^\"]*\"",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "EMAILADDRESS": r"[a-zA-Z0-9._%+-]+@[A-Za-z0-9.-]+",
    "UUID": r"[0-9A-Fa-f]{8}-(?:[0-9A-Fa-f]{4}-){3}[0-9A-Fa-f]{12}",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def grok_to_regex(pattern: str,
                  defs: dict[str, str] | None = None
                  ) -> tuple[str, list[str]]:
    """Expand ``%{SYNTAX:name}`` refs into a plain regex with ONE
    capture group per named ref; returns (regex, names in group
    order). Unnamed refs become non-capturing."""
    table = dict(GROK_PATTERNS)
    if defs:
        table.update(defs)
    names: list[str] = []

    def sub(m: re.Match) -> str:
        syntax, name = m.group(1), m.group(2)
        if syntax not in table:
            raise IngestError(f"unknown grok pattern %{{{syntax}}}")
        # record the name BEFORE expanding the body: group numbers
        # follow paren OPENING order, so a named ref nested inside a
        # custom definition must come after its enclosing group
        # (appending post-expansion reversed outer/inner bindings)
        if name:
            names.append(name)
        body = _GROK_REF.sub(sub, table[syntax])
        if name:
            return f"({body})"
        return f"(?:{body})"

    rx = _GROK_REF.sub(sub, pattern)
    return rx, names


def dissect_to_regex(pattern: str) -> tuple[str, list[str]]:
    """Dissect: literal text between ``%{name}`` keys; each key
    matches non-greedily up to the next literal (the final key takes
    the rest). ``%{}`` skips."""
    parts = [p for p in re.split(r"(%\{[^}]*\})", pattern) if p]
    out = []
    names: list[str] = []
    for idx, p in enumerate(parts):
        if p.startswith("%{"):
            name = p[2:-1]
            # greedy only when NOTHING follows (dissect's final-key
            # take-the-rest rule); a key with a trailing literal is
            # non-greedy first-match
            body = r".*" if idx == len(parts) - 1 else r".*?"
            if name:
                names.append(name)
                out.append(f"({body})")
            else:
                out.append(f"(?:{body})")
        else:
            out.append(re.escape(p))
    return "".join(out), names


# ---------------------------------------------------------------------------
# processor compilation
# ---------------------------------------------------------------------------

def _cond(p: dict) -> Column | None:
    return F.expr(p["if"]) if "if" in p else None


def _guarded(df: DataFrame, field: str, new: Column,
             cond: Column | None) -> DataFrame:
    """withColumn under an optional per-doc condition (ingest-node
    ``if`` semantics: untouched docs keep the old value)."""
    if cond is None:
        return df.withColumn(field, new)
    old = F.col(field) if field in df.columns else F.lit(None)
    # the ELSE branch must be cast-compatible; let Spark resolve via
    # when/otherwise type coercion
    return df.withColumn(field, F.when(cond, new).otherwise(old))


_CONVERT = {
    "integer": "int", "long": "long", "float": "float",
    "double": "double", "string": "string", "boolean": "boolean",
}

def compile_ingest_pipeline(
    pipeline: dict,
    registry: dict[str, dict] | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Compile ``{"processors": [...]}`` into DataFrame -> DataFrame."""
    procs = pipeline.get("processors", [])
    steps: list[Callable[[DataFrame], DataFrame]] = []

    for node in procs:
        if len(node) != 1:
            raise IngestError(f"processor must have one key: {node}")
        kind, p = next(iter(node.items()))
        steps.append(_compile_proc(kind, p, registry))

    def run(df: DataFrame) -> DataFrame:
        for s in steps:
            df = s(df)
        return df

    return run


def _compile_proc(kind: str, p: dict,
                  registry: dict[str, dict] | None
                  ) -> Callable[[DataFrame], DataFrame]:
    cond_of = _cond  # per-call, evaluated lazily against df

    if kind == "set":
        def run(df, p=p):
            new = (F.col(p["copy_from"]) if "copy_from" in p
                   else F.lit(p["value"]))
            if not p.get("override", True) and p["field"] in df.columns:
                new = F.coalesce(F.col(p["field"]), new)
            return _guarded(df, p["field"], new, cond_of(p))
        return run

    if kind == "append":
        def run(df, p=p):
            f = p["field"]
            vals = p["value"] if isinstance(p["value"], list) else [p["value"]]
            lits = F.array(*[F.lit(v) for v in vals])
            base = (F.col(f) if f in df.columns
                    else F.array().cast("array<string>"))
            return _guarded(df, f, F.concat(base, lits), cond_of(p))
        return run

    if kind == "remove":
        def run(df, p=p):
            fields = p["field"] if isinstance(p["field"], list) else [p["field"]]
            missing = [f for f in fields if f not in df.columns]
            if missing and not p.get("ignore_missing", False):
                raise IngestError(f"remove: missing fields {missing}")
            return df.drop(*[f for f in fields if f in df.columns])
        return run

    if kind == "rename":
        def run(df, p=p):
            if p["field"] not in df.columns:
                if p.get("ignore_missing", False):
                    return df
                raise IngestError(f"rename: missing field {p['field']}")
            return df.withColumnRenamed(p["field"], p["target_field"])
        return run

    if kind == "convert":
        def run(df, p=p):
            t = _CONVERT.get(p["type"])
            if t is None:
                raise IngestError(f"convert: unknown type {p['type']}")
            tgt = p.get("target_field", p["field"])
            new = F.col(p["field"]).try_cast(t)
            return _guarded(df, tgt, new, cond_of(p))
        return run

    if kind == "gsub":
        def run(df, p=p):
            tgt = p.get("target_field", p["field"])
            new = F.regexp_replace(F.col(p["field"]), p["pattern"],
                                   p["replacement"])
            return _guarded(df, tgt, new, cond_of(p))
        return run

    if kind == "split":
        def run(df, p=p):
            tgt = p.get("target_field", p["field"])
            return _guarded(df, tgt,
                            F.split(F.col(p["field"]), p["separator"]),
                            cond_of(p))
        return run

    if kind == "join":
        def run(df, p=p):
            tgt = p.get("target_field", p["field"])
            return _guarded(df, tgt,
                            F.array_join(F.col(p["field"]), p["separator"]),
                            cond_of(p))
        return run

    if kind in ("lowercase", "uppercase", "trim"):
        fn = {"lowercase": F.lower, "uppercase": F.upper,
              "trim": F.trim}[kind]
        def run(df, p=p, fn=fn):
            tgt = p.get("target_field", p["field"])
            return _guarded(df, tgt, fn(F.col(p["field"])), cond_of(p))
        return run

    if kind == "grok":
        pats = p.get("patterns", [])
        if len(pats) != 1:
            raise IngestError("grok: exactly one pattern supported")
        rx, names = grok_to_regex(pats[0], p.get("pattern_definitions"))
        def run(df, p=p, rx=rx, names=names):
            src = F.col(p["field"])
            cond = cond_of(p)  # every ingest processor honors `if`
            for i, name in enumerate(names, start=1):
                df = _guarded(df, name,
                              F.regexp_extract(src, rx, i), cond)
            return df
        return run

    if kind == "dissect":
        rx, names = dissect_to_regex(p["pattern"])
        def run(df, p=p, rx=rx, names=names):
            src = F.col(p["field"])
            cond = cond_of(p)
            for i, name in enumerate(names, start=1):
                df = _guarded(df, name,
                              F.regexp_extract(src, rx, i), cond)
            return df
        return run

    if kind == "kv":
        def run(df, p=p):
            tgt = p.get("target_field", p["field"])
            new = F.str_to_map(F.col(p["field"]),
                               F.lit(p["field_split"]),
                               F.lit(p["value_split"]))
            return _guarded(df, tgt, new, cond_of(p))
        return run

    if kind == "csv":
        def run(df, p=p):
            sep = re.escape(p.get("separator", ","))
            parts = F.split(F.col(p["field"]), sep)
            cond = cond_of(p)
            for i, name in enumerate(p["target_fields"]):
                df = _guarded(df, name, F.element_at(parts, i + 1), cond)
            return df
        return run

    if kind == "json":
        def run(df, p=p):
            tgt = p.get("target_field", p["field"])
            new = F.from_json(F.col(p["field"]),
                              T.MapType(T.StringType(), T.StringType()))
            return _guarded(df, tgt, new, cond_of(p))
        return run

    if kind == "date":
        def run(df, p=p):
            tgt = p.get("target_field", "@timestamp")
            formats = p.get("formats", ["ISO8601"])
            src = F.col(p["field"])
            attempts = []
            for f in formats:
                if f == "ISO8601":
                    attempts.append(F.try_to_timestamp(src))
                elif f == "UNIX":
                    attempts.append(F.timestamp_seconds(
                        src.try_cast("double")))
                elif f == "UNIX_MS":
                    attempts.append(F.timestamp_millis(
                        src.try_cast("long")))
                else:
                    attempts.append(F.try_to_timestamp(src, F.lit(f)))
            ts = F.coalesce(*attempts)
            if p.get("timezone"):
                ts = F.to_utc_timestamp(ts, p["timezone"])
            return _guarded(df, tgt, ts, cond_of(p))
        return run

    if kind == "user_agent":
        def run(df, p=p):
            from .functions.scalars import ua_fields
            tgt = p.get("target_field", "user_agent")
            fields = ua_fields(F.col(p["field"]))
            return _guarded(
                df, tgt,
                F.struct(*[v.alias(k) for k, v in fields.items()]),
                cond_of(p))
        return run

    if kind == "script":
        if p.get("lang", "spark-sql") != "spark-sql":
            raise IngestError("script: only lang='spark-sql' supported "
                              "(the engine's Painless stand-in)")
        def run(df, p=p):
            return _guarded(df, p["target_field"],
                            F.expr(p["source"]), cond_of(p))
        return run

    if kind == "drop":
        def run(df, p=p):
            if "if" not in p:
                raise IngestError("drop needs an if condition")
            return df.filter(~F.expr(p["if"]) | F.expr(p["if"]).isNull())
        return run

    if kind == "fail":
        def run(df, p=p):
            if "if" not in p:
                raise IngestError("fail needs an if condition")
            flag = F.when(F.expr(p["if"]),
                          F.lit(p.get("message", "fail"))
                          ).otherwise(F.lit(None))
            if "_ingest_failed" in df.columns:
                flag = F.coalesce(F.col("_ingest_failed"), flag)
            return df.withColumn("_ingest_failed", flag)
        return run

    if kind == "pipeline":
        if not registry or p["name"] not in registry:
            raise IngestError(f"unknown pipeline {p.get('name')!r}")
        inner = compile_ingest_pipeline(registry[p["name"]], registry)
        def run(df, inner=inner):
            return inner(df)
        return run

    raise IngestError(f"unknown processor {kind!r}")


def simulate(pipeline: dict, docs: DataFrame,
             registry: dict[str, dict] | None = None) -> DataFrame:
    """``_ingest/pipeline/_simulate``: run the pipeline over a doc
    batch and return the transformed docs."""
    return compile_ingest_pipeline(pipeline, registry)(docs)
