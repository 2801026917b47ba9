"""Declarative per-source config -> pipeline compiler.

The reference's main extension surface is its 48-section ``aws.ini``
(+ ``user.ini`` overrides): each logtype section declares its format,
field extraction, exclusions, renames, static fields, ECS coalesce
targets and timestamp handling, and ``siem/utils.py:618-636`` merges
the layers into one etl config consumed row-at-a-time by LogParser
(``siem/__init__.py:519-574``: rename -> timestamp -> multitype ->
ECS -> enrich -> prefix -> exclude).

Spark restatement: a config DICT compiles ONCE, at plan-build time on
the driver, into a composition of the existing source readers and
native column expressions -- no per-row interpretation ever happens.
The compiled pipeline is `DataFrame -> DataFrame`, so config-defined
sources drop into any existing DAG (batch or foreachBatch streaming).

Config schema (all keys optional except ``format``)::

    {
      "format": "regex" | "csv" | "json" | "cef" | "none",
      # format == regex:
      "pattern": str, "groups": [str, ...],
      # format == csv:  "header": "a,b,c"
      # format == json: "schema": "a int, b string" (+"records_field")
      "line_col": "line",          # input column holding the raw line
      "drop_unmatched": True,      # regex _matched routing
      "exclusions": [{"field": f, "pattern": regex} |
                     {"field": f, "op": "<"|"<="|...,"value": v}, ...],
      "renames": {old: new, ...},
      "static_fields": {name: literal, ...},
      "ecs": {target: [source_field, ...], ...},   # first non-empty
      "timestamp": {"field": f, "formats": [(spark, duckdb), ...] |
                    "epoch_auto": True, "tz_offset_hours": float,
                    "out": "ts"},
      "prune_empty": [field, ...],   # ''/'-'/'null' -> NULL
      "field_prefix": str,           # namespace original fields
      "select": [col, ...],          # final projection
    }

Ordering mirrors the reference parser: parse -> exclude -> rename ->
static -> ECS -> timestamp -> prune -> prefix -> select.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions import scalars
from .sources import cef as cef_mod
from .sources import csvfmt, jsonfmt, textfmt

_OPS: dict[str, Callable[[Column, object], Column]] = {
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
}


def _parse_stage(cfg: dict) -> Callable[[DataFrame], DataFrame]:
    fmt = cfg["format"]
    line = cfg.get("line_col", "line")
    if fmt == "none":
        return lambda df: df
    if fmt == "regex":
        pattern, groups = cfg["pattern"], cfg["groups"]
        textfmt.compile_check(pattern)
        drop = cfg.get("drop_unmatched", True)

        def run(df: DataFrame) -> DataFrame:
            out = textfmt.regex_parse(df, line, pattern, groups)
            if drop:
                out = out.filter(F.col("_matched")).drop("_matched")
            return out

        return run
    if fmt == "csv":
        header = cfg["header"]
        return lambda df: csvfmt.parse_csv_col(df, line, header)
    if fmt == "json":
        schema = cfg["schema"]
        rec = cfg.get("records_field")

        def run_json(df: DataFrame) -> DataFrame:
            if rec:
                return jsonfmt.explode_records(df, line, rec, schema)
            parsed = jsonfmt.parse_json_col(df, line, schema)
            flat = [F.col(f"rec.{n}").alias(n) for n in parsed.select("rec.*").columns]
            return parsed.select(*df.columns, *flat).drop("rec")

        return run_json
    if fmt == "cef":
        return lambda df: cef_mod.parse_cef(df, line)
    raise ValueError(f"unknown format: {fmt}")


def _exclusion_pred(rules: list[dict]) -> Column | None:
    """Disjunction of per-field conditions; matching rows are DROPPED
    (ref siem/utils.py:1041-1099 pattern trees + JMESPath exclusions)."""
    pred = None
    for r in rules:
        c = F.col(r["field"])
        cond = c.rlike(r["pattern"]) if "pattern" in r else _OPS[r["op"]](
            c, F.lit(r["value"])
        )
        pred = cond if pred is None else (pred | cond)
    return pred


def compile_pipeline(cfg: dict) -> Callable[[DataFrame], DataFrame]:
    """Config dict -> composed DataFrame transformation (pure plan
    construction; every stage is native expressions)."""
    parse = _parse_stage(cfg)
    excl = _exclusion_pred(cfg.get("exclusions", []))
    renames = cfg.get("renames", {})
    statics = cfg.get("static_fields", {})
    ecs = cfg.get("ecs", {})
    ts_cfg = cfg.get("timestamp")
    prune = cfg.get("prune_empty", [])
    prefix = cfg.get("field_prefix")
    select = cfg.get("select")

    def run(df: DataFrame) -> DataFrame:
        out = parse(df)
        if excl is not None:
            out = out.filter(~F.coalesce(excl, F.lit(False)))
        for old, new in renames.items():
            out = out.withColumnRenamed(old, new)
        for name, lit in statics.items():
            out = out.withColumn(name, F.lit(lit))
        for target, sources_ in ecs.items():
            out = out.withColumn(
                target,
                F.coalesce(
                    *[F.nullif(F.col(s), F.lit("")) for s in sources_]
                ),
            )
        if ts_cfg:
            src = F.col(ts_cfg["field"])
            if ts_cfg.get("epoch_auto"):
                ts = scalars.epoch_auto_ts(src)
            else:
                ts = scalars.ts_from_formats(
                    src, ts_cfg.get("formats", scalars.TS_FORMATS)
                )
            off = ts_cfg.get("tz_offset_hours", 0.0)
            if off:
                ts = scalars.tz_shift_to_utc(ts, F.lit(float(off)))
            out = out.withColumn(ts_cfg.get("out", "ts"), ts)
        for f_ in prune:
            out = out.withColumn(
                f_,
                F.when(
                    F.col(f_).isin("", "-", "null"), None
                ).otherwise(F.col(f_)),
            )
        if prefix:
            originals = [c for c in out.columns]
            out = out.select(
                "*",
                F.struct(*[F.col(c) for c in originals]).alias(prefix),
            )
        if select:
            out = out.select(*select)
        return out

    return run


def merge_configs(base: dict, override: dict) -> dict:
    """user.ini-style layering (ref siem/utils.py:618-636): scalar keys
    replace, dict keys deep-merge, list keys replace."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_configs(out[k], v)
        else:
            out[k] = v
    return out
