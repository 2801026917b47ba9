"""Sigma detection-rule engine — the OpenSearch Security Analytics
plugin surface the reference stack pairs with its dashboards.

The reference ships threat-detection content as saved searches and
alerting monitors (``source/saved_objects/each-dashboard/*.ndjson``
query fields; ``source/opensearch_alert_config``); OpenSearch's
Security Analytics plugin generalizes that into **Sigma rules** — the
public, vendor-neutral detection format (sigma-spec at
github.com/SigmaHQ/sigma-specification): a YAML document whose
``detection`` block names *search identifiers* (maps of
field-matchers) and combines them with a tiny ``condition`` boolean
language. The plugin compiles each rule to a query and emits
*findings* (doc, rule, severity) that the correlation engine then
links across log sources.

This module reproduces that pipeline Spark-first:

* :func:`compile_rule` — one Sigma rule (already-parsed dict, or YAML
  via :func:`load_rules`) → ONE native boolean ``Column``. Every
  matcher lowers to a codegen expression (``lower() =``, ``contains``,
  ``rlike``, numeric compares, CIDR → a driver-computed uint32 range
  over the shared IPv4 encoding); the condition grammar
  (``and or not ( )``, ``N of pat``, ``all/any of them``) folds the
  selection predicates without any join.
* :func:`sigma_findings` — a whole RULE PACK evaluated over an event
  frame in ONE whole-stage-codegen projection (the same
  array-of-fired-ids shape as ``percolate_query_strings``): cost is
  |events| × (cheap native predicates), zero shuffle before the
  findings themselves. At 100 TB this is the right physical plan — a
  detector sweep is a map-only pass whose output (findings) is
  sparse; the alternative per-rule job would scan the corpus
  |rules| times.
* :func:`sigma_where_sql` — the same rule lowered to a DuckDB WHERE
  clause, so every rule used in tests/gates is value-hash-checkable
  cross-engine (this repo's standing dual-backend contract). The SQL
  lowering never touches the Spark API (rules compile at import time
  in the driver registry, before any session exists) — predicates are
  (lazy-Column, SQL-text) pairs and the Column thunk only runs inside
  :func:`compile_rule`.

Matching semantics follow the public spec: plain string values
compare case-insensitively, ``*``/``?`` wildcards make a
case-insensitive glob, ``null`` means the field is absent, a value
LIST is OR (AND under ``|all``), map entries AND, and a list-of-maps
selection is an OR of maps. Supported modifiers: ``contains``,
``startswith``, ``endswith``, ``all``, ``re``, ``cidr``, ``lt``,
``lte``, ``gt``, ``gte``, ``exists``. Anything else raises — a rule
silently matching wrong is worse than one that refuses to load.
Matchers are null-safe by construction: a matcher over a missing
(NULL) field is **false**, never SQL-NULL — Sigma's ``not filter``
must fire when the filter's field is absent, which three-valued
logic would silently swallow.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MODIFIERS = {"contains", "startswith", "endswith", "all", "re",
              "cidr", "lt", "lte", "gt", "gte", "exists"}


def load_rules(yaml_text: str) -> list[dict]:
    """Parse one or more ``---``-separated Sigma YAML documents."""
    import yaml

    return [d for d in yaml.safe_load_all(yaml_text) if d]


class _P:
    """Dual-lowered predicate: a lazy Spark Column plus its DuckDB SQL
    text. Lazy because rule→SQL lowering must work with no Spark
    session up (driver-registry import time)."""

    __slots__ = ("colf", "sql")

    def __init__(self, colf: Callable[[], Column], sql: str):
        self.colf, self.sql = colf, sql

    def __and__(self, o: "_P") -> "_P":
        return _P(lambda: self.colf() & o.colf(),
                  f"({self.sql} AND {o.sql})")

    def __or__(self, o: "_P") -> "_P":
        return _P(lambda: self.colf() | o.colf(),
                  f"({self.sql} OR {o.sql})")

    def __invert__(self) -> "_P":
        return _P(lambda: ~self.colf(), f"(NOT {self.sql})")


def _lit(value: bool) -> _P:
    return _P(lambda: F.lit(value), "TRUE" if value else "FALSE")


def _all(parts: list[_P]) -> _P:
    return reduce(_P.__and__, parts)


def _any(parts: list[_P]) -> _P:
    return reduce(_P.__or__, parts)


# ---------------------------------------------------------------------------
# value matchers
# ---------------------------------------------------------------------------

def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _glob_to_regex(pattern: str) -> str:
    """Sigma glob (``*``/``?``, ``\\*`` literal) → anchored regex."""
    out, i = [], 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern) and pattern[i + 1] in "*?\\":
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
        i += 1
    return "^(?:" + "".join(out) + ")$"


def _has_glob(value: str) -> bool:
    i = 0
    while i < len(value):
        if value[i] == "\\":
            i += 2
            continue
        if value[i] in "*?":
            return True
        i += 1
    return False


def _cidr_range(cidr: str) -> tuple[int, int]:
    ip, _, bits = cidr.partition("/")
    n = int(bits) if bits else 32
    parts = [int(p) for p in ip.split(".")]
    base = (parts[0] << 24) | (parts[1] << 16) | (parts[2] << 8) | parts[3]
    mask = ((1 << n) - 1) << (32 - n) if n else 0
    lo = base & mask
    return lo, lo | (~mask & 0xFFFFFFFF)


def _match_one(field: str, mods: list[str], value) -> _P:
    """One (field, modifier-chain, single-value) matcher.
    ``all``/list handling happens a level up."""
    p = _match_one_raw(field, mods, value)
    if value is None or (mods and "exists" in mods):
        return p                    # already a definite boolean
    return _P(lambda: F.coalesce(p.colf(), F.lit(False)),
              f"COALESCE({p.sql}, FALSE)")


def _match_one_raw(field: str, mods: list[str], value) -> _P:
    s = field
    col = lambda: F.col(field)  # noqa: E731
    if value is None:
        return _P(lambda: col().isNull(), f"({s} IS NULL)")
    core = [m for m in mods if m != "all"]
    if len(core) > 1:
        raise ValueError(f"unsupported modifier chain {mods!r}")
    mod = core[0] if core else None
    if mod == "exists":
        want = bool(value)
        return _P(
            lambda: col().isNotNull() if want else col().isNull(),
            f"({s} IS {'NOT ' if want else ''}NULL)")
    if mod in ("lt", "lte", "gt", "gte"):
        op = {"lt": "<", "lte": "<=", "gt": ">", "gte": ">="}[mod]
        num = float(value)
        mk = {"lt": lambda: col().cast("double") < num,
              "lte": lambda: col().cast("double") <= num,
              "gt": lambda: col().cast("double") > num,
              "gte": lambda: col().cast("double") >= num}[mod]
        return _P(mk, f"(CAST({s} AS DOUBLE) {op} {num!r})")
    if mod == "cidr":
        lo, hi = _cidr_range(str(value))
        from ..functions.scalars import ipv4_to_long

        return _P(
            lambda: ipv4_to_long(col()).between(lo, hi),
            "((CAST(split_part({s},'.',1) AS UBIGINT)*16777216"
            " + CAST(split_part({s},'.',2) AS UBIGINT)*65536"
            " + CAST(split_part({s},'.',3) AS UBIGINT)*256"
            " + CAST(split_part({s},'.',4) AS UBIGINT))"
            " BETWEEN {lo} AND {hi})".format(s=s, lo=lo, hi=hi))
    if mod == "re":
        # spec: regex is case-sensitive and UNanchored
        pat = str(value)
        return _P(lambda: col().rlike(pat),
                  f"regexp_matches(CAST({s} AS VARCHAR), "
                  f"{_sql_quote(pat)})")
    if isinstance(value, bool):
        return _P(lambda: col().cast("boolean") == value,
                  f"(CAST({s} AS BOOLEAN) = {str(value).upper()})")
    if isinstance(value, (int, float)):
        return _P(lambda: col().cast("double") == float(value),
                  f"(CAST({s} AS DOUBLE) = {float(value)!r})")
    text = str(value)
    lcol = lambda: F.lower(col().cast("string"))  # noqa: E731
    ls = f"lower(CAST({s} AS VARCHAR))"
    low = text.lower()
    if mod == "contains":
        needle = low.replace("\\*", "*").replace("\\?", "?")
        return _P(lambda: lcol().contains(needle),
                  f"(contains({ls}, {_sql_quote(needle)}))")
    if mod == "startswith":
        return _P(lambda: F.startswith(lcol(), F.lit(low)),
                  f"(starts_with({ls}, {_sql_quote(low)}))")
    if mod == "endswith":
        return _P(lambda: F.endswith(lcol(), F.lit(low)),
                  f"(ends_with({ls}, {_sql_quote(low)}))")
    if mod is not None:
        raise ValueError(f"unsupported Sigma modifier {mod!r}")
    if _has_glob(text):
        rx = _glob_to_regex(low)
        return _P(lambda: lcol().rlike(rx),
                  f"regexp_matches({ls}, {_sql_quote(rx)})")
    unesc = text.replace("\\*", "*").replace("\\?", "?").lower()
    return _P(lambda: lcol() == unesc, f"({ls} = {_sql_quote(unesc)})")


def _matcher(field: str, mods: list[str], value) -> _P:
    """Full matcher incl. list semantics: OR over values, AND under
    ``|all``."""
    for m in mods:
        if m not in _MODIFIERS:
            raise ValueError(f"unsupported Sigma modifier {m!r}")
    if isinstance(value, (list, tuple)):
        parts = [_match_one(field, mods, v) for v in value]
        if not parts:
            return _lit(False)
        return _all(parts) if "all" in mods else _any(parts)
    return _match_one(field, mods, value)


# ---------------------------------------------------------------------------
# detection block
# ---------------------------------------------------------------------------

class _Resolver:
    def __init__(self, fieldmap: dict[str, str] | None,
                 keywords_field: str):
        self.fieldmap = fieldmap or {}
        self.keywords_field = keywords_field

    def name(self, field: str) -> str:
        return self.fieldmap.get(field, field)


def _selection(sel, rv: _Resolver) -> _P:
    """One search identifier's body → predicate.

    dict = AND of matchers; list of dicts = OR of maps; list of
    scalars = Sigma *keywords* (case-insensitive contains over the
    designated message field)."""
    if isinstance(sel, dict):
        parts = []
        for key, value in sel.items():
            field, *mods = key.split("|")
            parts.append(_matcher(rv.name(field), mods, value))
        return _all(parts) if parts else _lit(True)
    if isinstance(sel, (list, tuple)):
        if sel and all(isinstance(x, dict) for x in sel):
            return _any([_selection(x, rv) for x in sel])
        # keyword list
        kw = rv.name(rv.keywords_field)
        parts = [_match_one(kw, ["contains"], str(v)) for v in sel]
        return _any(parts) if parts else _lit(False)
    raise ValueError(f"malformed selection {sel!r}")


# ---------------------------------------------------------------------------
# condition grammar:  expr := term (OR term)* ; term := fact (AND fact)*
#   fact := NOT fact | '(' expr ')' | quantified | IDENT
#   quantified := (INT|'all'|'any'|'1') 'of' (pattern|'them')
# ---------------------------------------------------------------------------

_TOKEN = re.compile(r"\(|\)|[^\s()]+")


class _CondParser:
    def __init__(self, cond: str, sels: dict[str, _P]):
        self.toks, self.i, self.sels = _TOKEN.findall(cond), 0, sels

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of Sigma condition")
        self.i += 1
        return t

    def parse(self) -> _P:
        node = self.expr()
        if self.peek() is not None:
            raise ValueError(f"trailing token {self.peek()!r} in condition")
        return node

    def expr(self) -> _P:
        node = self.term()
        while self.peek() and self.peek().lower() == "or":
            self.next()
            node = node | self.term()
        return node

    def term(self) -> _P:
        node = self.fact()
        while self.peek() and self.peek().lower() == "and":
            self.next()
            node = node & self.fact()
        return node

    def fact(self) -> _P:
        t = self.next()
        tl = t.lower()
        if tl == "not":
            return ~self.fact()
        if t == "(":
            inner = self.expr()
            if self.next() != ")":
                raise ValueError("missing ')' in Sigma condition")
            return inner
        nxt = self.peek()
        if nxt and nxt.lower() == "of":
            self.next()
            return self.quantified(tl, self.next())
        if t in self.sels:
            return self.sels[t]
        raise ValueError(f"unknown selection {t!r} in condition")

    def quantified(self, quant: str, target: str) -> _P:
        if target.lower() == "them":
            names = list(self.sels)
        else:
            rx = re.compile(_glob_to_regex(target.lower()))
            names = [n for n in self.sels if rx.match(n.lower())]
        if not names:
            raise ValueError(f"'of {target}' matches no selection")
        parts = [self.sels[n] for n in names]
        if quant == "all":
            return _all(parts)
        if quant in ("any", "1"):
            return _any(parts)
        n = int(quant)
        count_sql = " + ".join(f"(CASE WHEN {p.sql} THEN 1 ELSE 0 END)"
                               for p in parts)
        return _P(
            lambda: reduce(Column.__add__,
                           [p.colf().cast("int") for p in parts]) >= n,
            f"(({count_sql}) >= {n})")


def _compile(rule: dict, fieldmap: dict[str, str] | None,
             keywords_field: str) -> _P:
    det = rule.get("detection")
    if not isinstance(det, dict) or "condition" not in det:
        raise ValueError("Sigma rule needs detection.condition")
    rv = _Resolver(fieldmap, keywords_field)
    sels = {name: _selection(body, rv)
            for name, body in det.items() if name != "condition"}
    return _CondParser(det["condition"], sels).parse()


def compile_rule(rule: dict, fieldmap: dict[str, str] | None = None,
                 keywords_field: str = "message") -> Column:
    """One Sigma rule → ONE native boolean Column over an event frame.

    ``fieldmap`` renames Sigma field names to DataFrame columns (the
    plugin's field-mapping step); ``keywords_field`` receives bare
    keyword lists. Raises on constructs outside the supported subset.
    """
    return _compile(rule, fieldmap, keywords_field).colf()


def sigma_where_sql(rule: dict, fieldmap: dict[str, str] | None = None,
                    keywords_field: str = "message") -> str:
    """The SAME rule lowered to a DuckDB WHERE-clause text — the
    cross-engine twin for the correctness gate. Works with no Spark
    session up."""
    return _compile(rule, fieldmap, keywords_field).sql


def sigma_findings(events: DataFrame, rules: list[dict],
                   id_col: str = "event_id",
                   fieldmap: dict[str, str] | None = None,
                   keywords_field: str = "message",
                   keep_cols: list[str] | None = None) -> DataFrame:
    """Run a rule pack: every rule evaluates in ONE codegen projection
    (no join, no per-rule job) and fired (event, rule) pairs explode
    out as findings ``(id_col, *keep_cols, rule_id, title, level)``.

    The detector sweep the Security Analytics plugin schedules per
    log source — here a map-only pass over the corpus whose output is
    only the (sparse) findings."""
    fired = F.array(*[
        F.when(
            compile_rule(r, fieldmap, keywords_field),
            F.struct(
                F.lit(str(r.get("id", i))).alias("rule_id"),
                F.lit(str(r.get("title", ""))).alias("title"),
                F.lit(str(r.get("level", "medium"))).alias("level"),
            ),
        )
        for i, r in enumerate(rules)
    ])
    extra = keep_cols or []
    return (
        events
        .select(F.col(id_col), *extra,
                F.explode(F.filter(fired, lambda x: x.isNotNull()))
                .alias("__f"))
        .select(F.col(id_col), *extra,
                F.col("__f.rule_id").alias("rule_id"),
                F.col("__f.title").alias("title"),
                F.col("__f.level").alias("level"))
    )
