"""KQL (Kibana/Dashboards Query Language) -> query-DSL compiler.

The reference's saved searches are predominantly ``language: kuery``
(81 of the 107 distinct query strings across
``source/saved_objects/each-dashboard/*.ndjson``) — KQL is the
dashboards' DEFAULT search-bar language, with the Lucene
``query_string`` syntax (``index/querystring.py``) as the opt-in
alternative. This module parses the KQL subset those saved searches
use and compiles it onto the SAME ``search_body`` query DSL the rest
of the engine executes, so KQL costs nothing new at runtime:

* ``field: value``            -> ``term`` (numbers auto-typed)
* ``field: "quoted"``         -> ``term`` (keyword equality; on the
                                 default text field: ``match_phrase``)
* ``field: (a or b or c)``    -> bool should of terms (``and`` -> must)
* ``field: *``                -> ``exists``
* ``field: val*`` / ``*val``  -> ``wildcard`` (leading, trailing, infix)
* ``field > n`` (>=, <, <=)   -> ``range`` (date-math values like
                                 ``now-7d`` resolve against ``now=``)
* ``a and b / a or b / not a``-> bool must / should / must_not,
                                 case-insensitive keywords
* bare terms                  -> ``match`` on the default field
* ``"quoted field": v``       -> field names may be quoted, and may
                                 contain dots and slashes unquoted
                                 (``ProductFields.aws/securityhub/
                                 ProductName``)

Whitespace includes non-breaking spaces (several saved searches carry
``log.level:\\u00a0ERROR`` — pasted from rendered dashboards).
Nested object groups ``field:{ a:x and b > 1 }`` compile to the DSL
``nested`` query (single-element block-join semantics), with inner
field names qualified against the path exactly like Kibana's
translation.
"""

from __future__ import annotations

import re

DEFAULT_TEXT_FIELD = "text"


class KQLError(ValueError):
    pass


# token kinds: ( ) { } : cmp str word
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)                       # \s matches \xa0 etc. on str
  | (?P<lpar>\() | (?P<rpar>\))
  | (?P<lbrace>\{) | (?P<rbrace>\})
  | (?P<cmp><=|>=|<|>)
  | (?P<colon>:)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<word>[^\s():<>"{}]+)
    """,
    re.VERBOSE,
)


def _prefix_fields(node: dict, pfx: str) -> dict:
    """Qualify the RELATIVE field names inside a KQL nested group
    (``items:{ name:x and stock > 1 }``) with the nested path --
    Kibana's nested-query translation does the same before emitting
    the DSL ``nested`` node."""
    (kind, body), = node.items()
    if kind == "bool":
        return {"bool": {occ: [_prefix_fields(c, pfx) for c in cs]
                         if isinstance(cs, list) else cs
                         for occ, cs in body.items()}}
    if kind == "nested":
        # nested-in-nested: the inner path (and the fields already
        # qualified against it) re-qualify against the outer path
        return {"nested": dict(
            body, path=f"{pfx}.{body['path']}",
            query=_prefix_fields(body["query"], pfx))}
    if kind == "exists":
        return {"exists": {"field": f"{pfx}.{body['field']}"}}
    if kind in ("term", "wildcard", "range", "match", "match_phrase"):
        (f, v), = body.items()
        return {kind: {f"{pfx}.{f}": v}}
    raise KQLError(f"unsupported clause {kind!r} inside a nested "
                   "group")


def _tokenize(text: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise KQLError(f"cannot tokenize at {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        val = m.group()
        if kind == "str":
            val = re.sub(r"\\(.)", r"\1", val[1:-1])
        out.append((kind, val))
    return out


_DATE_MATH = re.compile(r"^now(?:([+-])(\d+)([smhdwMy]))?$")


def _resolve_date_math(v: str, now):
    m = _DATE_MATH.match(v)
    if not m or now is None:
        return v
    if not m.group(1):
        return now
    import datetime

    n = int(m.group(2))
    unit = m.group(3)
    seconds = {"s": 1, "m": 60, "h": 3600, "d": 86400,
               "w": 7 * 86400, "M": 30 * 86400, "y": 365 * 86400}[unit]
    delta = datetime.timedelta(seconds=n * seconds)
    return now + delta if m.group(1) == "+" else now - delta


def _typed(v: str):
    """Unquoted values type like the dashboards send them: integral ->
    int, decimal -> float, else the raw string."""
    if re.fullmatch(r"[+-]?\d+", v):
        return int(v)
    if re.fullmatch(r"[+-]?\d*\.\d+", v):
        return float(v)
    return v


class _Parser:
    def __init__(self, toks: list[tuple[str, str]], default_field: str,
                 now):
        self.toks = toks
        self.i = 0
        self.default = default_field
        self.now = now

    def peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def _kw(self, *words) -> bool:
        kind, val = self.peek()
        return kind == "word" and val.lower() in words

    # query := or ; or := and (OR and)* ; and := not (AND not)* ;
    # not := NOT not | primary
    def parse(self) -> dict:
        node = self._or()
        if self.peek()[0] is not None:
            raise KQLError(f"trailing input at {self.peek()[1]!r}")
        return node

    def _or(self) -> dict:
        kids = [self._and()]
        while self._kw("or"):
            self.take()
            kids.append(self._and())
        if len(kids) == 1:
            return kids[0]
        return {"bool": {"should": kids, "minimum_should_match": 1}}

    def _and(self) -> dict:
        kids = [self._not()]
        while self._kw("and"):
            self.take()
            kids.append(self._not())
        if len(kids) == 1:
            return kids[0]
        # Kibana's KQL-to-DSL translation puts conjunctions in FILTER
        # context (non-scoring) -- the dashboards sort by time, not
        # relevance; we reproduce the exact translation
        return {"bool": {"filter": kids}}

    def _not(self) -> dict:
        if self._kw("not"):
            self.take()
            return {"bool": {"must_not": [self._not()]}}
        return self._primary()

    def _primary(self) -> dict:
        kind, val = self.peek()
        if kind == "lpar":
            self.take()
            node = self._or()
            if self.take()[0] != "rpar":
                raise KQLError("unbalanced parentheses")
            return node
        if kind in ("word", "str"):
            nxt = self.peek(1)[0]
            if nxt == "colon":
                field = self.take()[1]
                self.take()  # ':'
                return self._field_value(field)
            if nxt == "cmp":
                field = self.take()[1]
                op = self.take()[1]
                vkind, vval = self.take()
                if vkind not in ("word", "str"):
                    raise KQLError(f"bad comparison value after {op}")
                # date math resolves whether or not the value was
                # quoted (Kibana accepts both now-7d and "now-7d")
                if vkind == "str":
                    v = _resolve_date_math(vval, self.now)
                else:
                    v = _typed(vval)
                    if isinstance(v, str):
                        v = _resolve_date_math(v, self.now)
                opname = {">": "gt", ">=": "gte",
                          "<": "lt", "<=": "lte"}[op]
                return {"range": {field: {opname: v}}}
            return self._bare(*self.take())
        raise KQLError(f"unexpected token {val!r}")

    def _bare(self, kind: str, val: str) -> dict:
        if kind == "str":
            return {"match_phrase": {self.default: val}}
        if "*" in val:
            return {"wildcard": {self.default: val.lower()}}
        return {"match": {self.default: val}}

    def _field_value(self, field: str) -> dict:
        kind, val = self.peek()
        if kind == "lbrace":
            # Kibana nested-field group: field:{ a:x and b > 1 } --
            # ONE element must satisfy the whole inner expression
            # (block-join semantics; compiles to the DSL nested
            # query).  Inner field names are relative to the path.
            self.take()
            inner = self._or()
            if self.take()[0] != "rbrace":
                raise KQLError("unbalanced braces in nested group")
            return {"nested": {"path": field,
                               "query": _prefix_fields(inner, field)}}
        if kind == "lpar":
            # grouped value list: f:(a or b), f:(a and b)
            self.take()
            vals = [self._one_value(field)]
            mode = None
            while True:
                k2, v2 = self.peek()
                if k2 == "rpar":
                    self.take()
                    break
                if self._kw("or", "and"):
                    word = self.take()[1].lower()
                    if mode not in (None, word):
                        raise KQLError(
                            "mixed or/and inside one value group")
                    mode = word
                    continue
                vals.append(self._one_value(field))
            if len(vals) == 1:
                return vals[0]
            if mode == "and":
                return {"bool": {"must": vals}}
            return {"bool": {"should": vals,
                             "minimum_should_match": 1}}
        return self._one_value(field)

    def _one_value(self, field: str) -> dict:
        kind, val = self.take()
        if kind == "str":
            if field == self.default:
                return {"match_phrase": {field: val}}
            return {"term": {field: val}}
        if kind != "word":
            raise KQLError(f"expected a value for {field!r}, got {val!r}")
        if val == "*":
            return {"exists": {"field": field}}
        if "*" in val:
            # the analyzer lowercases TEXT terms; keyword columns keep
            # their case (KQL is case-sensitive on keyword fields)
            pat = val.lower() if field == self.default else val
            return {"wildcard": {field: pat}}
        return {"term": {field: _typed(val)}}


def parse_kql(text: str, default_field: str = DEFAULT_TEXT_FIELD,
              now=None) -> dict:
    """Parse a KQL string into a ``search_body`` query-DSL node.
    ``now=`` (a datetime) resolves ``now±<n><unit>`` date math in
    comparison values; without it the raw string passes through (the
    caller pins the clock — same determinism rule as ISM/rotation)."""
    text = text.strip()
    if not text:
        return {"match_all": {}}
    return _Parser(_tokenize(text), default_field, now).parse()


# ---------------------------------------------------------------------------
# Kibana filter pills (the other half of a saved search)
# ---------------------------------------------------------------------------

def kibana_filters_to_query(filters, query: dict | None = None,
                            text_field: str = DEFAULT_TEXT_FIELD) -> dict:
    """Assemble Kibana/Dashboards filter PILLS (the
    ``searchSourceJSON.filter`` array: meta.type phrase / phrases /
    exists / range / custom, with negate and disabled flags) plus an
    optional search-bar query into one bool node — the request the
    dashboards actually send: pills in FILTER context, negated pills
    in must_not, disabled pills skipped.

    ``match_phrase`` on a non-text field rewrites to ``term`` (a
    keyword column holds ONE token, where phrase == equality — this
    engine reserves positional phrase matching for the analyzed text
    field)."""
    must: list = []
    must_not: list = []
    for f in filters or []:
        meta = f.get("meta", {}) or {}
        if meta.get("disabled"):
            continue
        node = _pill_node(f, meta, text_field)
        (must_not if meta.get("negate") else must).append(node)
    b: dict = {}
    if query is not None and query != {"match_all": {}}:
        b["must"] = [query]
    if must:
        b["filter"] = must
    if must_not:
        b["must_not"] = must_not
    return {"bool": b} if b else {"match_all": {}}


def _pill_node(f: dict, meta: dict, text_field: str) -> dict:
    if f.get("query"):
        return _keywordize(f["query"], text_field)
    if "exists" in f or meta.get("type") == "exists":
        field = (f.get("exists") or {}).get("field", meta.get("key"))
        return {"exists": {"field": field}}
    t = meta.get("type")
    if t == "phrase":
        return _phrase_node(meta["key"], meta["params"]["query"],
                            text_field)
    if t == "phrases":
        return {"bool": {"should": [
            _phrase_node(meta["key"], v, text_field)
            for v in meta["params"]], "minimum_should_match": 1}}
    if t == "range":
        return {"range": {meta["key"]: dict(meta["params"])}}
    raise KQLError(f"unsupported filter pill type {t!r}")


def _phrase_node(field: str, value, text_field: str) -> dict:
    if field == text_field:
        return {"match_phrase": {field: value}}
    return {"term": {field: value}}


def _keywordize(node, text_field: str):
    if isinstance(node, dict):
        if len(node) == 1 and "match_phrase" in node:
            (field, v), = node["match_phrase"].items()
            if isinstance(v, dict):
                v = v.get("query")
            return _phrase_node(field, v, text_field)
        return {k: _keywordize(v, text_field) for k, v in node.items()}
    if isinstance(node, list):
        return [_keywordize(x, text_field) for x in node]
    return node
