"""Mini-PPL: the OpenSearch Piped Processing Language subset the
SIEM dashboards' ad-hoc analysis uses, compiled to a DataFrame
pipeline (PPL is the query language the OpenSearch SQL plugin ships
for log exploration: ``search source=t | where ... | stats ... by ...
| sort ... | head N``).

Supported commands (each a pipe stage):

    search source=<table>            first stage (``search`` optional)
    where <expr>                     boolean filter; =, !=, >, >=, <,
                                     <=, and, or, not, in (...),
                                     like '<pat>' (% / _ wildcards)
    fields [+|-] f1, f2              projection (``-`` drops)
    eval name = <arith expr>         computed column (+ - * /, parens,
                                     if(cond, a, b), round(x, <int>))
    rename a as b [, c as d]
    dedup f1 [, f2]                  first row per key, input order is
                                     undefined -> deterministic
                                     tie-break on all key cols only
    stats <agg> [as x] [, ...] [by f1, f2]
        aggs: count(), count(f), sum(f), avg(f), min(f), max(f),
              distinct_count(f), stddev_samp(f), stddev_pop(f),
              var_samp(f), var_pop(f), percentile(f, p) (exact
              interpolated -- quantile_cont in the oracle)
        a by-item may be span(ts_col, Nu) with u in s/m/h/d — the
        PPL date_histogram: epoch-floored fixed buckets, emitted as
        'yyyy-MM-dd HH:mm:ss' strings under the name <ts_col>_span
    top [N] f1 [, f2] [by g]         most frequent value combos
                                     (default N=10), count desc
    rare [N] f1 [, f2]               least frequent, count asc
    parse <field> '<regex>' as f1 [, f2]
                                     regex extract: capture group i
                                     binds to the i-th name
    grok <field> '<grok pattern>'    %{SYNTAX:name} references from
                                     the public grok dictionary
                                     (GROK_PATTERNS: IP, HOSTNAME,
                                     NUMBER, LOGLEVEL, TIMESTAMP_
                                     ISO8601, UUID, ...) — desugars
                                     onto the parse stage, one
                                     compiled regex, dual-dialect
                                     (Java + RE2) safe
    eventstats <agg> [as x] [, ...] [by f1, f2]
                                     window aggregates APPENDED as
                                     columns (no row reduction) —
                                     partitioned by the by-keys, or
                                     the whole input when absent
                                     (whole-input eventstats is a
                                     single-partition window: fine
                                     for post-stats result sets, not
                                     for raw fact tables at scale)
    fillnull with <value> in f1 [, f2]
                                     null -> constant, in place
    trendline sort [+|-]f sma(N, field) [as alias]
                                     simple moving average over the
                                     N-row trailing window in sort
                                     order; null until the window is
                                     full (OpenSearch semantics).
                                     default alias <field>_trendline
    lookup <table> <key> [as <localkey>]
                                     enrich by left-joining the
                                     lookup table (broadcast — dim
                                     semantics), appending its
                                     non-key columns
    sort [+|-]f1 [, [+|-]f2]
    head N
    ad field=<v> [time_field=<ts>] [by=<f1,f2>] [threshold=<x>]
                                     ml-commons anomaly command:
                                     appends score + anomaly_grade
                                     via the deterministic seasonal
                                     median/MAD detector (the
                                     plugin's RCF is a seeded
                                     streaming forest; same response
                                     columns, reproducible)
    kmeans [centroids=K] [iterations=N] [fields=<f1,f2>]
           [distance_type=EUCLIDEAN|COSINE|L1]
                                     ml-commons clustering command:
                                     appends ClusterID; Lloyd
                                     training on the IVF machinery,
                                     metric per distance_type
                                     (EUCLIDEAN default, as the
                                     plugin)

Compilation is purely structural: each stage maps 1:1 onto the
DataFrame API (filter/select/withColumn/groupBy/orderBy/limit), so
the whole pipeline stays inside Catalyst — predicate pushdown,
column pruning and partial aggregation all apply exactly as if the
user had written the DataFrame code by hand. A parallel
:func:`ppl_to_sql` emits the equivalent ANSI SQL for the DuckDB
oracle, built from the SAME parsed stages (one parser, two
backends), which is how the driver gate checks the compiler.

Grammar reference: the public OpenSearch PPL documentation
(https://opensearch.org/docs/latest/search-plugins/sql/ppl/) — the
subset here covers the commands used in the reference's runbooks.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NUM = re.compile(r"^-?\d+(\.\d+)?$")
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


class PPLError(ValueError):
    pass


def _kv_params(rest: str) -> dict[str, str]:
    """``key=value`` option pairs (values optionally quoted) — the
    ml-command option shape (``ad time_field='ts' ...``)."""
    out = {}
    for m in re.finditer(
            r"([A-Za-z_][A-Za-z0-9_]*)\s*=\s*"
            r"(?:'([^']*)'|\"([^\"]*)\"|(\S+))", rest):
        out[m.group(1)] = next(g for g in m.groups()[1:]
                               if g is not None)
    return out


# ---------------------------------------------------------------------------
# expression mini-parser (precedence: or < and < not < cmp < add < mul)
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"\s*(>=|<=|!=|=|>|<|\(|\)|,|\+|-|\*|/|'(?:[^'\\]|\\.)*'|"
    r"[A-Za-z_][A-Za-z0-9_.]*|\d+\.\d+|\d+)"
)


def _tokenize(s: str) -> list[str]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN.match(s, i)
        if not m:
            if s[i:].strip() == "":
                break
            raise PPLError(f"bad token at: {s[i:]!r}")
        out.append(m.group(1))
        i = m.end()
    return out


@dataclass
class _Parser:
    toks: list[str]
    pos: int = 0

    def peek(self) -> str | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def take(self, expect: str | None = None) -> str:
        t = self.peek()
        if t is None or (expect is not None and t.lower() != expect):
            raise PPLError(f"expected {expect!r}, got {t!r}")
        self.pos += 1
        return t

    # ast nodes: ('num', v) ('str', v) ('col', name)
    #            ('bin', op, l, r) ('not', x) ('in', col, [..])
    #            ('like', col, pat)
    def expr(self):
        return self._or()

    def _or(self):
        n = self._and()
        while (self.peek() or "").lower() == "or":
            self.take()
            n = ("bin", "or", n, self._and())
        return n

    def _and(self):
        n = self._not()
        while (self.peek() or "").lower() == "and":
            self.take()
            n = ("bin", "and", n, self._not())
        return n

    def _not(self):
        if (self.peek() or "").lower() == "not":
            self.take()
            return ("not", self._not())
        return self._cmp()

    def _cmp(self):
        n = self._add()
        t = (self.peek() or "").lower()
        if t in (">=", "<=", "!=", "=", ">", "<"):
            op = self.take()
            return ("bin", op, n, self._add())
        if t == "in":
            self.take()
            self.take("(")
            items = [self._atom()]
            while self.peek() == ",":
                self.take()
                items.append(self._atom())
            self.take(")")
            for x in items:
                if x[0] not in ("num", "str"):
                    # a column ref here would silently become a STRING
                    # literal on the DataFrame side (Column.isin takes
                    # values) while the SQL backend would reference the
                    # column — refuse rather than diverge
                    raise PPLError("in (...) takes literal values only")
            return ("in", n, items)
        if t == "like":
            self.take()
            pat = self._atom()
            if pat[0] != "str":
                raise PPLError("like needs a string pattern")
            return ("like", n, pat[1])
        return n

    def _add(self):
        n = self._mul()
        while self.peek() in ("+", "-"):
            op = self.take()
            n = ("bin", op, n, self._mul())
        return n

    def _mul(self):
        n = self._atom()
        while self.peek() in ("*", "/"):
            op = self.take()
            n = ("bin", op, n, self._atom())
        return n

    def _atom(self):
        t = self.peek()
        if t is None:
            raise PPLError("unexpected end of expression")
        if t == "(":
            self.take()
            n = self.expr()
            self.take(")")
            return n
        if t == "-":
            # unary minus: -5, -x, -(a + b)
            self.take()
            inner = self._atom()
            if inner[0] == "num":
                return ("num", -inner[1])
            return ("bin", "-", ("num", 0), inner)
        self.take()
        if t.startswith("'"):
            return ("str", t[1:-1].replace("\\'", "'"))
        if _NUM.match(t):
            return ("num", float(t) if "." in t else int(t))
        if _IDENT.match(t):
            if self.peek() == "(":
                # scalar function call: if(cond, a, b) / round(x, n)
                self.take("(")
                args = [self.expr()]
                while self.peek() == ",":
                    self.take()
                    args.append(self.expr())
                self.take(")")
                fn = t.lower()
                if fn not in ("if", "round"):
                    raise PPLError(f"unknown function {t!r}")
                return ("fn", fn, args)
            return ("col", t)
        raise PPLError(f"bad atom {t!r}")


def parse_expr(s: str):
    p = _Parser(_tokenize(s))
    n = p.expr()
    if p.peek() is not None:
        raise PPLError(f"trailing input: {p.toks[p.pos:]}")
    return n


# ---------------------------------------------------------------------------
# expression backends
# ---------------------------------------------------------------------------

def _round_digits(n) -> int:
    """Digits argument of a parsed ``round`` node: optional (PPL's
    one-arg ``round(x)`` rounds to 0 decimals) and must be an integer
    literal — a column ref or fraction here previously crashed with a
    bare IndexError/TypeError deep in the backend."""
    if len(n[2]) == 1:
        return 0
    if len(n[2]) != 2:
        raise PPLError("round takes 1 or 2 arguments")
    d = n[2][1]
    if d[0] != "num" or float(d[1]) != int(d[1]):
        raise PPLError("round digits must be an integer literal")
    return int(d[1])


def _to_col(n):
    kind = n[0]
    if kind == "num":
        return F.lit(n[1])
    if kind == "str":
        return F.lit(n[1])
    if kind == "col":
        return F.col(n[1])
    if kind == "not":
        return ~_to_col(n[1])
    if kind == "in":
        return _to_col(n[1]).isin([x[1] for x in n[2]])
    if kind == "like":
        return _to_col(n[1]).like(n[2])
    if kind == "fn":
        args = [_to_col(a) for a in n[2]]
        if n[1] == "if":
            return F.when(args[0], args[1]).otherwise(args[2])
        if n[1] == "round":
            return F.round(args[0], _round_digits(n))
    op, l, r = n[1], _to_col(n[2]), _to_col(n[3])
    return {
        "or": l | r, "and": l & r, "=": l == r, "!=": l != r,
        ">": l > r, ">=": l >= r, "<": l < r, "<=": l <= r,
        "+": l + r, "-": l - r, "*": l * r, "/": l / r,
    }[op]


def _to_sql(n) -> str:
    kind = n[0]
    if kind == "num":
        return repr(n[1])
    if kind == "str":
        return "'" + n[1].replace("'", "''") + "'"
    if kind == "col":
        return n[1]
    if kind == "not":
        return f"(NOT {_to_sql(n[1])})"
    if kind == "in":
        return (f"({_to_sql(n[1])} IN ("
                + ", ".join(_to_sql(x) for x in n[2]) + "))")
    if kind == "like":
        return f"({_to_sql(n[1])} LIKE '" + n[2].replace("'", "''") + "')"
    if kind == "fn":
        if n[1] == "if":
            a, b, c = (_to_sql(x) for x in n[2])
            return f"(CASE WHEN {a} THEN {b} ELSE {c} END)"
        if n[1] == "round":
            return f"round({_to_sql(n[2][0])}, {_round_digits(n)})"
    op = {"=": "=", "and": "AND", "or": "OR"}.get(n[1], n[1].upper())
    return f"({_to_sql(n[2])} {op} {_to_sql(n[3])})"


# ---------------------------------------------------------------------------
# pipeline parsing
# ---------------------------------------------------------------------------

_AGG_RE = re.compile(
    r"^(count|sum|avg|min|max|distinct_count|stddev_samp|stddev_pop|"
    r"var_samp|var_pop)\s*\(\s*([A-Za-z0-9_.]*)\s*\)"
    r"(?:\s+as\s+([A-Za-z_][A-Za-z0-9_]*))?$", re.I)
_PCT_RE = re.compile(
    r"^percentile\s*\(\s*([A-Za-z0-9_.]+)\s*,\s*(\d+(?:\.\d+)?)\s*\)"
    r"(?:\s+as\s+([A-Za-z_][A-Za-z0-9_]*))?$", re.I)

def grok_to_regex(pattern: str) -> tuple[str, list[str]]:
    """PPL ``grok`` shares the ingest-pipeline grok engine
    (``ingest.GROK_PATTERNS`` / ``ingest.grok_to_regex`` — one
    dictionary, both surfaces): named bindings become capture groups
    in order, anonymous refs non-capturing; write literal groups as
    ``(?:...)`` so indices stay aligned (the logstash caveat)."""
    from .ingest import IngestError
    from .ingest import grok_to_regex as _grok

    try:
        return _grok(pattern)
    except IngestError as e:
        raise PPLError(str(e)) from None


@dataclass
class PPLQuery:
    source: str
    stages: list[tuple] = field(default_factory=list)


def _parse_aggs(aggpart: str) -> list[tuple[str, str, str]]:
    """Parse 'fn(col) [as alias], ...' into (fn, col, alias) triples."""
    aggs = []
    # split on commas OUTSIDE parens so percentile(f, 95) survives
    for item in re.split(r",(?![^(]*\))", aggpart):
        item = item.strip()
        pm = _PCT_RE.match(item)
        if pm:
            col, p, alias = pm.group(1), pm.group(2), pm.group(3)
            aggs.append((f"percentile:{p}", col,
                         alias or f"percentile_{p}({col})"))
            continue
        mm = _AGG_RE.match(item)
        if not mm:
            raise PPLError(f"bad agg {item!r}")
        fn, col, alias = mm.group(1).lower(), mm.group(2), mm.group(3)
        if fn != "count" and not col:
            raise PPLError(f"{fn} needs a column")
        aggs.append((fn, col, alias or
                     (f"{fn}({col})" if col else "count()")))
    return aggs


def parse_ppl(text: str) -> PPLQuery:
    parts = [p.strip() for p in text.split("|")]
    head = parts[0]
    m = re.match(r"^(?:search\s+)?source\s*=\s*([A-Za-z_][A-Za-z0-9_]*)$",
                 head, re.I)
    if not m:
        raise PPLError(f"first stage must be 'search source=<t>': {head!r}")
    q = PPLQuery(source=m.group(1))
    for part in parts[1:]:
        if not part:
            raise PPLError("empty pipe stage")
        cmd, _, rest = part.partition(" ")
        cmd = cmd.lower()
        rest = rest.strip()
        if cmd == "where":
            q.stages.append(("where", parse_expr(rest)))
        elif cmd == "fields":
            drop = rest.startswith("-")
            body = rest[1:] if rest[:1] in "+-" else rest
            cols = [c.strip() for c in body.split(",") if c.strip()]
            q.stages.append(("fields", drop, cols))
        elif cmd == "eval":
            name, _, ex = rest.partition("=")
            if not _IDENT.match(name.strip()):
                raise PPLError(f"bad eval target {name!r}")
            q.stages.append(("eval", name.strip(), parse_expr(ex)))
        elif cmd == "rename":
            pairs = []
            for item in rest.split(","):
                mm = re.match(
                    r"^\s*([A-Za-z0-9_.]+)\s+as\s+([A-Za-z_][A-Za-z0-9_]*)"
                    r"\s*$", item, re.I)
                if not mm:
                    raise PPLError(f"bad rename {item!r}")
                pairs.append((mm.group(1), mm.group(2)))
            q.stages.append(("rename", pairs))
        elif cmd == "dedup":
            cols = [c.strip() for c in rest.split(",") if c.strip()]
            q.stages.append(("dedup", cols))
        elif cmd == "stats":
            byi = re.search(r"\bby\b", rest, re.I)
            aggpart = rest[: byi.start()] if byi else rest
            # split by-items on commas OUTSIDE parens (span(ts, 12h))
            bycols = ([c.strip() for c in
                       re.split(r",(?![^(]*\))", rest[byi.end():])]
                      if byi else [])
            for i, b in enumerate(bycols):
                mm = re.match(
                    r"^span\(\s*([A-Za-z_][A-Za-z0-9_.]*)\s*,\s*"
                    r"(\d+)([smhd])\s*\)$", b, re.I)
                if mm:
                    mult = {"s": 1, "m": 60, "h": 3600, "d": 86400}
                    secs = int(mm.group(2)) * mult[mm.group(3).lower()]
                    bycols[i] = ("span", mm.group(1), secs)
                elif not _IDENT.match(b):
                    raise PPLError(f"bad by-item {b!r}")
            q.stages.append(("stats", _parse_aggs(aggpart), bycols))
        elif cmd == "eventstats":
            byi = re.search(r"\bby\b", rest, re.I)
            aggpart = rest[: byi.start()] if byi else rest
            bycols = ([c.strip() for c in rest[byi.end():].split(",")]
                      if byi else [])
            if not all(_IDENT.match(b) for b in bycols):
                raise PPLError(f"bad eventstats by-items {bycols}")
            q.stages.append(("eventstats", _parse_aggs(aggpart), bycols))
        elif cmd == "fillnull":
            mm = re.match(r"^with\s+(.+?)\s+in\s+(.+)$", rest, re.I)
            if not mm:
                raise PPLError(f"bad fillnull stage {rest!r}")
            raw = mm.group(1).strip()
            if _NUM.match(raw):
                val = ("num", float(raw) if "." in raw else int(raw))
            elif raw.startswith("'") and raw.endswith("'") and len(raw) >= 2:
                val = ("str", raw[1:-1].replace("\\'", "'"))
            else:
                raise PPLError("fillnull value must be a literal")
            cols = [c.strip() for c in mm.group(2).split(",") if c.strip()]
            if not cols or not all(_IDENT.match(c) for c in cols):
                raise PPLError(f"bad fillnull fields {cols}")
            q.stages.append(("fillnull", val, cols))
        elif cmd == "trendline":
            mm = re.match(
                r"^sort\s+([+-]?)([A-Za-z_][A-Za-z0-9_.]*)\s+"
                r"sma\(\s*(\d+)\s*,\s*([A-Za-z_][A-Za-z0-9_.]*)\s*\)"
                r"(?:\s+as\s+([A-Za-z_][A-Za-z0-9_]*))?$", rest, re.I)
            if not mm:
                raise PPLError(f"bad trendline stage {rest!r}")
            sign, skey, n, col, alias = mm.groups()
            q.stages.append(("trendline", skey, sign == "-", int(n), col,
                             alias or f"{col}_trendline"))
        elif cmd == "lookup":
            mm = re.match(
                r"^([A-Za-z_][A-Za-z0-9_]*)\s+([A-Za-z_][A-Za-z0-9_.]*)"
                r"(?:\s+as\s+([A-Za-z_][A-Za-z0-9_.]*))?$", rest, re.I)
            if not mm:
                raise PPLError(f"bad lookup stage {rest!r}")
            q.stages.append(
                ("lookup", mm.group(1), mm.group(2),
                 mm.group(3) or mm.group(2)))
        elif cmd == "ad":
            kv = _kv_params(rest)
            if "field" not in kv:
                raise PPLError("ad needs field=<value column>")
            q.stages.append((
                "ad", kv["field"], kv.get("time_field", "ts"),
                [c.strip() for c in kv.get("by", "").split(",")
                 if c.strip()],
                float(kv.get("threshold", 3.0))))
        elif cmd == "kmeans":
            kv = _kv_params(rest)
            metric = {"euclidean": "l2", "cosine": "cosine",
                      "l1": "l1"}.get(
                kv.get("distance_type", "EUCLIDEAN").lower())
            if metric is None:
                raise PPLError(
                    "distance_type must be EUCLIDEAN, COSINE or L1")
            q.stages.append((
                "kmeans", int(kv.get("centroids", 2)),
                int(kv.get("iterations", 5)),
                [c.strip() for c in kv.get("fields", "").split(",")
                 if c.strip()], metric))
        elif cmd in ("top", "rare"):
            mm = re.match(r"^(\d+)\s+(.*)$", rest)
            n = int(mm.group(1)) if mm else 10
            body = mm.group(2) if mm else rest
            byi = re.search(r"\bby\b", body, re.I)
            grp = ([c.strip() for c in body[byi.end():].split(",")]
                   if byi else [])
            flds = [c.strip()
                    for c in (body[: byi.start()] if byi else body)
                    .split(",") if c.strip()]
            if not flds:
                raise PPLError(f"{cmd} needs at least one field")
            q.stages.append((cmd, n, flds, grp))
        elif cmd == "parse":
            mm = re.match(
                r"^([A-Za-z_][A-Za-z0-9_.]*)\s+'((?:[^'\\]|\\.)*)'\s+as\s+"
                r"(.+)$", rest, re.I | re.S)
            if not mm:
                raise PPLError(f"bad parse stage {rest!r}")
            names = [c.strip() for c in mm.group(3).split(",")]
            if not all(_IDENT.match(c) for c in names):
                raise PPLError(f"bad parse targets {names}")
            q.stages.append(
                ("parse", mm.group(1), mm.group(2).replace("\\'", "'"),
                 names))
        elif cmd == "grok":
            mm = re.match(
                r"^([A-Za-z_][A-Za-z0-9_.]*)\s+'((?:[^'\\]|\\.)*)'\s*$",
                rest, re.I | re.S)
            if not mm:
                raise PPLError(f"bad grok stage {rest!r}")
            pat, names = grok_to_regex(
                mm.group(2).replace("\\'", "'"))
            if not names:
                raise PPLError(
                    "grok pattern binds no fields -- use %{SYNTAX:name}")
            # desugar onto the parse stage: one regex, group i -> name i
            q.stages.append(("parse", mm.group(1), pat, names))
        elif cmd == "sort":
            keys = []
            for item in rest.split(","):
                item = item.strip()
                desc = item.startswith("-")
                keys.append((item.lstrip("+-").strip(), desc))
            q.stages.append(("sort", keys))
        elif cmd == "head":
            # PPL `head` without a count keeps 10 rows (the upstream
            # default); int('') previously escaped as a raw ValueError
            q.stages.append(("head", int(rest or 10)))
        elif cmd == "tail":
            q.stages.append(("tail", int(rest or 10)))
        elif cmd == "patterns":
            mm = re.match(
                r"^([A-Za-z_][A-Za-z0-9_.]*)"
                r"(?:\s+new_field\s*=\s*([A-Za-z_][A-Za-z0-9_]*))?$",
                rest, re.I)
            if not mm:
                raise PPLError(f"bad patterns stage {rest!r}")
            q.stages.append(("patterns", mm.group(1),
                             mm.group(2) or f"patterns_{mm.group(1)}"))
        elif cmd in ("expand", "flatten"):
            if not _IDENT.match(rest):
                raise PPLError(f"bad {cmd} field {rest!r}")
            q.stages.append((cmd, rest))
        elif cmd == "fieldsummary":
            mm = re.match(r"^includefields\s*=\s*(.+)$", rest, re.I)
            if not mm:
                raise PPLError(f"bad fieldsummary stage {rest!r}")
            cols = [c.strip() for c in mm.group(1).split(",") if c.strip()]
            if not cols or not all(_IDENT.match(c) for c in cols):
                raise PPLError(f"bad fieldsummary fields {cols}")
            q.stages.append(("fieldsummary", cols))
        elif cmd == "join":
            mm = re.match(
                r"^(?:(inner|left)\s+)?([A-Za-z_][A-Za-z0-9_.]*)\s+"
                r"([A-Za-z_][A-Za-z0-9_]*)$", rest, re.I)
            if not mm:
                raise PPLError(f"bad join stage {rest!r}")
            q.stages.append(("join", (mm.group(1) or "inner").lower(),
                             mm.group(2), mm.group(3)))
        else:
            raise PPLError(f"unknown command {cmd!r}")
    return q


# ---------------------------------------------------------------------------
# backends
# ---------------------------------------------------------------------------

_AGG_FN = {
    "count": lambda c: F.count(F.col(c)) if c else F.count("*"),
    "sum": lambda c: F.sum(c),
    "avg": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "distinct_count": lambda c: F.countDistinct(c),
    "stddev_samp": lambda c: F.stddev_samp(c),
    "stddev_pop": lambda c: F.stddev_pop(c),
    "var_samp": lambda c: F.var_samp(c),
    "var_pop": lambda c: F.var_pop(c),
}


def _agg_col(fn: str, col: str):
    """fn may be a plain name or ``percentile:<p>`` (exact
    interpolated percentile -- quantile_cont in the oracle)."""
    if fn.startswith("percentile:"):
        frac = float(fn.split(":", 1)[1]) / 100.0
        return F.expr(f"percentile({col}, {frac!r})")
    return _AGG_FN[fn](col)


def _agg_sql(fn: str, col: str) -> str:
    if fn.startswith("percentile:"):
        frac = float(fn.split(":", 1)[1]) / 100.0
        return f"quantile_cont({col}, {frac!r})"
    if fn == "distinct_count":
        return f"count(DISTINCT {col})"
    if fn == "count" and not col:
        return "count(*)"
    return f"{fn}({col})"


#: stages after which the piped frame is reduced / bounded — safe
#: input for the global-window commands (trendline, kmeans).
_REDUCING_STAGES = frozenset(
    ("stats", "head", "tail", "top", "rare", "fieldsummary"))


def _guard_global_window(df: DataFrame, cmd: str, limit: int | None):
    """``trendline`` / ``kmeans`` run a global (unpartitioned) window
    for deterministic ordering: fine on a reduced pipe, fatal on a raw
    corpus (every row funnels through ONE task at 100x scale). When no
    reducing stage precedes, probe with a bounded
    ``limit(limit+1).count()`` job — it short-circuits after limit+1
    rows, so the probe itself never scans the full corpus — and refuse
    oversized inputs instead of silently single-partitioning them."""
    if limit is None:
        return
    if df.limit(limit + 1).count() > limit:
        raise PPLError(
            f"{cmd} without a preceding reducing stage "
            f"(stats/head/tail/top/rare) over more than {limit} rows "
            "would single-partition the corpus through one task; "
            "reduce the pipe first or raise global_window_limit")


def ppl_query(spark: SparkSession, text: str,
              tables: dict[str, DataFrame],
              global_window_limit: int | None = 100_000) -> DataFrame:
    """Compile and run a PPL pipeline over the given source tables.

    ``global_window_limit`` bounds the input size the global-window
    commands (trendline, kmeans) accept when the pipe has not already
    been reduced by a stats/head/tail/top/rare stage; ``None``
    disables the guard (caller vouches for the input)."""
    q = parse_ppl(text)
    if q.source not in tables:
        raise PPLError(f"unknown source {q.source!r}")
    df = tables[q.source]
    last_sort: list[tuple[str, bool]] | None = None
    reduced = False
    for st in q.stages:
        kind = st[0]
        if kind in ("trendline", "kmeans") and not reduced:
            _guard_global_window(df, kind, global_window_limit)
            # a passed probe bounds the frame for the REST of the
            # pipe too (neither command changes the row count), so a
            # second global-window stage never re-pays the probe job
            reduced = True
        reduced = reduced or kind in _REDUCING_STAGES
        if kind == "where":
            df = df.filter(_to_col(st[1]))
        elif kind == "fields":
            _, drop, cols = st
            df = df.drop(*cols) if drop else df.select(*cols)
        elif kind == "eval":
            df = df.withColumn(st[1], _to_col(st[2]))
        elif kind == "rename":
            for old, new in st[1]:
                df = df.withColumnRenamed(old, new)
        elif kind == "dedup":
            # deterministic: min over non-key cols per key would be
            # column-type dependent; PPL dedup keeps "a" row per key —
            # we keep the key columns only, which IS deterministic
            df = df.select(*st[1]).distinct()
        elif kind == "stats":
            _, aggs, by = st
            exprs = [_agg_col(fn, col).alias(alias)
                     for fn, col, alias in aggs]
            keys = []
            for b in by:
                if isinstance(b, tuple) and b[0] == "span":
                    _, c, secs = b
                    keys.append(
                        F.date_format(
                            F.timestamp_seconds(
                                F.floor(F.unix_timestamp(F.col(c)) / secs)
                                * secs),
                            "yyyy-MM-dd HH:mm:ss",
                        ).alias(f"{c}_span"))
                else:
                    keys.append(F.col(b))
            df = (df.groupBy(*keys).agg(*exprs) if keys
                  else df.agg(*exprs))
        elif kind in ("top", "rare"):
            _, n, flds, grp = st
            cnt = df.groupBy(*(grp + flds)).agg(F.count("*").alias("count"))
            if grp:
                from pyspark.sql import Window

                order = ([F.desc("count")] if kind == "top"
                         else [F.asc("count")]) + [F.asc(c) for c in flds]
                w = Window.partitionBy(*grp).orderBy(*order)
                df = (cnt.withColumn("_rn", F.row_number().over(w))
                      .filter(F.col("_rn") <= n).drop("_rn"))
            else:
                order = ([F.desc("count")] if kind == "top"
                         else [F.asc("count")]) + [F.asc(c) for c in flds]
                df = cnt.orderBy(*order).limit(n)
        elif kind == "parse":
            _, src, pat, names = st
            for i, name in enumerate(names, start=1):
                df = df.withColumn(
                    name, F.regexp_extract(F.col(src), pat, i))
        elif kind == "eventstats":
            from pyspark.sql import Window

            _, aggs, by = st
            w = Window.partitionBy(*by) if by else Window.partitionBy()
            for fn, col, alias in aggs:
                if fn.startswith("percentile:"):
                    raise PPLError(
                        "percentile is a stats agg, not an eventstats "
                        "window function here")
                if fn == "distinct_count":
                    e = F.size(F.collect_set(col).over(w))
                else:
                    e = _AGG_FN[fn](col).over(w)
                df = df.withColumn(alias, e)
        elif kind == "fillnull":
            _, val, cols = st
            for c in cols:
                df = df.withColumn(c, F.coalesce(F.col(c), F.lit(val[1])))
        elif kind == "trendline":
            from pyspark.sql import Window

            _, skey, desc, n, col, alias = st
            order = F.desc(skey) if desc else F.asc(skey)
            w = Window.orderBy(order).rowsBetween(-(n - 1), 0)
            df = df.withColumn(
                alias,
                F.when(F.count(col).over(w) == n, F.avg(col).over(w)),
            )
        elif kind == "lookup":
            _, tname, key, local = st
            if tname not in tables:
                raise PPLError(f"unknown lookup table {tname!r}")
            lkp = tables[tname].withColumnRenamed(key, "__lookup_key")
            df = (
                df.join(F.broadcast(lkp),
                        F.col(local) == F.col("__lookup_key"), "left")
                .drop("__lookup_key")
            )
        elif kind == "ad":
            # the plugin's ml-commons `ad` command appends anomaly
            # columns to the piped rows.  Its RCF forest is a seeded
            # streaming model; the deterministic analog here is the
            # engine's seasonal median/MAD detector
            # (operators/anomaly.py): per-entity hour-of-day
            # baseline, score = |x-med|/(1.4826*MAD), grade 0 below
            # threshold — same response columns (score,
            # anomaly_grade), reproducible across runs.
            from .operators.anomaly import (anomaly_grade,
                                            anomaly_score,
                                            seasonal_mad_baseline)

            _, field, tcol, by, thr = st
            season = "__ad_season"
            df = df.withColumn(
                season, F.date_format(F.col(tcol), "HH"))
            # internal names for the baseline columns so an input
            # med/mad column survives; LEFT join so rows with a NULL
            # time/entity key keep flowing with NULL score (the
            # command APPENDS columns, it never drops rows)
            base_in = df.select(*by, season,
                                F.col(field).alias("__ad_v"))
            base = (seasonal_mad_baseline(base_in, by, season,
                                          "__ad_v")
                    .select(*by, season,
                            F.col("med").alias("__ad_med"),
                            F.col("mad").alias("__ad_mad")))
            df = (df.join(F.broadcast(base), [*by, season], "left")
                  .withColumn("score",
                              anomaly_score(F.col(field),
                                            F.col("__ad_med"),
                                            F.col("__ad_mad")))
                  .withColumn("anomaly_grade",
                              anomaly_grade(F.col("score"), thr))
                  .drop(season, "__ad_med", "__ad_mad"))
        elif kind == "kmeans":
            # ml-commons `kmeans` command: cluster the piped rows on
            # their numeric fields, append ClusterID.  Lloyd training
            # reuses the IVF machinery (operators/similarity.py —
            # deterministic lowest-id init, per-round k×dim centroid
            # collect); final assignment is the broadcast-argmax.
            # distance_type EUCLIDEAN (the plugin default) / COSINE /
            # L1 select the assignment metric.
            from .operators.similarity import ivf_assign, kmeans_fit

            _, k, iters, fields, metric = st
            if not fields:
                fields = [f.name for f in df.schema.fields
                          if f.dataType.typeName() in
                          ("double", "float", "integer", "long")]
            if not fields:
                raise PPLError("kmeans found no numeric fields")
            from pyspark.sql import Window

            # deterministic ids via a global sort window: acceptable
            # for the command's input (a piped, usually reduced,
            # frame — not a raw corpus); vecs persists so the sort
            # and upstream pipeline run ONCE, not once per Lloyd
            # round + assignment (ContextCleaner reclaims the cache)
            rid = F.row_number().over(
                Window.orderBy(*[F.asc(c) for c in fields])) - 1
            in_cols = df.columns
            rowed = df.withColumn("__rid", rid).persist()
            # train/assign on a MINIMAL (__rid, __vec) frame so input
            # column names (e.g. `cell`) can never collide inside
            # the shared IVF machinery
            vecs = rowed.select(
                "__rid", F.array(*[F.col(c).cast("double")
                                   for c in fields]).alias("__vec"))
            cents = kmeans_fit(vecs, k, n_iter=iters,
                               id_col="__rid", vec_col="__vec",
                               metric=metric)
            assign = (ivf_assign(vecs, cents, id_col="__rid",
                                 vec_col="__vec", metric=metric)
                      .withColumnRenamed("cell", "__cluster"))
            df = (rowed.join(assign, "__rid")
                  .select(*[c for c in in_cols if c != "ClusterID"],
                          F.col("__cluster").alias("ClusterID")))
        elif kind == "sort":
            last_sort = st[1]
            df = df.orderBy(*[
                F.desc(c) if d else F.asc(c) for c, d in st[1]])
        elif kind == "head":
            df = df.limit(st[1])
        elif kind == "tail":
            # last-N of the current order: invert the sort (so tail is
            # a TakeOrdered, never a full sort + offset), then restore
            if last_sort is None:
                raise PPLError("tail requires a preceding sort")
            inv = [F.asc(c) if d else F.desc(c) for c, d in last_sort]
            df = df.orderBy(*inv).limit(st[1]).orderBy(*[
                F.desc(c) if d else F.asc(c) for c, d in last_sort])
        elif kind == "patterns":
            _, src, new = st
            df = df.withColumn(
                new, F.regexp_replace(F.col(src), "[a-zA-Z0-9]", ""))
        elif kind == "expand":
            df = df.withColumn(st[1], F.explode(F.col(st[1])))
        elif kind == "flatten":
            df = df.select("*", f"{st[1]}.*").drop(st[1])
        elif kind == "fieldsummary":
            # ONE aggregation job computing every field's profile,
            # then a stack() pivot of the single metadata row -- never
            # N scans for N fields.
            cols = st[1]
            exprs = []
            for c in cols:
                exprs += [
                    F.count(F.col(c)).alias(f"__c_{c}"),
                    F.countDistinct(F.col(c)).alias(f"__d_{c}"),
                    F.min(F.expr(f"try_cast({c} AS DOUBLE)"))
                    .alias(f"__mn_{c}"),
                    F.max(F.expr(f"try_cast({c} AS DOUBLE)"))
                    .alias(f"__mx_{c}"),
                    F.avg(F.expr(f"try_cast({c} AS DOUBLE)"))
                    .alias(f"__av_{c}"),
                    F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .alias(f"__n_{c}"),
                ]
            one = df.agg(*exprs)
            stack = ", ".join(
                f"'{c}', __c_{c}, __d_{c}, __mn_{c}, __mx_{c}, "
                f"__av_{c}, __n_{c}" for c in cols)
            df = one.selectExpr(
                f"stack({len(cols)}, {stack}) AS (field, count, "
                "distinct_count, min, max, avg, nulls)")
        elif kind == "join":
            _, how, key, tname = st
            if tname not in tables:
                raise PPLError(f"unknown join table {tname!r}")
            df = df.join(tables[tname], key, how)
    return df


def ppl_to_sql(text: str) -> str:
    """The same parsed pipeline rendered as nested ANSI SQL (oracle
    backend; also a readable 'explain' of what the pipeline does)."""
    q = parse_ppl(text)
    sql = f"SELECT * FROM {q.source}"
    last_sort: list[tuple[str, bool]] | None = None
    for st in q.stages:
        kind = st[0]
        if kind == "where":
            sql = f"SELECT * FROM ({sql}) WHERE {_to_sql(st[1])}"
        elif kind == "fields":
            _, drop, cols = st
            if drop:
                cl = ", ".join(cols)
                sql = f"SELECT * EXCLUDE ({cl}) FROM ({sql})"
            else:
                sql = f"SELECT {', '.join(cols)} FROM ({sql})"
        elif kind == "eval":
            sql = f"SELECT *, {_to_sql(st[2])} AS {st[1]} FROM ({sql})"
        elif kind == "rename":
            ren = ", ".join(f"{o} AS {n}" for o, n in st[1])
            excl = ", ".join(o for o, _ in st[1])
            sql = f"SELECT * EXCLUDE ({excl}), {ren} FROM ({sql})"
        elif kind == "dedup":
            sql = f"SELECT DISTINCT {', '.join(st[1])} FROM ({sql})"
        elif kind == "stats":
            _, aggs, by = st
            sel = [f'{_agg_sql(fn, col)} AS "{alias}"'
                   for fn, col, alias in aggs]
            keys = []
            for b in by:
                if isinstance(b, tuple) and b[0] == "span":
                    _, c, secs = b
                    keys.append(
                        f"strftime(to_timestamp(floor(epoch({c}) / {secs})"
                        f" * {secs}), '%Y-%m-%d %H:%M:%S') AS {c}_span")
                else:
                    keys.append(b)
            if keys:
                names = [k.rsplit(" AS ", 1)[-1] for k in keys]
                sql = (f"SELECT {', '.join(keys)}, {', '.join(sel)} "
                       f"FROM ({sql}) GROUP BY {', '.join(names)}")
            else:
                sql = f"SELECT {', '.join(sel)} FROM ({sql})"
        elif kind in ("top", "rare"):
            _, n, flds, grp = st
            dir_ = "DESC" if kind == "top" else "ASC"
            tie = ", ".join(f"{c} ASC" for c in flds)
            allc = ", ".join(grp + flds)
            base = (f"SELECT {allc}, count(*) AS count FROM ({sql}) "
                    f"GROUP BY {allc}")
            if grp:
                part = ", ".join(grp)
                sql = (f"SELECT {allc}, count FROM ("
                       f"SELECT *, row_number() OVER (PARTITION BY {part} "
                       f"ORDER BY count {dir_}, {tie}) AS _rn FROM ({base})"
                       f") WHERE _rn <= {n}")
            else:
                sql = (f"SELECT * FROM ({base}) "
                       f"ORDER BY count {dir_}, {tie} LIMIT {n}")
        elif kind == "parse":
            _, src, pat, names = st
            p = pat.replace("'", "''")
            ext = ", ".join(
                f"regexp_extract({src}, '{p}', {i}) AS {name}"
                for i, name in enumerate(names, start=1))
            sql = f"SELECT *, {ext} FROM ({sql})"
        elif kind == "eventstats":
            _, aggs, by = st
            over = f"OVER (PARTITION BY {', '.join(by)})" if by else "OVER ()"
            sel = []
            for fn, col, alias in aggs:
                if fn.startswith("percentile:"):
                    raise PPLError(
                        "percentile is a stats agg, not an eventstats "
                        "window function here")
                if fn == "distinct_count":
                    sel.append(
                        f'len(list_distinct(list({col}) {over}))'
                        f' AS "{alias}"')
                elif fn == "count" and not col:
                    sel.append(f'count(*) {over} AS "{alias}"')
                else:
                    sel.append(f'{fn}({col}) {over} AS "{alias}"')
            sql = f"SELECT *, {', '.join(sel)} FROM ({sql})"
        elif kind == "fillnull":
            _, val, cols = st
            v = _to_sql(val)
            rep = ", ".join(f"coalesce({c}, {v}) AS {c}" for c in cols)
            sql = f"SELECT * REPLACE ({rep}) FROM ({sql})"
        elif kind == "trendline":
            _, skey, desc, n, col, alias = st
            over = (f"OVER (ORDER BY {skey} {'DESC' if desc else 'ASC'} "
                    f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)")
            sql = (f"SELECT *, (CASE WHEN count({col}) {over} = {n} "
                   f"THEN avg({col}) {over} END) AS {alias} FROM ({sql})")
        elif kind == "lookup":
            _, tname, key, local = st
            sql = (f"SELECT l.*, r.* EXCLUDE ({key}) FROM ({sql}) l "
                   f"LEFT JOIN {tname} r ON l.{local} = r.{key}")
        elif kind == "sort":
            last_sort = st[1]
            keys = ", ".join(
                f"{c} {'DESC' if d else 'ASC'}" for c, d in st[1])
            sql = f"SELECT * FROM ({sql}) ORDER BY {keys}"
        elif kind == "head":
            sql = f"SELECT * FROM ({sql}) LIMIT {st[1]}"
        elif kind == "tail":
            if last_sort is None:
                raise PPLError("tail requires a preceding sort")
            inv = ", ".join(
                f"{c} {'ASC' if d else 'DESC'}" for c, d in last_sort)
            orig = ", ".join(
                f"{c} {'DESC' if d else 'ASC'}" for c, d in last_sort)
            sql = (f"SELECT * FROM (SELECT * FROM ({sql}) "
                   f"ORDER BY {inv} LIMIT {st[1]}) ORDER BY {orig}")
        elif kind == "patterns":
            _, src, new = st
            sql = (f"SELECT *, regexp_replace({src}, '[a-zA-Z0-9]', '', "
                   f"'g') AS {new} FROM ({sql})")
        elif kind == "expand":
            sql = (f"SELECT * EXCLUDE ({st[1]}), unnest({st[1]}) "
                   f"AS {st[1]} FROM ({sql})")
        elif kind == "flatten":
            sql = (f"SELECT * EXCLUDE ({st[1]}), unnest({st[1]}) "
                   f"FROM ({sql})")
        elif kind == "fieldsummary":
            parts = [
                (f"SELECT '{c}' AS field, count({c}) AS count, "
                 f"count(DISTINCT {c}) AS distinct_count, "
                 f"min(TRY_CAST({c} AS DOUBLE)) AS min, "
                 f"max(TRY_CAST({c} AS DOUBLE)) AS max, "
                 f"avg(TRY_CAST({c} AS DOUBLE)) AS avg, "
                 f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nulls "
                 f"FROM ({sql})")
                for c in st[1]
            ]
            sql = " UNION ALL ".join(parts)
        elif kind == "join":
            _, how, key, tname = st
            jt = "JOIN" if how == "inner" else "LEFT JOIN"
            sql = (f"SELECT * FROM ({sql}) l {jt} {tname} r "
                   f"USING ({key})")
    return sql
