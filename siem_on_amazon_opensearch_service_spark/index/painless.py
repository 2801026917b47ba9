r"""Restricted Painless-expression compiler for ``script_score`` /
``scripted_metric`` scripts.

Reference semantics target: the OpenSearch script surfaces the
dashboards actually use — ``script_score.script.source`` arithmetic
over ``_score`` and ``doc['field'].value``, and the canonical
``scripted_metric`` map/reduce sums (the documented profit example).
The reference repo ships these through OpenSearch verbatim (e.g. the
saved-objects' scripted fields); here the script must become a native
Column so the scoring scan stays whole-stage codegen.

Scope — deliberately a SUBSET, rejected loudly outside it:

* arithmetic ``+ - * / %``, unary ``-``, parentheses;
* comparisons ``> >= < <= == !=`` and boolean ``&& || !`` (the
  filter-context ``script`` query and ``bucket_selector`` scripts);
* numeric literals (int / float);
* ``_score`` (bound by the caller to the child query's score);
* ``doc['field'].value`` / ``doc["field"].value`` / bare
  identifiers → docs columns (cast to double);
* ``Math.log / log10 / sqrt / abs / exp / max / min / pow``;
* the script_score helpers ``saturation(x, pivot)`` and
  ``sigmoid(x, pivot, exponent)``.

Anything else (loops, assignments, method calls, strings) raises
``ValueError`` — at 100 TB a general interpreter would be a
row-at-a-time Python UDF, exactly the slow path this engine bans;
the subset compiles to ONE native expression instead.

Two backends compile from the same AST: ``to_column`` (Spark) and
``to_sql`` (DuckDB, for the oracle gate) — the cross-engine twin
convention used across this repo.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["parse_script", "to_column", "to_sql", "script_columns"]

_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<doc>doc\[\s*['\"](?P<docfield>[A-Za-z0-9_.]+)['\"]\s*\]\s*"
    r"\.\s*value)"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<op>>=|<=|==|!=|&&|\|\||[-+*/%(),><!]))"
)

_MATH1 = {"Math.log": "ln", "Math.log10": "log10", "Math.sqrt": "sqrt",
          "Math.abs": "abs", "Math.exp": "exp"}
_MATH2 = {"Math.max": "greatest", "Math.min": "least", "Math.pow": "pow"}


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m or m.end() == i:
            rest = src[i:].strip()
            if not rest:
                break
            raise ValueError(f"unsupported script syntax at: {rest[:40]!r}")
        if m.group("num") is not None:
            out.append(("num", m.group("num")))
        elif m.group("doc") is not None:
            out.append(("field", m.group("docfield")))
        elif m.group("name") is not None:
            out.append(("name", m.group("name")))
        else:
            out.append(("op", m.group("op")))
        i = m.end()
    return out


class _Parser:
    """bool := cmp (('&&'|'||') cmp)* ;
    cmp := expr (('>'|'>='|'<'|'<='|'=='|'!=') expr)? ;
    expr := term (('+'|'-') term)* ; term := unary (('*'|'/'|'%')
    unary)* ; unary := '-' unary | '!' unary | atom ; atom := num |
    '(' bool ')' | fn '(' args ')' | field-ref | name."""

    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self):
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of script")
        self.i += 1
        return t

    def expect(self, op: str) -> None:
        t = self.take()
        if t != ("op", op):
            raise ValueError(f"expected {op!r}, got {t!r}")

    def parse(self):
        node = self.boolexpr()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens: {self.toks[self.i:]!r}")
        return node

    def boolexpr(self):
        node = self.cmp()
        while self.peek() in (("op", "&&"), ("op", "||")):
            op = self.take()[1]
            node = ("bool", op, node, self.cmp())
        return node

    def cmp(self):
        node = self.expr()
        if self.peek() in (("op", ">"), ("op", ">="), ("op", "<"),
                           ("op", "<="), ("op", "=="), ("op", "!=")):
            op = self.take()[1]
            node = ("cmp", op, node, self.expr())
        return node

    def expr(self):
        node = self.term()
        while self.peek() in (("op", "+"), ("op", "-")):
            op = self.take()[1]
            node = ("bin", op, node, self.term())
        return node

    def term(self):
        node = self.unary()
        while self.peek() in (("op", "*"), ("op", "/"), ("op", "%")):
            op = self.take()[1]
            node = ("bin", op, node, self.unary())
        return node

    def unary(self):
        if self.peek() == ("op", "-"):
            self.take()
            return ("neg", self.unary())
        if self.peek() == ("op", "!"):
            self.take()
            return ("not", self.unary())
        return self.atom()

    def args(self, n: int) -> list:
        self.expect("(")
        out = [self.expr()]
        while len(out) < n:
            self.expect(",")
            out.append(self.expr())
        self.expect(")")
        return out

    def atom(self):
        kind, val = self.take()
        if kind == "num":
            return ("num", float(val))
        if kind == "field":
            return ("field", val)
        if kind == "op" and val == "(":
            node = self.boolexpr()
            self.expect(")")
            return node
        if kind == "name":
            if val in _MATH1:
                return ("call1", _MATH1[val], self.args(1)[0])
            if val in _MATH2:
                a, b = self.args(2)
                return ("call2", _MATH2[val], a, b)
            if val == "saturation":
                x, p = self.args(2)
                return ("bin", "/", x, ("bin", "+", x, p))
            if val == "sigmoid":
                x, p, e = self.args(3)
                xp = ("call2", "pow", x, e)
                return ("bin", "/", xp,
                        ("bin", "+", xp, ("call2", "pow", p, e)))
            if val.startswith("params."):
                # bucket_script/bucket_selector variables: the caller
                # binds params.<var> via the env
                return ("field", val)
            if "." in val:
                raise ValueError(f"unsupported call/ref {val!r}")
            return ("field", val)      # _score or a bare column name
        raise ValueError(f"unexpected token {(kind, val)!r}")


def parse_script(source: str):
    """Parse a restricted-Painless source string into the tiny AST."""
    return _Parser(_tokenize(source)).parse()


def script_columns(node) -> set[str]:
    """Every field (and ``_score``) reference in the script."""
    kind = node[0]
    if kind == "field":
        return {node[1]}
    if kind == "num":
        return set()
    if kind in ("neg", "not"):
        return script_columns(node[1])
    if kind == "call1":
        return script_columns(node[2])
    return script_columns(node[2]) | script_columns(node[3])


def to_column(node, env: dict[str, Column] | None = None) -> Column:
    """Compile to one native Spark Column.  ``env`` binds names
    (``_score`` in script_score; per-doc aliases in scripted_metric);
    unbound names resolve as docs columns cast to double."""
    env = env or {}
    kind = node[0]
    if kind == "num":
        return F.lit(node[1])
    if kind == "field":
        if node[1] in env:
            return env[node[1]]
        if node[1].startswith("params."):
            raise ValueError(f"unbound script variable {node[1]!r}")
        return F.col(node[1]).cast("double")
    if kind == "neg":
        return -to_column(node[1], env)
    if kind == "not":
        return ~to_column(node[1], env)
    if kind == "call1":
        _, fn, a = node
        return getattr(F, {"ln": "log"}.get(fn, fn))(to_column(a, env))
    if kind == "call2":
        _, fn, a, b = node
        return getattr(F, fn)(to_column(a, env), to_column(b, env))
    _, op, a, b = node
    ca, cb = to_column(a, env), to_column(b, env)
    if kind == "cmp":
        return {">": ca > cb, ">=": ca >= cb, "<": ca < cb,
                "<=": ca <= cb, "==": ca == cb, "!=": ca != cb}[op]
    if kind == "bool":
        return (ca & cb) if op == "&&" else (ca | cb)
    return {"+": ca + cb, "-": ca - cb, "*": ca * cb,
            "/": ca / cb, "%": ca % cb}[op]


def to_sql(node, env: dict[str, str] | None = None) -> str:
    """Emit the same expression as ANSI SQL for the DuckDB oracle."""
    env = env or {}
    kind = node[0]
    if kind == "num":
        return repr(node[1])
    if kind == "field":
        if node[1] in env:
            return f"({env[node[1]]})"
        if node[1].startswith("params."):
            raise ValueError(f"unbound script variable {node[1]!r}")
        return f'CAST("{node[1]}" AS DOUBLE)'
    if kind == "neg":
        return f"(-{to_sql(node[1], env)})"
    if kind == "not":
        return f"(NOT {to_sql(node[1], env)})"
    if kind == "call1":
        _, fn, a = node
        return f"{fn}({to_sql(a, env)})"
    if kind == "call2":
        _, fn, a, b = node
        return f"{fn}({to_sql(a, env)}, {to_sql(b, env)})"
    _, op, a, b = node
    sql_op = {"&&": "AND", "||": "OR", "==": "=",
              "!=": "<>"}.get(op, op)
    return f"({to_sql(a, env)} {sql_op} {to_sql(b, env)})"
