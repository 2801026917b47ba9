"""OpenSearch SQL plugin (``POST /_plugins/_sql``) subset compiled to
DataFrames.

The SIEM solution's OpenSearch domain ships the SQL/PPL plugin (the
Query Workbench surface in Dashboards); PPL is implemented in
``ppl.py`` — this module adds its SQL sibling.  The supported subset
is the shape an analyst types over a log index:

    SELECT [DISTINCT] expr [AS alias], agg(expr), ...
    FROM <index>
    [WHERE <cond>]          -- incl. relevance functions, see below
    [GROUP BY expr, ...]
    [HAVING <cond>]
    [ORDER BY expr [ASC|DESC], ...]
    [LIMIT n]

Expressions: columns, literals, ``+ - * /``, comparisons
(``= != <> > >= < <=``), ``AND OR NOT``, ``IN (...)``,
``[NOT] LIKE``, ``IS [NOT] NULL``, ``BETWEEN a AND b``, scalar
functions (``lower upper abs length concat coalesce if round``),
aggregates (``count(*) count(x) count(distinct x) sum avg min max``).

Relevance functions (the plugin's fulltext predicates) execute
against a :class:`PostingsIndex` through the SAME boolean-tree
executor every other query surface uses (one postings scan, one
groupBy — ``index/querystring.py:tree_scores``):

    match(field, 'text')          / matchquery / match_query aliases
    match_phrase(field, 'text')   (needs the positional index)
    query_string('lucene syntax') (full querystring.py grammar)

A query with relevance predicates exposes ``_score`` as a column
(usable in SELECT and ORDER BY), exactly like the plugin.  Relevance
predicates may appear under any boolean combination as long as each
top-level AND conjunct is either purely relational or purely
relevance — the natural split between "what the index scores" and
"what the doc columns filter", and the restriction OpenSearch itself
effectively imposes (relevance inside an OR with a relational
predicate would need per-doc score semantics for non-matching docs).

Two backends from ONE parsed statement (the PPL pattern):
:func:`sql_query` compiles to a DataFrame plan (filters/aggregations
stay inside Catalyst — pushdown/pruning/partial agg all apply), and
:func:`sql_to_duckdb` re-emits relational statements as ANSI SQL for
the DuckDB oracle.  Relevance queries are instead pinned against the
(driver-gated) query executor and hand-written BM25 oracles in the
registry entry.

Grammar reference: public OpenSearch SQL documentation
(https://opensearch.org/docs/latest/search-plugins/sql/sql/index/).
Reference repo context: the deployed domain's plugin surface; the
dashboards query via DQL/querystring, runbooks via PPL/SQL.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .ppl import PPLError, _IDENT, _NUM, _round_digits, _tokenize

_RELEV_FNS = {"match", "matchquery", "match_query", "match_phrase",
              "query_string"}
_SCALAR_FNS = {"lower", "upper", "abs", "length", "concat", "coalesce",
               "if", "round"}
_AGG_FNS = {"count", "sum", "avg", "min", "max"}


class SQLError(PPLError):
    pass


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

_CLAUSE_KW = {"from", "where", "group", "having", "order", "limit", ","}


@dataclass
class SqlStmt:
    items: list            # [(ast, alias|None)] or [('star',)] marker
    table: str = ""
    distinct: bool = False
    where: tuple | None = None
    group_by: list = field(default_factory=list)
    having: tuple | None = None
    order_by: list = field(default_factory=list)  # [(ast, desc)]
    limit: int | None = None


class _P:
    """Recursive-descent parser over ppl._tokenize tokens.

    AST nodes reuse the PPL tuple shapes (num/str/col/bin/not/in/
    like/fn) plus: ('star',), ('agg', fn, arg|None, distinct),
    ('relev', kind, [args...]), ('isnull', x, negated),
    ('between', x, lo, hi), ('notlike', x, pat).
    """

    def __init__(self, toks: list[str]):
        self.toks = toks
        self.pos = 0

    def peek(self, ahead: int = 0) -> str | None:
        i = self.pos + ahead
        return self.toks[i] if i < len(self.toks) else None

    def kw(self, ahead: int = 0) -> str:
        t = self.peek(ahead)
        return t.lower() if t is not None else ""

    def take(self, expect: str | None = None) -> str:
        t = self.peek()
        if t is None or (expect is not None and t.lower() != expect):
            raise SQLError(f"expected {expect!r}, got {t!r}")
        self.pos += 1
        return t

    # -- expressions (precedence: or < and < not < cmp < add < mul) --
    def expr(self):
        return self._or()

    def _or(self):
        n = self._and()
        while self.kw() == "or":
            self.take()
            n = ("bin", "or", n, self._and())
        return n

    def _and(self):
        n = self._not()
        while self.kw() == "and":
            self.take()
            n = ("bin", "and", n, self._not())
        return n

    def _not(self):
        if self.kw() == "not":
            self.take()
            return ("not", self._not())
        return self._cmp()

    def _cmp(self):
        n = self._add()
        t = self.kw()
        if t in (">=", "<=", "!=", "=", ">", "<"):
            return ("bin", self.take(), n, self._add())
        if t == "<>":
            self.take()
            return ("bin", "!=", n, self._add())
        if t == "is":
            self.take()
            neg = False
            if self.kw() == "not":
                self.take()
                neg = True
            self.take("null")
            return ("isnull", n, neg)
        if t == "between":
            self.take()
            lo = self._add()
            self.take("and")
            return ("between", n, lo, self._add())
        if t == "in":
            self.take()
            self.take("(")
            items = [self._add()]
            while self.peek() == ",":
                self.take()
                items.append(self._add())
            self.take(")")
            for x in items:
                if x[0] not in ("num", "str"):
                    # Column.isin takes VALUES: a column ref here would
                    # silently become a string literal on the DataFrame
                    # side while the oracle referenced the column
                    raise SQLError("IN (...) takes literal values only")
            return ("in", n, items)
        if t == "like" or (t == "not" and self.kw(1) == "like"):
            neg = t == "not"
            if neg:
                self.take()
            self.take("like")
            pat = self._add()
            if pat[0] != "str":
                raise SQLError("LIKE needs a string pattern")
            return ("notlike", n, pat[1]) if neg else ("like", n, pat[1])
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
            raise SQLError("unexpected end of expression")
        if t == "(":
            self.take()
            n = self.expr()
            self.take(")")
            return n
        if t == "-":                     # unary minus on a literal
            self.take()
            n = self._atom()
            if n[0] == "num":
                return ("num", -n[1])
            return ("bin", "-", ("num", 0), n)
        self.take()
        if t.startswith("'"):
            return ("str", t[1:-1].replace("\\'", "'"))
        if _NUM.match(t):
            return ("num", float(t) if "." in t else int(t))
        if not _IDENT.match(t):
            raise SQLError(f"bad atom {t!r}")
        low = t.lower()
        if self.peek() != "(":
            return ("col", t)
        self.take("(")
        if low in _AGG_FNS:
            distinct = False
            if self.kw() == "distinct":
                self.take()
                distinct = True
            if self.peek() == "*":
                if low != "count":
                    raise SQLError(f"{low}(*) is not valid")
                self.take()
                arg = None
            else:
                arg = self.expr()
            self.take(")")
            return ("agg", low, arg, distinct)
        if low in _RELEV_FNS:
            args = [self.expr()]
            while self.peek() == ",":
                self.take()
                args.append(self.expr())
            self.take(")")
            return self._relev(low, args)
        if low in _SCALAR_FNS:
            args = [self.expr()]
            while self.peek() == ",":
                self.take()
                args.append(self.expr())
            self.take(")")
            return ("fn", low, args)
        raise SQLError(f"unknown function {t!r}")

    @staticmethod
    def _relev(kind: str, args: list):
        if kind in ("matchquery", "match_query"):
            kind = "match"
        if kind == "query_string":
            if len(args) != 1 or args[0][0] != "str":
                raise SQLError("query_string('...') takes one string")
            return ("relev", "query_string", None, args[0][1])
        if len(args) != 2 or args[0][0] != "col" or args[1][0] != "str":
            raise SQLError(f"{kind}(field, 'text') expected")
        return ("relev", kind, args[0][1], args[1][1])

    # -- statement --
    def statement(self) -> SqlStmt:
        self.take("select")
        st = SqlStmt(items=[])
        if self.kw() == "distinct":
            self.take()
            st.distinct = True
        while True:
            if self.peek() == "*" and self.kw(1) in ("from", ","):
                self.take()
                st.items.append((("star",), None))
            else:
                e = self.expr()
                alias = None
                if self.kw() == "as":
                    self.take()
                    alias = self.take()
                elif (self.peek() is not None and _IDENT.match(self.peek())
                      and self.kw() not in _CLAUSE_KW):
                    alias = self.take()
                st.items.append((e, alias))
            if self.peek() == ",":
                self.take()
                continue
            break
        self.take("from")
        st.table = self.take()
        if self.kw() == "where":
            self.take()
            st.where = self.expr()
        if self.kw() == "group":
            self.take()
            self.take("by")
            st.group_by.append(self.expr())
            while self.peek() == ",":
                self.take()
                st.group_by.append(self.expr())
        if self.kw() == "having":
            self.take()
            st.having = self.expr()
        if self.kw() == "order":
            self.take()
            self.take("by")
            while True:
                e = self.expr()
                desc = False
                if self.kw() in ("asc", "desc"):
                    desc = self.take().lower() == "desc"
                st.order_by.append((e, desc))
                if self.peek() == ",":
                    self.take()
                    continue
                break
        if self.kw() == "limit":
            self.take()
            st.limit = int(self.take())
        if self.peek() is not None:
            raise SQLError(f"trailing input: {self.toks[self.pos:]}")
        return st


def parse_sql(sql: str) -> SqlStmt:
    # ppl's tokenizer has no '<>' token; normalize it (never inside a
    # quoted string in this grammar's practical use — and a literal
    # '<>' in a LIKE pattern is untouched because the tokenizer takes
    # quoted strings atomically only when they parse as one token,
    # which '<>' outside quotes never is)
    toks = _tokenize(sql)
    out = []
    i = 0
    while i < len(toks):
        if toks[i] == "<" and i + 1 < len(toks) and toks[i + 1] == ">":
            out.append("!=")
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return _P(out).statement()


# ---------------------------------------------------------------------------
# AST helpers
# ---------------------------------------------------------------------------

def _has_kind(n, kind: str) -> bool:
    if not isinstance(n, tuple):
        return False
    if n[0] == kind:
        return True
    for c in n[1:]:
        if isinstance(c, tuple) and _has_kind(c, kind):
            return True
        if isinstance(c, list) and any(
                isinstance(x, tuple) and _has_kind(x, kind) for x in c):
            return True
    return False


def _conjuncts(n) -> list:
    if isinstance(n, tuple) and n[0] == "bin" and n[1] == "and":
        return _conjuncts(n[2]) + _conjuncts(n[3])
    return [n]


def _relev_only(n) -> bool:
    """True iff the subtree is built from relevance leaves and
    boolean operators alone (compilable to a _search bool body)."""
    k = n[0]
    if k == "relev":
        return True
    if k == "not":
        return _relev_only(n[1])
    if k == "bin" and n[1] in ("and", "or"):
        return _relev_only(n[2]) and _relev_only(n[3])
    return False


def _relev_to_body(n) -> dict:
    """Relevance subtree -> _search query spec dict."""
    k = n[0]
    if k == "relev":
        _, kind, fld, text = n
        if kind == "query_string":
            return {"query_string": {"query": text}}
        return {kind: {fld: text}}
    if k == "not":
        return {"bool": {"must_not": [_relev_to_body(n[1])]}}
    op = n[1]
    l, r = _relev_to_body(n[2]), _relev_to_body(n[3])
    if op == "and":
        return {"bool": {"must": [l, r]}}
    return {"bool": {"should": [l, r], "minimum_should_match": 1}}


# ---------------------------------------------------------------------------
# DataFrame backend
# ---------------------------------------------------------------------------

def _to_col(n) -> Column:
    kind = n[0]
    if kind in ("num", "str"):
        return F.lit(n[1])
    if kind == "col":
        return F.col(n[1])
    if kind == "not":
        return ~_to_col(n[1])
    if kind == "isnull":
        c = _to_col(n[1])
        return c.isNotNull() if n[2] else c.isNull()
    if kind == "between":
        c = _to_col(n[1])
        return (c >= _to_col(n[2])) & (c <= _to_col(n[3]))
    if kind == "in":
        return _to_col(n[1]).isin([x[1] for x in n[2]])
    if kind == "like":
        return _to_col(n[1]).like(n[2])
    if kind == "notlike":
        return ~_to_col(n[1]).like(n[2])
    if kind == "fn":
        args = [_to_col(a) for a in n[2]]
        fn = n[1]
        if fn == "if":
            return F.when(args[0], args[1]).otherwise(args[2])
        if fn == "round":
            # shared PPL validation: optional digits default 0, must
            # be an integer literal (was a raw IndexError on round(x))
            return F.round(args[0], _round_digits(n))
        if fn == "concat":
            return F.concat(*args)
        if fn == "coalesce":
            return F.coalesce(*args)
        return {"lower": F.lower, "upper": F.upper, "abs": F.abs,
                "length": F.length}[fn](args[0])
    if kind == "relev":
        raise SQLError(
            "relevance predicate in an unsupported position (must be "
            "a purely-relevance top-level AND conjunct of WHERE)")
    if kind == "agg":
        raise SQLError("aggregate in a non-aggregate position")
    op, l, r = n[1], _to_col(n[2]), _to_col(n[3])
    return {
        "or": l | r, "and": l & r, "=": l == r, "!=": l != r,
        ">": l > r, ">=": l >= r, "<": l < r, "<=": l <= r,
        "+": l + r, "-": l - r, "*": l * r, "/": l / r,
    }[op]


def _agg_col(n) -> Column:
    _, fn, arg, distinct = n
    if arg is None:
        return F.count("*")
    c = _to_col(arg)
    if distinct:
        if fn != "count":
            raise SQLError("DISTINCT only with count()")
        return F.countDistinct(c)
    return {"count": F.count, "sum": F.sum, "avg": F.avg,
            "min": F.min, "max": F.max}[fn](c)


def _expr_name(n, alias: str | None) -> str:
    if alias:
        return alias
    if n[0] == "col":
        return n[1]
    return _ast_sql(n)


def sql_query(
    spark: SparkSession,
    sql: str,
    tables: dict[str, DataFrame],
    ix=None,
    positional_ix=None,
    text_field: str = "text",
) -> DataFrame:
    """Execute an OpenSearch-SQL statement.

    ``tables`` maps FROM names to DataFrames (the doc-column /
    relational surface).  When the WHERE clause carries relevance
    functions, ``ix`` (a :class:`PostingsIndex`) must be given: the
    relevance conjuncts compile into ONE ``_search`` bool body
    executed through ``tree_scores`` (single postings scan + single
    groupBy), the matched (doc_id, score) frame joins the FROM table
    on ``doc_id``, and ``_score`` becomes a regular column for the
    relational remainder — filters, grouping and ordering all stay
    native Catalyst expressions.
    """
    st = parse_sql(sql)
    if st.table not in tables:
        raise SQLError(f"unknown table {st.table!r}")
    df = tables[st.table]

    # -- WHERE: split relevance vs relational conjuncts --
    relational: list = []
    relev_bodies: list[dict] = []
    if st.where is not None:
        for c in _conjuncts(st.where):
            if _has_kind(c, "relev"):
                if not _relev_only(c):
                    raise SQLError(
                        "a WHERE conjunct mixes relevance and "
                        "relational predicates; split them with AND")
                relev_bodies.append(_relev_to_body(c))
            else:
                relational.append(c)

    if relev_bodies:
        if ix is None:
            raise SQLError("relevance functions need a PostingsIndex")
        from .index.querystring import tree_scores
        from .index.searchbody import compile_query

        body = (relev_bodies[0] if len(relev_bodies) == 1
                else {"bool": {"must": relev_bodies}})
        tree = compile_query(body, text_field)
        scored = tree_scores(ix, tree, positional_ix=positional_ix)
        if scored is None:
            raise SQLError("empty relevance query")
        scored = scored.withColumnRenamed("score", "_score")
        # join on doc_id: the FROM table is the relational doc surface
        df = df.join(scored, "doc_id")

    for c in relational:
        df = df.filter(_to_col(c))

    # -- SELECT / GROUP BY --
    has_agg = any(_has_kind(e, "agg") for e, _ in st.items) or bool(
        st.group_by) or (st.having is not None
                         and _has_kind(st.having, "agg"))
    if has_agg:
        if any(e[0] == "star" for e, _ in st.items):
            raise SQLError("SELECT * with GROUP BY is not supported")
        key_cols = []
        key_names = []
        for i, g in enumerate(st.group_by):
            # a GROUP BY item that textually matches a select item
            # keeps that item's alias
            name = None
            for e, alias in st.items:
                if e == g:
                    name = _expr_name(e, alias)
                    break
            name = name or (_expr_name(g, None))
            key_cols.append(_to_col(g).alias(name))
            key_names.append(name)

        agg_exprs = []
        out_cols = []
        hidden = 0
        for e, alias in st.items:
            name = _expr_name(e, alias)
            if e in st.group_by:
                out_cols.append(F.col(name))
            elif e[0] == "agg":
                agg_exprs.append(_agg_col(e).alias(name))
                out_cols.append(F.col(name))
            elif _has_kind(e, "agg"):
                # expression OVER aggregates: compute the aggs hidden,
                # then the scalar expression over them
                def lift(n):
                    nonlocal hidden
                    if n[0] == "agg":
                        h = f"__a{hidden}"
                        hidden += 1
                        agg_exprs.append(_agg_col(n).alias(h))
                        return ("col", h)
                    if n[0] in ("num", "str", "col"):
                        return n
                    if n[0] == "fn":
                        return ("fn", n[1], [lift(a) for a in n[2]])
                    if n[0] == "bin":
                        return ("bin", n[1], lift(n[2]), lift(n[3]))
                    raise SQLError(f"unsupported agg expression {n[0]}")
                out_cols.append(_to_col(lift(e)).alias(name))
            else:
                raise SQLError(
                    f"non-aggregate select item {name!r} missing "
                    "from GROUP BY")
        having_pred = None
        if st.having is not None:
            def lift_h(n):
                nonlocal hidden
                if isinstance(n, tuple) and n[0] == "agg":
                    h = f"__h{hidden}"
                    hidden += 1
                    agg_exprs.append(_agg_col(n).alias(h))
                    return ("col", h)
                if isinstance(n, tuple):
                    return tuple(
                        lift_h(c) if isinstance(c, tuple)
                        else ([lift_h(x) for x in c]
                              if isinstance(c, list) else c)
                        for c in n)
                return n
            having_pred = lift_h(st.having)
        grouped = (df.groupBy(*key_cols) if key_cols else df.groupBy())
        df = grouped.agg(*agg_exprs)
        if having_pred is not None:
            df = df.filter(_to_col(having_pred))
        df = df.select(*out_cols)
    else:
        if any(e[0] == "star" for e, _ in st.items):
            pass  # keep all columns
        else:
            df = df.select(*[
                _to_col(e).alias(_expr_name(e, alias))
                for e, alias in st.items])

    if st.distinct:
        df = df.dropDuplicates()
    if st.order_by:
        df = df.orderBy(*[
            _to_col(e).desc() if desc else _to_col(e).asc()
            for e, desc in st.order_by])
    if st.limit is not None:
        df = df.limit(st.limit)
    return df


# ---------------------------------------------------------------------------
# SQL (oracle) backend
# ---------------------------------------------------------------------------

def _ast_sql(n) -> str:
    kind = n[0]
    if kind == "num":
        return repr(n[1])
    if kind == "str":
        return "'" + n[1].replace("'", "''") + "'"
    if kind == "col":
        return n[1]
    if kind == "star":
        return "*"
    if kind == "not":
        return f"(NOT {_ast_sql(n[1])})"
    if kind == "isnull":
        return (f"({_ast_sql(n[1])} IS "
                + ("NOT NULL)" if n[2] else "NULL)"))
    if kind == "between":
        return (f"({_ast_sql(n[1])} BETWEEN {_ast_sql(n[2])} "
                f"AND {_ast_sql(n[3])})")
    if kind == "in":
        return (f"({_ast_sql(n[1])} IN ("
                + ", ".join(_ast_sql(x) for x in n[2]) + "))")
    if kind == "like":
        return f"({_ast_sql(n[1])} LIKE '" + n[2].replace("'", "''") + "')"
    if kind == "notlike":
        return (f"({_ast_sql(n[1])} NOT LIKE '"
                + n[2].replace("'", "''") + "')")
    if kind == "fn":
        if n[1] == "if":
            a, b, c = (_ast_sql(x) for x in n[2])
            return f"(CASE WHEN {a} THEN {b} ELSE {c} END)"
        args = ", ".join(_ast_sql(a) for a in n[2])
        return f"{n[1]}({args})"
    if kind == "agg":
        _, fn, arg, distinct = n
        if arg is None:
            return "count(*)"
        inner = ("DISTINCT " if distinct else "") + _ast_sql(arg)
        return f"{fn}({inner})"
    if kind == "relev":
        raise SQLError("relevance functions have no ANSI-SQL oracle "
                       "form; pin them against the query executor")
    op = {"=": "=", "and": "AND", "or": "OR"}.get(n[1], n[1].upper())
    return f"({_ast_sql(n[2])} {op} {_ast_sql(n[3])})"


def sql_to_duckdb(sql: str) -> str:
    """Re-emit a RELATIONAL statement as ANSI SQL (the DuckDB oracle
    backend).  Raises on relevance functions."""
    st = parse_sql(sql)
    items = ", ".join(
        _ast_sql(e) + (f" AS {a}" if a else "")
        for e, a in st.items)
    out = "SELECT " + ("DISTINCT " if st.distinct else "") + items
    out += f" FROM {st.table}"
    if st.where is not None:
        out += f" WHERE {_ast_sql(st.where)}"
    if st.group_by:
        out += " GROUP BY " + ", ".join(_ast_sql(g) for g in st.group_by)
    if st.having is not None:
        out += f" HAVING {_ast_sql(st.having)}"
    if st.order_by:
        out += " ORDER BY " + ", ".join(
            _ast_sql(e) + (" DESC" if d else " ASC")
            for e, d in st.order_by)
    if st.limit is not None:
        out += f" LIMIT {st.limit}"
    return out
