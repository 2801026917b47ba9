r"""query_string parser + executor -- the DSL the reference's
dashboards actually speak.

Every saved search / visualization in the reference ships a Lucene
``query_string`` (reference saved_objects/each-dashboard/*.ndjson).
The real workload shapes, verbatim from cloudtrail.ndjson's query
fields, are::

    eventName:(AuthorizeSecurityGroupIngress OR RevokeSecurityGroupEgress)
    eventSource:kms.amazonaws.com AND eventName:(DisableKey OR PutKeyPolicy)
    eventSource:s3.amazonaws.com AND (eventName:(PutBucketAcl OR ...))
    userIdentity.type:Root AND NOT userIdentity.invokedBy:* AND NOT
        eventType:AwsServiceEvent
    errorCode:*UnauthorizedOperation OR errorCode:AccessDenied*
    responseElements.ConsoleLogin:Failure

so the grammar implemented here is the classic-parser subset those
use, plus the scoring primitives::

    term            bare term            -> should clause (default OR)
    +term           required             -> must clause
    -x, NOT x, !x   excluded             -> must_not clause
    term^2.5        per-clause boost
    "a b c"         exact phrase         -> phrase clause (positional ix)
    pre*            prefix               -> constant-score clause
    *mid*, te?m     wildcard anywhere    -> constant-score clause
    term~ / term~2  fuzzy                -> dictionary-expansion clause
    field:value     keyword filter       -> non-scoring filter context
    field:val*ue    wildcard filter value (leading/trailing/infix)
    field:*         existence check      (NOT field:* = missing)
    field:(A OR B)  grouped value list   -> OR of filter values
    field:[a TO b]  inclusive range      ({a TO b} exclusive)
    field:>10       one-sided range shorthand (>= <= > <)
    _exists_:field  reserved-field existence (== field:*)
    \X              backslash-escape: literal special char
                    (field\:name, val\*ue, \+term, ...)
    ( ... )         boolean grouping, arbitrarily nested
    AND / &&        upgrades adjacent items to must
    OR / ||         explicit default (no-op under default OR; demotes
                    adjacent required items under default_operator=AND)

Parsing happens ON THE DRIVER at plan time (strings are metadata) and
yields a boolean tree of Lucene-style groups: each group carries
(occur, child) clauses; a document matches a group when all ``must``
children match, no ``must_not`` child matches, and -- when the group
has no must children -- at least one ``should`` child matches. A
group with ONLY must_not children falls back to match_all minus the
exclusions (the OpenSearch query_string behavior).

Execution compiles the tree into ONE DataFrame DAG:

* every scoring (posting-backed) leaf contributes
  ``(doc_id, leaf, contrib)`` rows -- plain term leaves share a
  SINGLE decode pass with per-leaf weights folded into a literal map;
* one ``groupBy(doc_id)`` collects the per-doc hit array; per-leaf
  match/score lookups are native array expressions over it
  (``exists`` / ``filter`` + ``aggregate``) -- NO join per clause and
  NO broadcast of exclusion sets: a ``-the``-style stopword exclusion
  is just more rows through the same single shuffle, so the plan
  shape is corpus-size-independent (the round-2 forced-broadcast
  scale flag is gone by construction);
* field leaves evaluate as native predicates on the docs side-table,
  joined once iff any field is referenced;
* the boolean tree itself becomes one native boolean/arith expression
  (whole-stage codegen), and the top-k cut is TakeOrderedAndProject.

Scoring follows Lucene: a doc's score is the sum of its matching
scoring clauses' contributions, gated through the boolean tree (a
non-matching sub-group contributes nothing, exactly like a
non-matching BooleanQuery scorer); field filters are filter-context
(contribute 0). A query with no scoring leaf at all is constant-score
1.0, the bool.filter shape.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field as dc_field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..analysis import tokenize_py
from ..bm25 import B, K1, idf as _idf
from .build import PostingsIndex
from .query import decode_blocks

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class TermLeaf:
    """A posting-backed scoring leaf."""

    kind: str               # term | phrase | phrase_prefix | prefix
    #                       # | wildcard | regexp | fuzzy
    text: str
    boost: float = 1.0
    max_edits: int = 1
    slop: int = 0           # phrase only: "a b"~N proximity
    leaf_id: int = -1       # assigned at compile time


@dataclass
class FieldLeaf:
    """A docs-column predicate leaf (non-scoring filter context).

    op: exact | wildcard | exists | range | in | terms_set | script

    ``terms_set`` is the OpenSearch multi-valued-keyword match: the
    doc's ARRAY column must share at least ``msm_field``-many (a
    per-doc numeric column) — or ``msm_const``-many — elements with
    ``values``.

    ``script`` is the filter-context script query: ``value`` holds a
    restricted-Painless boolean source (painless.py) compiled to one
    native predicate over docs columns; ``field`` is unused.
    """

    field: str
    op: str
    value: str = ""
    lo: str | None = None
    hi: str | None = None
    lo_incl: bool = True
    hi_incl: bool = True
    values: tuple = ()       # op in ("in", "terms_set")
    msm_field: str | None = None   # terms_set only
    msm_const: int | None = None   # terms_set only


@dataclass
class Group:
    """One Lucene BooleanQuery level: (occur, child) clauses.

    occur: must | should | must_not | filter ("filter" is the
    search-body bool.filter context: required for a match, excluded
    from the score -- the query_string parser itself never emits it).

    ``minimum_should_match``: None keeps the Lucene default (>=1
    should required iff there is no must/filter clause); an int n
    requires at least n should clauses to match regardless.
    """

    clauses: list[tuple[str, object]] = dc_field(default_factory=list)
    minimum_should_match: int | None = None
    boost: float = 1.0


@dataclass
class DisMax:
    """Lucene DisjunctionMaxQuery: matches when any child matches;
    scores max(child) + tie_breaker * (sum(child) - max(child))."""

    children: list = dc_field(default_factory=list)
    tie_breaker: float = 0.0


@dataclass
class ConstScore:
    """constant_score wrapper: child gates, score is the boost."""

    child: object = None
    boost: float = 1.0


@dataclass
class Boosting:
    """boosting query: positive scores normally; a matching negative
    multiplies the score by negative_boost (never excludes)."""

    positive: object = None
    negative: object = None
    negative_boost: float = 0.5


@dataclass
class FuncScore:
    """function_score query: the child gates matching; the score is
    ``boost_mode(child_score, score_mode(applicable function values))``.

    ``functions``: list of dicts, each with an optional ``filter``
    (ALREADY compiled to an AST node), optional ``weight``
    (multiplies the function value; alone it IS the value), and at
    most one of ``field_value_factor`` / ``gauss`` / ``exp`` /
    ``linear`` (decay on a numeric docs column).  All of it compiles
    to native Column expressions -- no UDF, no extra scan."""

    child: object = None
    functions: list = dc_field(default_factory=list)
    score_mode: str = "multiply"
    boost_mode: str = "multiply"
    max_boost: float | None = None
    min_score: float | None = None
    boost: float = 1.0


@dataclass
class ScriptScore:
    """script_score query: the child gates matching; the score is the
    restricted-Painless ``source`` expression evaluated with
    ``_score`` bound to the child's score (see ``painless.py`` for
    the accepted subset — it compiles to ONE native Column, never a
    Python UDF).  ``ast`` caches the parsed tree."""

    child: object = None
    source: str = ""
    min_score: float | None = None
    boost: float = 1.0
    ast: object = None

    def parsed(self):
        if self.ast is None:
            from .painless import parse_script
            self.ast = parse_script(self.source)
        return self.ast


_TOKEN_RE = re.compile(
    r"""
    \s*(
        (?P<lpar>\()
      | (?P<rpar>\))
      | "(?P<phrase>[^"]*)"(?P<pslop>~\d+)?(?P<pboost>\^\d+(?:\.\d+)?)?
      | (?P<word>(?:\\.|[^\s"()\[\]{}])*(?:[\[{][^\]}]*[\]}])?
                 (?:\\.|[^\s"()])*)
    )
    """,
    re.VERBOSE,
)

_RANGE_RE = re.compile(r"^(\[|\{)\s*(\S+)\s+TO\s+(\S+)\s*(\]|\})$")
_UNESCAPED_COLON_RE = re.compile(r"(?<!\\):")


def _unescape(s: str) -> str:
    r"""Drop Lucene backslash escapes: ``\X`` -> literal ``X``."""
    return re.sub(r"\\(.)", r"\1", s)


def _has_unescaped(s: str, chars: str) -> bool:
    i = 0
    while i < len(s):
        if s[i] == "\\":
            i += 2
            continue
        if s[i] in chars:
            return True
        i += 1
    return False


def _tokenize(q: str):
    out = []
    for m in _TOKEN_RE.finditer(q):
        if m.group("lpar"):
            out.append(("lpar", None, None))
        elif m.group("rpar"):
            out.append(("rpar", None, None))
        elif m.group("phrase") is not None:
            b, sl = m.group("pboost"), m.group("pslop")
            out.append(("phrase", m.group("phrase"),
                        (float(b[1:]) if b else 1.0,
                         int(sl[1:]) if sl else 0)))
        elif m.group("word"):
            out.append(("word", m.group("word"), None))
    return out


def parse_query_string(q: str, default_operator: str = "OR") -> Group:
    """Driver-side parse into the boolean tree described above.

    ``default_operator`` mirrors the OpenSearch query_string option of
    the same name: with ``"AND"``, bare adjacent items are required
    (must) unless an explicit ``OR`` separates them; default ``"OR"``
    keeps them optional (should).
    """
    tokens = _tokenize(q)
    pos = 0
    default_occ = "must" if default_operator.upper() == "AND" else "should"

    def parse_group(field_ctx: str | None, depth: int) -> Group:
        nonlocal pos
        g = Group()
        pending_occur: str | None = None
        upgrade_next = False
        downgrade_next = False
        # index of the most recent batch of items IF the most recent
        # parsed thing produced items (AND binds adjacent ITEMS).
        last_batch: tuple[int, int] | None = None

        def take_occur() -> str:
            nonlocal pending_occur
            occ = pending_occur or default_occ
            pending_occur = None
            return occ

        def added(start: int) -> None:
            nonlocal upgrade_next, downgrade_next, last_batch
            if upgrade_next:
                for i in range(start, len(g.clauses)):
                    if g.clauses[i][0] == "should":
                        g.clauses[i] = ("must", g.clauses[i][1])
                upgrade_next = False
            if downgrade_next:
                for i in range(start, len(g.clauses)):
                    if g.clauses[i][0] == "must":
                        g.clauses[i] = ("should", g.clauses[i][1])
                downgrade_next = False
            last_batch = (start, len(g.clauses))

        def apply_and() -> None:
            nonlocal upgrade_next
            if last_batch is not None:
                for i in range(*last_batch):
                    if g.clauses[i][0] == "should":
                        g.clauses[i] = ("must", g.clauses[i][1])
            upgrade_next = True

        def apply_or() -> None:
            # only meaningful under default_operator=AND: an explicit
            # OR releases the adjacent items back to optional.
            nonlocal downgrade_next
            if last_batch is not None:
                for i in range(*last_batch):
                    if g.clauses[i][0] == "must":
                        g.clauses[i] = ("should", g.clauses[i][1])
            downgrade_next = True

        while pos < len(tokens):
            kind, text, pextra = tokens[pos]
            pos += 1
            if kind == "rpar":
                if depth > 0:
                    break
                continue  # stray ')' at top level: ignore
            if kind == "lpar":
                occ = take_occur()
                child = parse_group(field_ctx, depth + 1)
                if child.clauses:
                    start = len(g.clauses)
                    g.clauses.append((occ, child))
                    added(start)
                continue
            if kind == "phrase":
                occ = take_occur()
                start = len(g.clauses)
                if field_ctx is not None:
                    g.clauses.append(
                        (occ, FieldLeaf(field_ctx, "exact", text))
                    )
                else:
                    g.clauses.append(
                        (occ, TermLeaf("phrase", text, boost=pextra[0],
                                       slop=pextra[1]))
                    )
                added(start)
                continue

            # --- word ---
            # operators are CASE-SENSITIVE (Lucene classic parser):
            # lowercase and/or/not are ordinary search terms — 'not
            # guilty' must match the tokens, not negate 'guilty'
            if text in ("OR", "||"):
                # Lucene classic-parser semantics: an explicit OR only
                # changes anything under default_operator=AND, where it
                # demotes the adjacent required (non-prohibited) items.
                if default_occ == "must":
                    apply_or()
                continue
            if text in ("AND", "&&"):
                apply_and()
                continue
            if text in ("NOT", "!"):
                pending_occur = "must_not"
                continue

            # dangling boost token: the tokenizer splits '(a b)^2'
            # into ..., ')', '^2' — fold the boost into the clause
            # just closed (usually that Group) instead of tokenizing
            # a spurious scoring term '2'
            gb = re.match(r"^\^(\d+(?:\.\d+)?)$", text)
            if gb:
                if g.clauses:
                    _occ_prev, prev = g.clauses[-1]
                    if hasattr(prev, "boost"):
                        prev.boost = prev.boost * float(gb.group(1))
                continue

            if text.startswith("+"):
                pending_occur, text = "must", text[1:]
            elif text.startswith("-") and len(text) > 1:
                pending_occur, text = "must_not", text[1:]
            elif text.startswith("!") and len(text) > 1:
                pending_occur, text = "must_not", text[1:]
            elif text == "-":
                # bare modifier before a quote/paren: carry the occur
                # into the next parsed item ('-"exact phrase"').
                pending_occur = "must_not"
                continue
            elif text == "+":
                pending_occur = "must"
                continue
            if not text:
                continue

            fieldname: str | None = None
            colon = (_UNESCAPED_COLON_RE.search(text)
                     if field_ctx is None else None)
            if colon is not None:
                cand_field, rest = text[:colon.start()], text[colon.end():]
                if cand_field:
                    fieldname, text = _unescape(cand_field), rest
                    if text == "":
                        # 'field:' then '(' (value group) or a quoted
                        # phrase value.
                        if pos < len(tokens) and tokens[pos][0] == "lpar":
                            pos += 1
                            occ = take_occur()
                            child = parse_group(fieldname, depth + 1)
                            if child.clauses:
                                start = len(g.clauses)
                                g.clauses.append((occ, child))
                                added(start)
                            continue
                        if pos < len(tokens) and tokens[pos][0] == "phrase":
                            _, ptext, _ = tokens[pos]
                            pos += 1
                            occ = take_occur()
                            start = len(g.clauses)
                            g.clauses.append(
                                (occ, FieldLeaf(fieldname, "exact", ptext))
                            )
                            added(start)
                            continue
                        continue  # dangling 'field:' -- ignore
            elif field_ctx is not None:
                fieldname = field_ctx

            occ = take_occur()

            # strip a boost suffix (valid on any leaf; \^ is literal)
            boost = 1.0
            bm = re.match(r"^(.*)(?<!\\)\^(\d+(?:\.\d+)?)$", text)
            if bm and bm.group(1):
                text, boost = bm.group(1), float(bm.group(2))

            if fieldname is not None:
                start = len(g.clauses)
                if fieldname == "_exists_":
                    # reserved Lucene field: _exists_:name == name:*
                    g.clauses.append((occ, FieldLeaf(text, "exists")))
                else:
                    g.clauses.append((occ, _field_leaf(fieldname, text)))
                added(start)
                continue

            start = len(g.clauses)
            fm = re.match(r"^(.*)(?<!\\)~(\d*)$", text)
            if fm and fm.group(1) and not _has_unescaped(text, "*?"):
                g.clauses.append(
                    (occ, TermLeaf("fuzzy", _unescape(fm.group(1)).lower(),
                                   boost, max_edits=int(fm.group(2) or 1)))
                )
            elif (text.endswith("*") and not text.endswith(r"\*")
                  and len(text) > 1
                  and not _has_unescaped(text[:-1], "*?")):
                g.clauses.append(
                    (occ, TermLeaf("prefix", _unescape(text[:-1]).lower(),
                                   boost))
                )
            elif _has_unescaped(text, "*?"):
                if text.strip("*?"):
                    # keep escapes in the pattern: _wild_to_like treats
                    # \X as the literal character X.
                    g.clauses.append(
                        (occ, TermLeaf("wildcard", text.lower(), boost))
                    )
            else:
                for t in tokenize_py(_unescape(text)):
                    g.clauses.append((occ, TermLeaf("term", t, boost)))
            if len(g.clauses) > start:
                added(start)
        return g

    return parse_group(None, 0)


def _field_leaf(fieldname: str, value: str) -> FieldLeaf:
    rm = _RANGE_RE.match(value)
    if rm:
        lo = None if rm.group(2) == "*" else rm.group(2)
        hi = None if rm.group(3) == "*" else rm.group(3)
        return FieldLeaf(fieldname, "range", lo=lo, hi=hi,
                         lo_incl=rm.group(1) == "[",
                         hi_incl=rm.group(4) == "]")
    # Lucene one-sided range shorthand: field:>10 field:>=10 field:<v
    cm = re.match(r"^(>=|<=|>|<)(.+)$", value)
    if cm:
        op, v = cm.group(1), _unescape(cm.group(2))
        if op.startswith(">"):
            return FieldLeaf(fieldname, "range", lo=v, hi=None,
                             lo_incl=op == ">=")
        return FieldLeaf(fieldname, "range", lo=None, hi=v,
                         hi_incl=op == "<=")
    if value == "*":
        return FieldLeaf(fieldname, "exists")
    if _has_unescaped(value, "*?"):
        # keep escapes: _wild_to_like maps \X to the literal char
        return FieldLeaf(fieldname, "wildcard", value)
    return FieldLeaf(fieldname, "exact", _unescape(value))


# ---------------------------------------------------------------------------
# compile helpers
# ---------------------------------------------------------------------------


def _escape_like(s: str) -> str:
    """Escape LIKE metacharacters so user text matches literally."""
    return s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")


def _wild_to_like(pattern: str) -> str:
    r"""Lucene wildcard (* any run, ? one char, \X literal X) -> SQL
    LIKE pattern."""
    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            out.append(_escape_like(pattern[i + 1]))
            i += 2
            continue
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        else:
            out.append(_escape_like(ch))
        i += 1
    return "".join(out)


def _walk(node, out: list) -> None:
    if isinstance(node, Group):
        for _, child in node.clauses:
            _walk(child, out)
    elif isinstance(node, DisMax):
        for child in node.children:
            _walk(child, out)
    elif isinstance(node, ConstScore):
        _walk(node.child, out)
    elif isinstance(node, Boosting):
        _walk(node.positive, out)
        _walk(node.negative, out)
    elif isinstance(node, FuncScore):
        _walk(node.child, out)
        for fn in node.functions:
            if fn.get("filter") is not None:
                _walk(fn["filter"], out)
    elif isinstance(node, ScriptScore):
        _walk(node.child, out)
    else:
        out.append(node)


def _has_scoring(node) -> bool:
    """Can this node produce a non-trivial score?  Pure filter-context
    trees (field leaves only) fall back to constant-score 1.0; a
    ConstScore wrapper scores its boost even over field leaves."""
    if isinstance(node, TermLeaf):
        return True
    if isinstance(node, FieldLeaf):
        return False
    if isinstance(node, ConstScore):
        return True
    if isinstance(node, Boosting):
        return _has_scoring(node.positive)
    if isinstance(node, DisMax):
        return any(_has_scoring(c) for c in node.children)
    if isinstance(node, (FuncScore, ScriptScore)):
        return True
    return any(
        _has_scoring(c) for occ, c in node.clauses
        if occ in ("must", "should")
    )


def _maybe_matches_without_postings(node) -> bool:
    """Optimistic 3-valued check: can this node possibly match a doc
    that matches NO posting leaf? (field leaves are 'maybe' = True;
    posting leaves are False). Decides the anchoring side."""
    if isinstance(node, TermLeaf):
        return False
    if isinstance(node, FieldLeaf):
        return True
    if isinstance(node, DisMax):
        return any(_maybe_matches_without_postings(c)
                   for c in node.children) or not node.children
    if isinstance(node, ConstScore):
        return _maybe_matches_without_postings(node.child)
    if isinstance(node, Boosting):
        return _maybe_matches_without_postings(node.positive)
    if isinstance(node, (FuncScore, ScriptScore)):
        return _maybe_matches_without_postings(node.child)
    musts = [c for occ, c in node.clauses if occ in ("must", "filter")]
    shoulds = [c for occ, c in node.clauses if occ == "should"]
    if any(not _maybe_matches_without_postings(c) for c in musts):
        return False
    if shoulds and (not musts or (node.minimum_should_match or 0) > 0):
        return any(_maybe_matches_without_postings(c) for c in shoulds)
    return True  # must-only (all maybe) or pure-negative match_all


def _has_const_wrapper(node) -> bool:
    """Does the tree contain a wrapper that scores WITHOUT posting
    leaves (constant_score / function_score)?  Such a tree must
    execute even when it has zero leaves -- it is match_all-shaped
    but not score-1.0."""
    if isinstance(node, (ConstScore, FuncScore, ScriptScore)):
        return True
    if isinstance(node, Group):
        return any(_has_const_wrapper(c) for _, c in node.clauses)
    if isinstance(node, DisMax):
        return any(_has_const_wrapper(c) for c in node.children)
    if isinstance(node, Boosting):
        return (_has_const_wrapper(node.positive)
                or _has_const_wrapper(node.negative))
    return False


_DURATION_SECONDS = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0,
                     "d": 86400.0, "w": 604800.0}


def _duration_seconds(s: str) -> float:
    """OpenSearch time-unit string ("7d", "3h", "500ms") -> seconds."""
    m = re.match(r"^(\d+(?:\.\d+)?)(ms|s|m|h|d|w)$", s.strip())
    if not m:
        raise ValueError(f"bad duration {s!r}")
    return float(m.group(1)) * _DURATION_SECONDS[m.group(2)]



def field_leaf_pred(col: Column, leaf: FieldLeaf) -> Column:
    """Predicate for a term-level FieldLeaf op against an already
    RESOLVED column — a docs column (``field_matched``) or a
    nested-element field (``element_pred``).  Shared so the two
    contexts cannot drift."""
    if leaf.op == "exists":
        pred = col.isNotNull()
    elif leaf.op == "exact":
        pred = col.cast("string") == leaf.value
    elif leaf.op == "wildcard":
        pred = col.cast("string").like(_wild_to_like(leaf.value))
    elif leaf.op == "in":
        pred = col.cast("string").isin([str(v) for v in leaf.values])
    elif leaf.op == "terms_set":
        # multi-valued keyword semantics: the doc's array column
        # must share >= msm elements with the query terms; the
        # per-doc minimum comes from minimum_should_match_field.
        # One array_intersect per row -- codegen, no join.
        overlap = F.size(F.array_intersect(
            col.cast("array<string>"),
            F.array(*[F.lit(str(v)) for v in leaf.values]),
        ))
        msm = (F.col(leaf.msm_field).cast("int")
               if leaf.msm_field is not None
               else F.lit(int(leaf.msm_const or 1)))
        pred = (overlap >= msm) & (msm > 0)
    elif leaf.op == "range":
        iso_re = re.compile(
            r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2})?)?$")

        def side(v, incl, cmp_i, cmp_e):
            if v is None:
                return F.lit(True)
            try:
                float(v)
                c, b = col.cast("double"), F.lit(float(v))
            except ValueError:
                if iso_re.match(v):
                    # date bounds compare as timestamps, so
                    # '2020-12-01' bounds a timestamp column at
                    # midnight instead of string-ordering against
                    # '2020-12-01 00:00:00'
                    c = col.cast("timestamp")
                    b = F.to_timestamp(F.lit(v))
                else:
                    c, b = col.cast("string"), F.lit(v)
            return (cmp_i if incl else cmp_e)(c, b)

        pred = side(leaf.lo, leaf.lo_incl,
                    Column.__ge__, Column.__gt__) & side(
            leaf.hi, leaf.hi_incl, Column.__le__, Column.__lt__)
    else:  # pragma: no cover
        raise ValueError(f"unknown field op {leaf.op!r}")
    # NULL field never matches positively (and thus passes NOT):
    # the reference's missing-key behavior.
    return F.coalesce(pred, F.lit(False))


def map_typed_cols(schema) -> frozenset[str]:
    """Top-level ``map``-typed column names — the flat_object fields.
    (The mapping type IS the Spark schema: a ``flat_object`` field is
    a ``map<string,array<string>>`` column of leaf-path -> values.)"""
    from pyspark.sql.types import MapType

    return frozenset(f.name for f in schema.fields
                     if isinstance(f.dataType, MapType))


def flat_field_pred(col: Column, subpath: str | None,
                    leaf: FieldLeaf) -> Column:
    """FieldLeaf predicate against a flat_object column (OpenSearch
    ``flat_object`` mapping: arbitrary JSON indexed without mapping
    explosion; the reference ingests exactly such free-form logs —
    es_loader flattens nested dicts into dotted keys,
    siem/utils.py value_from_nesteddict).  Spark shape: one
    ``map<string, array<string>>`` column of dotted leaf path ->
    stringified values (``flatobject.flatten_json``).

    Addressing follows the wire: the ROOT name matches a value in ANY
    leaf (``subpath is None`` -> all values), a dotted sub-path
    matches that leaf's values only.  Multi-valued leaves use Lucene
    any-value-matches semantics.  Ranges follow the engine's shared
    bound dialect (``field_leaf_pred``: numeric bounds compare
    numerically, ISO dates as timestamps, else lexically) — a strict
    superset of the upstream type's lexical-only ranges.  All native
    higher-order exprs — per-row codegen, no explode, no join."""
    if subpath:
        vals = F.element_at(col, F.lit(subpath))
    else:
        vals = F.flatten(F.map_values(col))
    vals = F.coalesce(vals, F.array().cast("array<string>"))
    if leaf.op == "exists":
        return F.coalesce(F.size(vals) > 0, F.lit(False))
    return F.coalesce(
        F.exists(vals, lambda v: field_leaf_pred(v, leaf)),
        F.lit(False))


def group_pred(node: Group, rec) -> Column:
    """Boolean combiner for one Group level, with ``rec`` supplying
    the child predicate — shared by the docs-column compiler
    (``_Compiler.matched``) and the nested-element compiler
    (``element_pred``) so minimum_should_match / pure-negative
    semantics cannot drift between the two contexts."""
    musts = [c for occ, c in node.clauses if occ in ("must", "filter")]
    shoulds = [c for occ, c in node.clauses if occ == "should"]
    nots = [c for occ, c in node.clauses if occ == "must_not"]
    conds = [rec(c) for c in musts]
    msm = node.minimum_should_match
    if msm is None:
        msm = 0 if musts else 1
    if shoulds and msm == 1:
        conds.append(reduce(Column.__or__, [rec(c) for c in shoulds]))
    elif shoulds and msm > 1:
        n_match = reduce(Column.__add__,
                         [rec(c).cast("int") for c in shoulds])
        conds.append(n_match >= msm)
    # no must and no should: match_all minus exclusions (the
    # OpenSearch pure-negative query behavior)
    conds.extend(~rec(c) for c in nots)
    if not conds:
        return F.lit(True)
    return reduce(Column.__and__, conds)


def element_pred(node, path: str, elem: Column) -> Column:
    """Per-ELEMENT predicate for a ``nested`` query's inner tree: the
    OpenSearch nested semantic (upstream: Lucene
    ToParentBlockJoinQuery; reference mapping deploy_es/data.ini:280
    declares 15 nested fields) requires a SINGLE array element to
    satisfy ALL inner clauses.  ``elem`` is the lambda variable of a
    native higher-order function, so the whole inner tree evaluates
    inside whole-stage codegen — no explode, no join, no shuffle.

    Inner clauses are term-level (FieldLeaf) filters; field names are
    resolved relative to ``path`` (``path.sub.field`` → element field
    ``sub.field``), and a field outside the path falls back to the
    parent doc column (lenient).  Full-text (posting-backed) inner
    clauses would need per-element positions and are rejected."""
    if isinstance(node, TermLeaf):
        raise ValueError(
            "nested inner queries support term-level (element-column) "
            f"clauses only, not full-text {node.kind!r}")
    if isinstance(node, FieldLeaf):
        rel = node.field
        if rel == path or rel.startswith(path + "."):
            sub = rel[len(path) + 1:] if rel != path else ""
            col = reduce(lambda c, s: c[s],
                         [s for s in sub.split(".") if s], elem)
        else:
            col = F.col(rel)
        if node.op == "nested":
            # nested-in-nested: recurse with the element's sub-array
            return F.coalesce(
                F.exists(col, lambda e2: element_pred(node.values[0],
                                                      node.field, e2)),
                F.lit(False))
        if node.op in ("script", "sql_expr"):
            raise ValueError(
                f"{node.op} clauses are not supported inside nested "
                "queries (they reference doc columns, not elements)")
        return field_leaf_pred(col, node)
    if isinstance(node, DisMax):
        if not node.children:
            return F.lit(True)
        return reduce(Column.__or__,
                      [element_pred(c, path, elem)
                       for c in node.children])
    if isinstance(node, ConstScore):
        return element_pred(node.child, path, elem)
    if isinstance(node, Boosting):
        return element_pred(node.positive, path, elem)
    if isinstance(node, (FuncScore, ScriptScore)):
        return element_pred(node.child, path, elem)
    return group_pred(node, lambda c: element_pred(c, path, elem))


class _Compiler:
    """Turns the parsed tree into native Columns over the per-doc hit
    array (posting leaves) + docs columns (field leaves).

    ``flat_cols`` names the docs columns with flat_object (map)
    typing, so ``field:value`` leaves whose root segment is such a
    column route through ``flat_field_pred`` instead of a struct
    path."""

    def __init__(self, hits_col: Column,
                 flat_cols: frozenset[str] = frozenset()):
        self.hits = hits_col
        self.flat_cols = flat_cols

    def leaf_matched(self, leaf: TermLeaf) -> Column:
        return F.exists(self.hits, lambda e: e["leaf"] == leaf.leaf_id)

    def leaf_contrib(self, leaf: TermLeaf) -> Column:
        return F.aggregate(
            F.filter(self.hits, lambda e: e["leaf"] == leaf.leaf_id),
            F.lit(0.0),
            lambda acc, e: acc + e["contrib"],
        )

    def field_matched(self, leaf: FieldLeaf) -> Column:
        if leaf.op == "script":
            from .painless import parse_script, to_column
            pred = to_column(parse_script(leaf.value)).cast("boolean")
            return F.coalesce(pred, F.lit(False))
        if leaf.op == "sql_expr":
            # closed-form shared-dialect SQL predicate (geo queries:
            # operators/geo.py emits ONE text both engines parse);
            # codegen on the Spark side, verbatim oracle on the other.
            return F.coalesce(F.expr(leaf.value).cast("boolean"),
                              F.lit(False))
        if leaf.op == "nested":
            # nested query as a filter clause: ONE element of the
            # array<struct> column must satisfy ALL inner clauses
            # (Lucene block-join semantics; the inner AST rides in
            # values[0]).  Native higher-order `exists` -- per-row
            # codegen, no join, no explode.
            arr = F.col(leaf.field)
            inner = leaf.values[0]
            return F.coalesce(
                F.exists(arr, lambda e: element_pred(inner, leaf.field,
                                                     e)),
                F.lit(False))
        if leaf.field == "*" and leaf.op == "exists":
            # the canonical Lucene match-all spelling `*:*`
            return F.lit(True)
        root, _, sub = leaf.field.partition(".")
        if root in self.flat_cols:
            if leaf.op not in ("exact", "wildcard", "in", "range",
                               "exists"):
                raise ValueError(
                    f"op {leaf.op!r} is not supported on flat_object "
                    f"field {leaf.field!r} (term/terms/wildcard/"
                    "range/exists only, as upstream)")
            return flat_field_pred(F.col(root), sub or None, leaf)
        return field_leaf_pred(F.col(leaf.field), leaf)


    def matched(self, node) -> Column:
        if isinstance(node, TermLeaf):
            return self.leaf_matched(node)
        if isinstance(node, FieldLeaf):
            return self.field_matched(node)
        if isinstance(node, DisMax):
            if not node.children:
                return F.lit(True)
            return reduce(Column.__or__,
                          [self.matched(c) for c in node.children])
        if isinstance(node, ConstScore):
            return self.matched(node.child)
        if isinstance(node, Boosting):
            return self.matched(node.positive)
        if isinstance(node, (FuncScore, ScriptScore)):
            m = self.matched(node.child)
            if node.min_score is not None:
                m = m & (self.score(node) >= float(node.min_score))
            return m
        return group_pred(node, self.matched)

    def score(self, node) -> Column:
        if isinstance(node, TermLeaf):
            return self.leaf_contrib(node)
        if isinstance(node, FieldLeaf):
            return F.lit(0.0)  # filter context never scores
        if isinstance(node, DisMax):
            gated = [
                F.when(self.matched(c), self.score(c)).otherwise(F.lit(0.0))
                for c in node.children
            ]
            if not gated:
                return F.lit(0.0)
            best = gated[0] if len(gated) == 1 else F.greatest(*gated)
            if node.tie_breaker:
                total = reduce(Column.__add__, gated)
                return best + F.lit(float(node.tie_breaker)) * (total - best)
            return best
        if isinstance(node, ConstScore):
            return F.lit(float(node.boost))
        if isinstance(node, Boosting):
            pos = F.when(
                self.matched(node.positive), self.score(node.positive)
            ).otherwise(F.lit(0.0))
            return pos * F.when(
                self.matched(node.negative),
                F.lit(float(node.negative_boost)),
            ).otherwise(F.lit(1.0))
        if isinstance(node, FuncScore):
            return self.func_score(node)
        if isinstance(node, ScriptScore):
            from .painless import to_column
            child_score = (
                self.score(node.child) if _has_scoring(node.child)
                else F.lit(1.0)
            )
            s = to_column(node.parsed(), {"_score": child_score})
            if node.boost != 1.0:
                s = s * F.lit(float(node.boost))
            return s
        total = F.lit(0.0)
        for occ, child in node.clauses:
            if occ in ("must_not", "filter"):
                continue
            total = total + F.when(
                self.matched(child), self.score(child)
            ).otherwise(F.lit(0.0))
        if node.boost != 1.0:
            total = total * F.lit(float(node.boost))
        return total

    # -- function_score ------------------------------------------------

    def _func_value(self, fn: dict) -> Column:
        """One function's value (its ``weight`` folded in) -- pure
        native arithmetic over docs columns."""
        v: Column | None = None
        if "rank_feature" in fn:
            # the rank_feature query's monotonic saturation functions
            # (public Elasticsearch/OpenSearch semantics): saturation
            # x/(x+pivot), log ln(scaling_factor + x), sigmoid
            # x^e/(x^e + pivot^e).  The pivot must be given explicitly
            # (the upstream default -- approximate geometric mean of
            # the feature -- would be a corpus stats job; callers at
            # scale precompute it once and pass it in).
            p = fn["rank_feature"]
            x = F.col(p["field"]).cast("double")
            if "log" in p:
                sf = float(p["log"]["scaling_factor"])
                v = F.log(F.lit(sf) + x)
            elif "sigmoid" in p:
                pv = float(p["sigmoid"]["pivot"])
                ex = float(p["sigmoid"]["exponent"])
                xp = F.pow(x, F.lit(ex))
                v = xp / (xp + F.lit(pv ** ex))
            else:
                pv = float(p["saturation"]["pivot"])
                v = x / (x + F.lit(pv))
        elif "distance_feature" in fn:
            # distance_feature query (desugared by the body compiler):
            # score = pivot / (pivot + |value - origin|).  Numeric
            # origins compare as doubles; ISO origins as timestamps
            # with duration-string pivots ("7d"/"3h"/"10m"/"30s").
            p = fn["distance_feature"]
            col = F.col(p["field"])
            origin, pivot = p["origin"], p["pivot"]
            try:
                o = float(origin)
                dist = F.abs(col.cast("double") - F.lit(o))
                pv = float(pivot)
            except (TypeError, ValueError):
                dist = F.abs(
                    col.cast("timestamp").cast("double")
                    - F.to_timestamp(F.lit(str(origin))).cast("double"))
                pv = _duration_seconds(str(pivot))
            v = F.lit(pv) / (F.lit(pv) + dist)
        elif "field_value_factor" in fn:
            p = fn["field_value_factor"]
            col = F.col(p["field"]).cast("double")
            if "missing" in p:
                col = F.coalesce(col, F.lit(float(p["missing"])))
            x = col * F.lit(float(p.get("factor", 1.0)))
            mod = p.get("modifier", "none")
            if mod == "none":
                v = x
            elif mod == "log":       # OpenSearch log is base-10
                v = F.log10(x)
            elif mod == "log1p":
                v = F.log10(x + F.lit(1.0))
            elif mod == "log2p":
                v = F.log10(x + F.lit(2.0))
            elif mod == "ln":
                v = F.log(x)
            elif mod == "ln1p":
                v = F.log(x + F.lit(1.0))
            elif mod == "ln2p":
                v = F.log(x + F.lit(2.0))
            elif mod == "square":
                v = x * x
            elif mod == "sqrt":
                v = F.sqrt(x)
            elif mod == "reciprocal":
                v = F.lit(1.0) / x
            else:
                raise ValueError(f"bad fvf modifier {mod!r}")
        elif "random_score" in fn:
            # seeded deterministic per-doc uniform [0,1): a 64-bit
            # hash of (field value, seed) — the upstream seeded mode
            # (its exact values are hash-implementation-defined and
            # not portable across versions there either; determinism
            # and distribution are the contract).  Default field
            # doc_id, like upstream's _seq_no recommendation.
            p = fn["random_score"] or {}
            seed = int(p.get("seed", 0))
            fld = str(p.get("field", "doc_id"))
            h = F.xxhash64(F.col(fld).cast("string"), F.lit(seed))
            v = (h.cast("double") / F.lit(float(2 ** 63)) + 1.0) / 2.0
        elif "script_score" in fn:
            # script_score as a FUNCTION inside function_score (the
            # wire allows it next to weight/decay): the restricted-
            # Painless compiler emits one native Column
            from .painless import parse_script, to_column
            src = fn["script_score"]["script"]
            src = src["source"] if isinstance(src, dict) else str(src)
            v = to_column(parse_script(src))
        else:
            for kind in ("gauss", "exp", "linear"):
                if kind not in fn:
                    continue
                field, p = next(iter(fn[kind].items()))
                origin = float(p["origin"])
                scale = float(p["scale"])
                offset = float(p.get("offset", 0.0))
                decay = float(p.get("decay", 0.5))
                dist = F.greatest(
                    F.abs(F.col(field).cast("double") - F.lit(origin))
                    - F.lit(offset),
                    F.lit(0.0),
                )
                if kind == "gauss":
                    sigma2 = -(scale ** 2) / (2.0 * math.log(decay))
                    v = F.exp(-(dist * dist) / F.lit(2.0 * sigma2))
                elif kind == "exp":
                    v = F.exp(F.lit(math.log(decay) / scale) * dist)
                else:  # linear
                    s = scale / (1.0 - decay)
                    v = F.greatest(
                        (F.lit(s) - dist) / F.lit(s), F.lit(0.0))
                break
        w = float(fn.get("weight", 1.0))
        if v is None:
            return F.lit(w)  # weight-only function
        return v * F.lit(w)

    def func_score(self, node: FuncScore) -> Column:
        """function_score: score_mode-combine the APPLICABLE function
        values (a function with a non-matching filter contributes
        nothing, not zero), then boost_mode-combine with the child's
        score.  NULL-filtered array + aggregate keeps everything one
        native expression."""
        child_score = (
            self.score(node.child) if _has_scoring(node.child)
            else F.lit(1.0)
        )
        if not node.functions:
            factor = F.lit(1.0)
        else:
            vals = F.array(*[
                F.when(
                    self.matched(fn["filter"])
                    if fn.get("filter") is not None else F.lit(True),
                    self._func_value(fn),
                )
                for fn in node.functions
            ])
            app = F.filter(vals, lambda x: x.isNotNull())
            n = F.size(app)
            sm = node.score_mode
            if sm == "multiply":
                combined = F.aggregate(
                    app, F.lit(1.0), lambda a, x: a * x)
            elif sm == "sum":
                combined = F.aggregate(
                    app, F.lit(0.0), lambda a, x: a + x)
            elif sm == "avg":
                # upstream documents score_mode=avg as the WEIGHTED
                # average: sum(w_i * v_i) / sum(w_i) — the function
                # values already carry their weight factor, so divide
                # by the applicable functions' weight sum, not by n
                wts = F.array(*[
                    F.when(
                        self.matched(fn["filter"])
                        if fn.get("filter") is not None else F.lit(True),
                        F.lit(float(fn.get("weight", 1.0))),
                    )
                    for fn in node.functions
                ])
                wsum = F.aggregate(
                    F.filter(wts, lambda x: x.isNotNull()),
                    F.lit(0.0), lambda a, x: a + x)
                # all-zero weights are a legitimate way to neutralize
                # every function: upstream yields 0 there, and a plain
                # divide would be NULL (or DIVIDE_BY_ZERO under ANSI)
                combined = F.when(
                    wsum > 0,
                    F.aggregate(app, F.lit(0.0), lambda a, x: a + x)
                    / wsum,
                ).otherwise(F.lit(0.0))
            elif sm == "max":
                combined = F.array_max(app)
            elif sm == "min":
                combined = F.array_min(app)
            elif sm == "first":
                combined = F.element_at(app, 1)
            else:
                raise ValueError(f"bad score_mode {sm!r}")
            # no applicable function: the score stays unmodified
            factor = F.when(n == 0, F.lit(1.0)).otherwise(combined)
            if node.max_boost is not None:
                factor = F.least(factor, F.lit(float(node.max_boost)))
        bm = node.boost_mode
        if bm == "multiply":
            s = child_score * factor
        elif bm == "sum":
            s = child_score + factor
        elif bm == "replace":
            s = factor
        elif bm == "avg":
            s = (child_score + factor) / F.lit(2.0)
        elif bm == "max":
            s = F.greatest(child_score, factor)
        elif bm == "min":
            s = F.least(child_score, factor)
        else:
            raise ValueError(f"bad boost_mode {bm!r}")
        if node.boost != 1.0:
            s = s * F.lit(float(node.boost))
        return s


# ---------------------------------------------------------------------------
# leaf -> (doc_id, leaf, contrib) rows
# ---------------------------------------------------------------------------


def _term_leaf_rows(ix: PostingsIndex,
                    term_leaves: list[TermLeaf]) -> DataFrame | None:
    """ONE decode pass shared by every plain-term leaf: a literal map
    term -> array<struct<leaf, w>> fans each decoded posting out to
    its leaves with boost * idf folded in."""
    terms = sorted({leaf.text for leaf in term_leaves})
    stats = {
        r["term"]: int(r["df"])
        for r in ix.term_stats.filter(F.col("term").isin(terms))
        .select("term", "df").collect()
    }
    fanout: dict[str, list[tuple[int, float]]] = {}
    for leaf in term_leaves:
        if leaf.text in stats:
            w = leaf.boost * _idf(ix.n_docs, stats[leaf.text])
            fanout.setdefault(leaf.text, []).append((leaf.leaf_id, w))
    if not fanout:
        return None
    wmap = F.create_map(
        *[
            x
            for t, lws in fanout.items()
            for x in (
                F.lit(t),
                F.array(*[
                    F.struct(
                        F.lit(lid).alias("leaf"), F.lit(w).alias("w")
                    )
                    for lid, w in lws
                ]),
            )
        ]
    )
    decoded = decode_blocks(
        ix.postings.filter(F.col("term").isin(list(fanout)))
    )
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    bm25_part = tf / (tf + K1 * (1.0 - B + B * dl / F.lit(ix.avgdl)))
    return decoded.select(
        "doc_id",
        F.explode(wmap[F.col("term")]).alias("lw"),
        bm25_part.alias("_p"),
    ).select(
        "doc_id", F.col("lw.leaf").alias("leaf"),
        (F.col("lw.w") * F.col("_p")).alias("contrib"),
    )


# Lucene-style multi-term rewrite bound: when the vocabulary scan
# matches at most this many terms, the postings scan gets a literal
# `term IN (...)` (parquet row-group skipping on the term-sorted
# layout); above it we keep the predicate inside the postings scan
# (the constant_score rewrite -- correct for arbitrarily large term
# sets, just not dictionary-pruned). Semantics are IDENTICAL on both
# paths; the bound only switches physical strategy.
MULTI_TERM_SCAN_CUTOFF = 512


def _const_leaf_rows(ix: PostingsIndex, leaf: TermLeaf,
                     like_pattern: str | None,
                     rlike_pattern: str | None = None) -> DataFrame:
    """Constant-score multi-term leaf (prefix / wildcard / regexp):
    every doc containing ANY dictionary term matching the pattern
    scores boost * 1.0.

    Strategy (Lucene MultiTermQuery rewrite, vocabulary-first): the
    pattern is first evaluated against ``term_stats`` -- ONE ROW PER
    TERM, metadata-sized next to the postings -- and, when the match
    set fits :data:`MULTI_TERM_SCAN_CUTOFF`, the postings scan is a
    pushed-down ``term IN (literals)`` instead of a LIKE/RLIKE over
    every postings block. A leading-wildcard query (``*Unauthorized*``,
    every other CloudTrail saved search) then reads only the matched
    terms' row groups. Overflow falls back to the in-scan predicate:
    same results, vocabulary-pruning skipped."""
    if rlike_pattern is not None:
        # Lucene regexp queries are anchored (whole-term match).
        def pred_on(col: Column) -> Column:
            return col.rlike(f"^(?:{rlike_pattern})$")
    else:
        def pred_on(col: Column) -> Column:
            return col.like(like_pattern)
    vocab = ix.term_stats.filter(pred_on(F.col("term"))) \
        .select("term").limit(MULTI_TERM_SCAN_CUTOFF + 1).collect()
    if len(vocab) <= MULTI_TERM_SCAN_CUTOFF:
        return _const_terms_rows(ix, leaf, [r["term"] for r in vocab])
    matched = decode_blocks(
        ix.postings.filter(pred_on(F.col("term")))
    ).select("doc_id").distinct()
    return matched.select(
        "doc_id", F.lit(leaf.leaf_id).alias("leaf"),
        F.lit(float(leaf.boost)).alias("contrib"),
    )


def _const_terms_rows(ix: PostingsIndex, leaf: TermLeaf,
                      terms: list[str]) -> DataFrame:
    """Constant-score leaf over an ALREADY-RESOLVED literal term list
    (vocabulary-first rewrite hit, or the edge-ngram prefix
    dictionary): pushed-down ``term IN (...)`` postings scan."""
    if not terms:
        # provably-empty leaf: no postings job at all
        return ix.postings.sparkSession.createDataFrame(
            [], "doc_id long, leaf int, contrib double")
    matched = decode_blocks(
        ix.postings.filter(F.col("term").isin(terms))
    ).select("doc_id").distinct()
    return matched.select(
        "doc_id", F.lit(leaf.leaf_id).alias("leaf"),
        F.lit(float(leaf.boost)).alias("contrib"),
    )


def _prefix_vocab_terms(ix: PostingsIndex,
                        text: str) -> list[str] | None:
    """Vocabulary expansion of a prefix leaf through the edge-ngram
    dictionary (`sayt.py` — the mapping's ``index_prefixes`` option):
    an EqualTo on the prefix-sorted dictionary instead of a LIKE over
    every term_stats row. Returns None when the index has no prefix
    dictionary or the match set overflows the literal-``IN`` cutoff
    (callers fall back to the un-accelerated rewrite — identical
    results either way)."""
    if ix.prefix_vocab is None or not text:
        return None
    probe = text[: ix.prefix_max_gram]
    cond = F.col("prefix") == probe
    if len(text) > ix.prefix_max_gram:
        # past Lucene's max_chars: equality on the stored gram plus a
        # residual refine over the handful of surviving rows
        cond = cond & F.col("term").like(_escape_like(text) + "%")
    rows = (
        ix.prefix_vocab.filter(cond)
        .select("term").limit(MULTI_TERM_SCAN_CUTOFF + 1).collect()
    )
    if len(rows) > MULTI_TERM_SCAN_CUTOFF:
        return None
    return [r["term"] for r in rows]


def _fuzzy_variants(ix: PostingsIndex, text: str, max_edits: int) -> list[str]:
    # Damerau-Levenshtein expansion (transpositions = one edit, the
    # Lucene default): native lev prefilter at 2*max_edits (sound
    # bound), exact DL refine over the candidate list on the driver.
    from .boolquery import dl_distance

    return [
        r["term"]
        for r in ix.term_stats.filter(
            F.levenshtein(F.col("term"), F.lit(text)) <= 2 * max_edits
        ).select("term").collect()
        if dl_distance(r["term"], text) <= max_edits
    ]


# ---------------------------------------------------------------------------
# executor
# ---------------------------------------------------------------------------


def _forest_hits(
    ix: PostingsIndex,
    posting_leaves: list,
    positional_ix: PostingsIndex | None,
) -> DataFrame | None:
    """Leaf rows for EVERY posting leaf (already carrying forest-wide
    leaf ids), unioned and collapsed to one per-doc hit array in a
    single shuffle.  Shared by tree_scores (one tree) and
    forest_scores (a whole msearch batch)."""
    parts: list[DataFrame] = []
    term_leaves = [l for l in posting_leaves if l.kind == "term"]
    if term_leaves:
        rows = _term_leaf_rows(ix, term_leaves)
        if rows is not None:
            parts.append(rows)
    for leaf in posting_leaves:
        if leaf.kind == "prefix":
            sayt = _prefix_vocab_terms(ix, leaf.text)
            if sayt is not None:
                # edge-ngram dictionary hit: the postings scan is the
                # same pushed-down term IN (...) the vocabulary-first
                # rewrite would build — the dictionary just found the
                # terms by equality instead of a vocab LIKE scan
                parts.append(_const_terms_rows(ix, leaf, sayt))
            else:
                parts.append(
                    _const_leaf_rows(ix, leaf,
                                     _escape_like(leaf.text) + "%")
                )
        elif leaf.kind == "wildcard":
            parts.append(_const_leaf_rows(ix, leaf, _wild_to_like(leaf.text)))
        elif leaf.kind == "regexp":
            parts.append(_const_leaf_rows(ix, leaf, None,
                                          rlike_pattern=leaf.text))
        elif leaf.kind == "fuzzy":
            variants = _fuzzy_variants(ix, leaf.text, leaf.max_edits)
            if variants:
                proxy = [
                    TermLeaf("term", v, leaf.boost, leaf_id=leaf.leaf_id)
                    for v in variants
                ]
                rows = _term_leaf_rows(ix, proxy)
                if rows is not None:
                    parts.append(rows)
        elif leaf.kind in ("phrase", "phrase_prefix"):
            if positional_ix is None:
                raise ValueError("phrase clause needs a positional index")
            from .positional import (phrase_prefix_scores, phrase_scores,
                                     proximity_scores)

            if leaf.kind == "phrase_prefix":
                ph = phrase_prefix_scores(positional_ix, leaf.text)
            elif leaf.slop > 0:
                ph = proximity_scores(positional_ix, leaf.text, leaf.slop)
            else:
                ph = phrase_scores(positional_ix, leaf.text)
            parts.append(
                ph.select(
                    "doc_id", F.lit(leaf.leaf_id).alias("leaf"),
                    (F.col("score") * float(leaf.boost)).alias("contrib"),
                )
            )

    # one shuffle: per-doc hit array over ALL scoring leaves
    # (must_not leaves included -- their rows gate, never score; no
    # broadcast anti-join anywhere).
    if not parts:
        return None
    allparts = parts[0]
    for p in parts[1:]:
        allparts = allparts.unionByName(p)
    return allparts.groupBy("doc_id").agg(
        F.collect_list(F.struct("leaf", "contrib")).alias("_hits")
    )


_EMPTY_HITS = "array<struct<leaf:int,contrib:double>>"


def _tree_result(ix: PostingsIndex, tree, hits_df: DataFrame | None,
                 field_leaves: list, with_docs: bool,
                 anchored: DataFrame | None = None) -> DataFrame:
    """Gate + score one tree over a (possibly forest-shared) hit
    frame.  ``anchored`` lets forest callers share ONE docs-left-join
    frame across every tree of the batch."""
    docs_needed = bool(field_leaves) or with_docs
    docs_anchored = _maybe_matches_without_postings(tree) or hits_df is None

    if docs_anchored:
        if anchored is not None:
            base = anchored
        elif hits_df is not None:
            base = ix.docs.join(hits_df, "doc_id", "left")
        else:
            base = ix.docs.withColumn(
                "_hits", F.lit(None).cast(_EMPTY_HITS))
    else:
        # hits-anchored: every candidate doc carries >=1 posting hit
        # (possibly from ANOTHER tree of the forest -- comp.matched
        # still requires one of THIS tree's leaves, so the superset
        # is filtered back to identical semantics).
        base = anchored if (anchored is not None and docs_needed) \
            else hits_df
        if base is hits_df and docs_needed:
            base = hits_df.join(ix.docs, "doc_id", "left")

    comp = _Compiler(
        F.coalesce(F.col("_hits"), F.array().cast(_EMPTY_HITS)),
        flat_cols=map_typed_cols(ix.docs.schema),
    )
    matched = comp.matched(tree)
    if _has_scoring(tree):
        score = comp.score(tree)
    else:
        score = F.lit(1.0)  # pure filter context: constant score

    out = base.filter(matched)
    if with_docs:
        keep = [c for c in out.columns if c != "_hits"]
        return out.select(*keep, score.alias("score"))
    return out.select("doc_id", score.alias("score"))


def forest_scores(
    ix: PostingsIndex,
    trees: list,
    positional_ix: PostingsIndex | None = None,
    with_docs: bool = False,
    persist: bool = False,
) -> tuple[list[DataFrame | None], DataFrame | None]:
    """Execute a FOREST of boolean trees over ONE shared decode pass:
    leaf ids are assigned forest-wide, every tree's posting leaves go
    through a single ``term IN (...)``-pushed scan and ONE
    groupBy(doc_id) shuffle, and each tree then gates/scores natively
    over the shared per-doc hit array.  This is the ``_msearch``
    execution shape: a 10-panel dashboard costs one postings scan,
    not ten.

    Returns (per-tree results, shared hit frame).  When ``persist``
    the shared frame (hit arrays joined to docs) is persisted so the
    N downstream per-tree actions reuse the decode+shuffle instead of
    re-running it; the caller owns ``.unpersist()`` via the returned
    handle."""
    per_tree: list[tuple[bool, list]] = []
    all_posting: list[TermLeaf] = []
    for tree in trees:
        leaves: list = []
        _walk(tree, leaves)
        pls = [l for l in leaves if isinstance(l, TermLeaf)]
        fls = [l for l in leaves if isinstance(l, FieldLeaf)]
        trivial = not leaves and not _has_const_wrapper(tree)
        per_tree.append((trivial, fls))
        all_posting.extend(pls)
    for i, leaf in enumerate(all_posting):
        leaf.leaf_id = i

    hits_df = _forest_hits(ix, all_posting, positional_ix)

    # ONE docs-anchored frame shared by every tree of the batch --
    # persisted, it holds the decode + shuffle output exactly once.
    anchored: DataFrame | None = None
    if any(not trivial for trivial, _ in per_tree):
        if hits_df is not None:
            anchored = ix.docs.join(hits_df, "doc_id", "left")
        else:
            anchored = ix.docs.withColumn(
                "_hits", F.lit(None).cast(_EMPTY_HITS))
        if persist:
            anchored = anchored.persist()

    results: list[DataFrame | None] = []
    for tree, (trivial, fls) in zip(trees, per_tree):
        if trivial:
            results.append(None)
            continue
        results.append(
            _tree_result(ix, tree, hits_df, fls, with_docs,
                         anchored=anchored)
        )
    return results, anchored


class _TokensCompiler(_Compiler):
    """Evaluates the SAME boolean tree directly over a token-array
    column instead of postings hits — the percolator's exact phase:
    rules run against a raw document batch, no index required. Phrase
    windows check positions natively over the array."""

    def __init__(self, toks: Column):
        super().__init__(hits_col=None)
        self.toks = toks

    def leaf_matched(self, leaf: TermLeaf) -> Column:
        t = self.toks
        if leaf.kind == "term":
            return F.array_contains(t, leaf.text)
        if leaf.kind == "prefix":
            return F.exists(t, lambda x: x.startswith(leaf.text))
        if leaf.kind == "wildcard":
            return F.exists(t, lambda x: x.like(_wild_to_like(leaf.text)))
        if leaf.kind == "regexp":
            return F.exists(t, lambda x: x.rlike(f"^(?:{leaf.text})$"))
        if leaf.kind == "phrase":
            words = tokenize_py(leaf.text)
            if not words:
                return F.lit(False)
            n = len(words)
            slop = leaf.slop or 0
            # short docs return False BEFORE the start sequence is
            # built: sequence(1, 0) is DESCENDING in Spark ([1, 0])
            # and element_at(t, 0) throws — when() gates per row
            if slop == 0:
                # exists i in [1, size-n+1]: t[i+j] == w_j for all j
                # (element_at is 1-based)
                body = F.exists(
                    F.sequence(F.lit(1), F.size(t) - n + 1),
                    lambda i: reduce(
                        Column.__and__,
                        [F.element_at(t, i + j) == words[j]
                         for j in range(n)],
                    ),
                )
            else:
                # sloppy phrase, SAME contract as the positional
                # path (positional.py proximity_scores): an ordered
                # occurrence with total gap (p_last - p_first) -
                # (n-1) <= slop, i.e. an ordered subsequence inside
                # some n+slop-token window. Greedy leftmost matching
                # inside the window is complete for subsequence
                # existence — one aggregate fold per start.
                warr = F.array(*[F.lit(w) for w in words])
                win = n + slop

                def _win_ok(i):
                    return F.aggregate(
                        F.slice(t, i, win), F.lit(0),
                        lambda acc, x: F.when(
                            (acc < n)
                            & (x == F.element_at(warr, acc + 1)),
                            acc + 1,
                        ).otherwise(acc),
                    ) == n

                body = F.exists(
                    F.sequence(F.lit(1), F.size(t) - n + 1), _win_ok)
            return F.when(F.size(t) >= n, body).otherwise(F.lit(False))
        raise ValueError(
            f"percolator rules don't support {leaf.kind!r} clauses")

    def leaf_contrib(self, leaf: TermLeaf) -> Column:
        # boolean context: percolation never ranks
        return self.leaf_matched(leaf).cast("double")


def tokens_tree_predicate(tree, toks: Column) -> Column:
    """Boolean Column: does a doc (token array + field columns) match
    the parsed query_string tree? Native expressions only."""
    return _TokensCompiler(toks).matched(tree)


def tree_scores(
    ix: PostingsIndex,
    tree,
    positional_ix: PostingsIndex | None = None,
    with_docs: bool = False,
) -> DataFrame | None:
    """Execute a parsed/compiled boolean tree: ONE DataFrame DAG over
    the shared decode pass, returning every matched doc as
    (doc_id, score) -- plus the docs-table columns when ``with_docs``
    (the search-body aggregations path needs them). Returns None for
    an empty tree (caller decides match_all vs match_none)."""
    leaves: list = []
    _walk(tree, leaves)
    posting_leaves = [l for l in leaves if isinstance(l, TermLeaf)]
    field_leaves = [l for l in leaves if isinstance(l, FieldLeaf)]
    for i, leaf in enumerate(posting_leaves):
        leaf.leaf_id = i
    if not leaves and not _has_const_wrapper(tree):
        return None
    hits_df = _forest_hits(ix, posting_leaves, positional_ix)
    return _tree_result(ix, tree, hits_df, field_leaves, with_docs)


def query_string_topk(
    ix: PostingsIndex,
    q: str,
    k: int = 10,
    positional_ix: PostingsIndex | None = None,
    default_operator: str = "OR",
) -> DataFrame:
    """Execute a query_string against the index. Phrase clauses need a
    positional index (pass the same index if it was built positional).
    Returns (doc_id, score)."""
    tree = parse_query_string(q, default_operator=default_operator)
    scored = tree_scores(ix, tree, positional_ix=positional_ix)
    if scored is None:
        # nothing parsed ('*', '', pure wildcards): match_all with
        # constant score 1.0 — the Kibana default query; the body
        # dispatcher maps the same tree to match_all, and the two
        # surfaces must agree
        return (ix.docs.select("doc_id", F.lit(1.0).alias("score"))
                .orderBy(F.asc("doc_id")).limit(k))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
