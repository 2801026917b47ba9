r"""Span queries over the positional index: ``span_term`` /
``span_near`` (ordered + unordered, slop) / ``span_first`` /
``span_or`` / ``span_not`` / ``span_within`` / ``span_containing``.

Reference semantics target: the Lucene span family OpenSearch exposes
as query DSL (used in security content for "X within N tokens of Y,
in order" rules; the reference's filter bar accepts the ``span_*``
JSON nodes).  A span is a (doc, start, end) position interval; span
queries compose intervals, and a doc scores by how many (and how
tight) composed intervals it contains.

Documented semantics (deterministic, shared with the pytest twin):

* ``span_term t`` — one span per occurrence: (pos, pos+1), width 1.
* ``span_near(clauses, slop, in_order)`` — one span per combination
  of one child span each, pairwise NON-OVERLAPPING, ordered when
  ``in_order`` (child i+1 starts at-or-after child i ends); the
  enclosing interval is (min start, max end) and its total gap
  ``(end - start) - Σ child widths`` must be ``<= slop``.
* ``span_first(match, end)`` — match spans with ``span.end <= end``.
* ``span_or(clauses)`` — the distinct union of child spans.
* ``span_within(little, big)`` / ``span_containing(little, big)`` —
  enclosure (little ⊆ big): within returns the little spans,
  containing the big spans, each once.
* ``span_not(include, exclude)`` — include spans overlapping no
  exclude span in the same doc.

Scoring mirrors the engine's sloppy-phrase shape (Lucene
SpanScorer's sloppyFreq): each matched span weighs
``1 / (1 + gap)``; the doc's span frequency is the sum, fed to BM25
with idf = Σ idf over every leaf-term slot in the tree.

Plan (100 TB posture): ONE term-pruned positional scan decodes every
leaf term (``In(term, ...)`` reaches parquet); near-composition is a
doc_id join chain — all keys are doc_id, so the joins co-locate on
one shuffle — with a window predicate ``|start_i - start_0| <= Σw +
slop`` bounding per-doc combinations by the window width, never
all-pairs.  No driver-side position work, no row-Python.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import tokenize_py
from ..bm25 import B, K1, idf
from .build import PostingsIndex
from .positional import decode_blocks_positions

__all__ = ["span_scores", "span_topk", "span_leaf_terms"]


def _one(spec: dict) -> tuple[str, object]:
    if len(spec) != 1:
        raise ValueError(f"span node must have exactly one key: {spec}")
    return next(iter(spec.items()))


def _term_of(body) -> str:
    # {"span_term": {"text": "t"}} or {"span_term": {"text": {"value": "t"}}}
    _, v = _one(body)
    tok = v["value"] if isinstance(v, dict) else v
    toks = tokenize_py(str(tok))
    if len(toks) != 1:
        raise ValueError(f"span_term must analyze to one token: {tok!r}")
    return toks[0]


def _field_of(body) -> str:
    """The leaf's own field — the span_term's key (the wire shape:
    ``{"span_term": {"title": "x"}}`` targets the ``title`` field)."""
    f, _ = _one(body)
    return f


def span_leaf_terms(node: dict) -> list[str]:
    """Every leaf term in tree order (duplicates kept — each slot
    contributes its idf, the PhraseQuery convention)."""
    kind, body = _one(node)
    if kind == "span_term":
        return [_term_of(body)]
    if kind == "span_near":
        return [t for c in body["clauses"] for t in span_leaf_terms(c)]
    if kind == "span_or":
        return [t for c in body["clauses"] for t in span_leaf_terms(c)]
    if kind == "span_first":
        return span_leaf_terms(body["match"])
    if kind == "span_not":
        # exclude terms gate but don't score (Lucene SpanNot scores
        # the include side only)
        return span_leaf_terms(body["include"])
    if kind == "span_within":
        # Lucene SpanWithin returns (and scores) the LITTLE side
        return span_leaf_terms(body["little"])
    if kind == "span_containing":
        # Lucene SpanContaining returns (and scores) the BIG side
        return span_leaf_terms(body["big"])
    if kind == "span_field_masking":
        return span_leaf_terms(body["query"])
    raise ValueError(f"unsupported span node: {kind!r}")


def _field_leaf_terms(node: dict) -> list[tuple[str, str]]:
    """SCORING slots as (leaf's own field, term) in tree order —
    the per-slot idf comes from the leaf field's own statistics
    (masking changes the REPORTED field, not the stats source)."""
    kind, body = _one(node)
    if kind == "span_term":
        return [(_field_of(body), _term_of(body))]
    if kind in ("span_near", "span_or"):
        return [ft for c in body["clauses"]
                for ft in _field_leaf_terms(c)]
    if kind == "span_first":
        return _field_leaf_terms(body["match"])
    if kind == "span_not":
        return _field_leaf_terms(body["include"])
    if kind == "span_within":
        return _field_leaf_terms(body["little"])
    if kind == "span_containing":
        return _field_leaf_terms(body["big"])
    if kind == "span_field_masking":
        return _field_leaf_terms(body["query"])
    raise ValueError(f"unsupported span node: {kind!r}")


def _all_terms(node: dict) -> list[tuple[str, str]]:
    """(field, term) leaves INCLUDING span_not excludes (for the one
    pruned decode pass per field)."""
    kind, body = _one(node)
    if kind == "span_not":
        return _all_terms(body["include"]) + _all_terms(body["exclude"])
    if kind in ("span_within", "span_containing"):
        return _all_terms(body["little"]) + _all_terms(body["big"])
    if kind in ("span_near", "span_or"):
        return [t for c in body["clauses"] for t in _all_terms(c)]
    if kind == "span_first":
        return _all_terms(body["match"])
    if kind == "span_field_masking":
        return _all_terms(body["query"])
    return _field_leaf_terms(node)


def _reported_field(node: dict, text_field: str) -> str:
    """The field the ROOT of the tree reports (masking overrides),
    without building any frame — used to pick the norms source."""
    kind, body = _one(node)
    if kind == "span_field_masking":
        return str(body["field"])
    if kind == "span_term":
        return _field_of(body)
    if kind in ("span_near", "span_or"):
        return _reported_field(body["clauses"][0], text_field)
    if kind == "span_first":
        return _reported_field(body["match"], text_field)
    if kind == "span_not":
        return _reported_field(body["include"], text_field)
    if kind == "span_within":
        return _reported_field(body["little"], text_field)
    if kind == "span_containing":
        return _reported_field(body["big"], text_field)
    return text_field


def _same_field(kind: str, fields: list[str]) -> str:
    """Lucene's same-field composition rule: every child of a
    composite span must REPORT the same field (span_field_masking
    exists precisely to satisfy this across fields)."""
    if len(set(fields)) > 1:
        raise ValueError(
            f"{kind}: clauses must report one field, got {fields} "
            "(wrap cross-field clauses in span_field_masking)")
    return fields[0]


def _spans(decoded: DataFrame, node: dict) -> tuple[DataFrame, str]:
    """Recursive span construction: ((doc_id, start, end, w) frame,
    reported field)."""
    kind, body = _one(node)

    if kind == "span_term":
        t, fld = _term_of(body), _field_of(body)
        frame = decoded.filter(
            (F.col("term") == t) & (F.col("fld") == fld)).select(
            "doc_id", F.col("pos").alias("start"),
            (F.col("pos") + 1).alias("end"), F.lit(1).alias("w"))
        return frame, fld

    if kind == "span_field_masking":
        # Lucene FieldMaskingSpanQuery: run the wrapped span on ITS
        # OWN field's positions, report the spans as ``field`` so an
        # enclosing composite accepts them.  Positions compare raw —
        # meaningful only for same-analyzer fields, the upstream
        # caveat verbatim.
        child, _ = _spans(decoded, body["query"])
        return child, str(body["field"])

    if kind == "span_first":
        child, fld = _spans(decoded, body["match"])
        return child.filter(F.col("end") <= int(body["end"])), fld

    if kind == "span_or":
        parts, fields = zip(*[_spans(decoded, c)
                              for c in body["clauses"]])
        fld = _same_field(kind, list(fields))
        return reduce(DataFrame.unionByName, parts).dropDuplicates(
            ["doc_id", "start", "end", "w"]), fld

    if kind == "span_not":
        (inc_f, fi), (exc_f, fx) = (_spans(decoded, body["include"]),
                                    _spans(decoded, body["exclude"]))
        fld = _same_field(kind, [fi, fx])
        inc = inc_f.alias("i")
        exc = exc_f.alias("x")
        overlap = (
            (F.col("i.doc_id") == F.col("x.doc_id"))
            & (F.col("i.start") < F.col("x.end"))
            & (F.col("x.start") < F.col("i.end"))
        )
        return inc.join(exc, overlap, "left_anti").select(
            "i.doc_id", "i.start", "i.end", "i.w"), fld

    if kind in ("span_within", "span_containing"):
        # enclosure, not mere overlap: little ⊆ big. within keeps the
        # little spans, containing keeps the big spans — each returned
        # span once (left_semi), the Lucene multiset.
        (little_f, fl), (big_f, fb) = (_spans(decoded, body["little"]),
                                       _spans(decoded, body["big"]))
        fld = _same_field(kind, [fl, fb])
        little = little_f.alias("l")
        big = big_f.alias("b")
        enclosed = (
            (F.col("l.doc_id") == F.col("b.doc_id"))
            & (F.col("l.start") >= F.col("b.start"))
            & (F.col("l.end") <= F.col("b.end"))
        )
        if kind == "span_within":
            return little.join(big, enclosed, "left_semi").select(
                "l.doc_id", "l.start", "l.end", "l.w"), fld
        return big.join(little, enclosed, "left_semi").select(
            "b.doc_id", "b.start", "b.end", "b.w"), fld

    if kind == "span_near":
        clauses = body["clauses"]
        slop = int(body.get("slop", 0))
        in_order = bool(body.get("in_order", True))
        pairs = [_spans(decoded, c) for c in clauses]
        children = [f for f, _fl in pairs]
        fld = _same_field(kind, [fl for _f, fl in pairs])
        n = len(children)
        if n == 1:
            return children[0], fld
        cur = children[0].select(
            "doc_id", F.col("start").alias("_s0"),
            F.col("end").alias("_e0"), F.col("w").alias("_w0"))
        # window bound: any child span of a valid combination starts
        # within (sum of widths + slop) of child 0's start
        win = sum(len(span_leaf_terms(c)) for c in clauses) + slop
        for i in range(1, n):
            ci = children[i].select(
                "doc_id", F.col("start").alias(f"_s{i}"),
                F.col("end").alias(f"_e{i}"), F.col("w").alias(f"_w{i}"))
            cur = cur.join(ci, "doc_id").filter(
                (F.col(f"_s{i}") >= F.col("_s0") - F.lit(win))
                & (F.col(f"_s{i}") <= F.col("_s0") + F.lit(win)))
        preds = []
        for i in range(n):
            for j in range(i + 1, n):
                if in_order and j == i + 1:
                    preds.append(F.col(f"_s{j}") >= F.col(f"_e{i}"))
                elif not in_order:
                    preds.append(
                        (F.col(f"_s{j}") >= F.col(f"_e{i}"))
                        | (F.col(f"_s{i}") >= F.col(f"_e{j}")))
        cur = cur.filter(reduce(lambda a, b: a & b, preds))
        start = (F.col("_s0") if in_order
                 else F.least(*[F.col(f"_s{i}") for i in range(n)]))
        end = (F.col(f"_e{n-1}") if in_order
               else F.greatest(*[F.col(f"_e{i}") for i in range(n)]))
        w = reduce(lambda a, b: a + b,
                   [F.col(f"_w{i}") for i in range(n)])
        gap_ok = (end - start - w) <= F.lit(slop)
        return cur.filter(gap_ok).select(
            "doc_id", start.alias("start"), end.alias("end"),
            w.alias("w")), fld

    raise ValueError(f"unsupported span node: {kind!r}")


def span_scores(ix: PostingsIndex, node: dict,
                field_ixs: dict[str, PostingsIndex] | None = None,
                text_field: str = "text") -> DataFrame:
    """(doc_id, score) over the full span match set, for composition
    or pagination.  ``ix`` must be a POSITIONAL index
    (``build_positional_index``).

    ``field_ixs`` maps OTHER field names to their positional indexes
    — required only when the tree contains leaves on fields other
    than ``text_field`` (the span_field_masking cross-field case).
    Per-slot idf uses the slot field's own statistics; doc-length
    norms prefer the tree's REPORTED root field (the ES documented
    behavior: masking scores with the mask-target field's norms),
    falling back to any field the doc matched in."""
    spark = ix.postings.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    ixs = {text_field: ix, **(field_ixs or {})}
    node = rewrite_span_multi(node, ix, field_ixs=field_ixs,
                              text_field=text_field)
    if node is None:
        return empty          # a span_multi expanded to no vocabulary
    terms = _all_terms(node)
    if not terms:
        return empty
    for f in {f for f, _t in terms}:
        if f not in ixs:
            raise ValueError(
                f"span leaf on field {f!r} needs a positional index "
                "(pass field_ixs= or name the leaf after text_field)")
    dfs: dict[tuple[str, str], int] = {}
    for f in {f for f, _t in terms}:
        want = list({t for ff, t in terms if ff == f})
        for r in (ixs[f].term_stats.filter(F.col("term").isin(want))
                  .collect()):
            dfs[(f, r["term"])] = int(r["df"])

    scoring = _field_leaf_terms(node)
    if any(ft not in dfs for ft in scoring):
        return empty          # a required leaf term is absent
    idf_sum = float(sum(idf(ixs[f].n_docs, dfs[(f, t)])
                        for f, t in scoring))

    root_field = _reported_field(node, text_field)
    decodes = []
    # norms priority: the reported root field first, then the others
    for f in sorted({f for f, _t in terms},
                    key=lambda x: (x != root_field, x)):
        present = [t for ff, t in dfs if ff == f]
        if not present:
            continue
        decodes.append(decode_blocks_positions(
            ixs[f].postings.filter(F.col("term").isin(present)))
            .select("doc_id", "dl", "term", "pos")
            .withColumn("fld", F.lit(f)))
    decoded = reduce(DataFrame.unionByName, decodes)
    prio = {f: i for i, f in enumerate(
        sorted({f for f, _t in terms},
               key=lambda x: (x != root_field, x)))}
    prio_col = F.coalesce(*[F.when(F.col("fld") == f, F.lit(i))
                            for f, i in prio.items()]) \
        if len(prio) > 1 else F.lit(0)
    dls = (decoded.select("doc_id", "dl",
                          prio_col.alias("_prio"))
           .groupBy("doc_id").agg(F.min_by("dl", "_prio").alias("dl")))

    spans, _root = _spans(
        decoded.select("doc_id", "dl", "term", "pos", "fld"), node)
    weight = F.lit(1.0) / (
        F.lit(1.0) + (F.col("end") - F.col("start") - F.col("w"))
        .cast("double"))
    freq = (spans.groupBy("doc_id").agg(F.sum(weight).alias("ptf"))
            .join(dls, "doc_id"))
    ptf = F.col("ptf")
    dl = F.col("dl").cast("double")
    # length normalization from the REPORTED root field's index (dl
    # and avgdl must come from the same field or the ratio skews);
    # fall back to the primary when the mask target has no index
    avgdl = ixs.get(root_field, ix).avgdl
    score = (F.lit(idf_sum) * ptf
             / (ptf + K1 * (1.0 - B + B * dl / F.lit(avgdl))))
    return freq.select("doc_id", score.alias("score"))


def span_topk(ix: PostingsIndex, node: dict, k: int = 10,
              field_ixs: dict[str, PostingsIndex] | None = None,
              text_field: str = "text") -> DataFrame:
    return (span_scores(ix, node, field_ixs=field_ixs,
                        text_field=text_field)
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


# ---------------------------------------------------------------------------
# span_multi: multi-term query wrapped as a span clause
# ---------------------------------------------------------------------------

_SPAN_MULTI_MAX = 128


def _wc_regex(pat: str) -> str:
    """Lucene wildcard (* any run, ? one char) -> anchored regex,
    everything else literal."""
    import re as _re

    out = []
    for ch in pat:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "".join(out)


def _span_or_of(terms: list[str], field: str = "text") -> dict | None:
    if not terms:
        return None
    if len(terms) == 1:
        return {"span_term": {field: terms[0]}}
    return {"span_or": {"clauses": [
        {"span_term": {field: t}} for t in terms]}}


def rewrite_span_multi(node: dict | None, ix: PostingsIndex,
                       max_expansions: int = _SPAN_MULTI_MAX,
                       field_ixs: dict[str, PostingsIndex] | None = None,
                       text_field: str = "text") -> dict | None:
    """Desugar every ``span_multi`` in the tree into a ``span_or`` of
    ``span_term`` clauses — Lucene's SpanMultiTermQueryWrapper with
    the top-terms rewrite: the wrapped prefix / wildcard / regexp /
    fuzzy query expands against the term DICTIONARY (term_stats,
    tiny vs postings), capped at ``max_expansions`` highest-df terms.
    A span_multi that expands to nothing poisons its conjunctive
    ancestors (None propagates like the intervals desugar): span_near
    / span_within / span_containing / span_first become None, span_or
    drops the arm, a span_not keeps its include side."""
    if node is None:
        return None
    kind, p = _one(node)
    if kind == "span_multi":
        ikind, ip = _one(p["match"])
        (field, spec), = ip.items()
        # expand against the LEAF field's own dictionary (the
        # span_field_masking cross-field case names another field)
        sub_ix = ({text_field: ix, **(field_ixs or {})}).get(field, ix)
        val = str(spec["value"] if isinstance(spec, dict) else spec)
        if ikind != "regexp":
            # terms are analyzer-lowercased; literal prefix/wildcard/
            # fuzzy values lower to match. A REGEXP must keep its
            # case: lowercasing would invert uppercase metaclasses
            # (\\D -> \\d matches the complement).
            val = val.lower()
        if ikind == "fuzzy":
            from .querystring import _fuzzy_variants
            fz = (spec.get("fuzziness", "AUTO")
                  if isinstance(spec, dict) else "AUTO")
            if isinstance(fz, str) and fz.upper().startswith("AUTO"):
                fz = 0 if len(val) < 3 else (1 if len(val) <= 5 else 2)
            terms = sorted(_fuzzy_variants(sub_ix, val, int(fz)))
            return _span_or_of(terms[:max_expansions], field)
        if ikind == "prefix":
            cond = F.col("term").startswith(val)
        elif ikind == "wildcard":
            cond = F.col("term").rlike(f"^(?:{_wc_regex(val)})$")
        elif ikind == "regexp":
            cond = F.col("term").rlike(f"^(?:{val})$")
        else:
            raise ValueError(
                f"span_multi wraps prefix/wildcard/regexp/fuzzy, "
                f"got {ikind!r}")
        terms = [r["term"] for r in sub_ix.term_stats.filter(cond)
                 .orderBy(F.desc("df"), F.asc("term"))
                 .limit(max_expansions).select("term").collect()]
        return _span_or_of(sorted(terms), field)
    if kind == "span_field_masking":
        inner = rewrite_span_multi(p["query"], ix, max_expansions,
                                   field_ixs, text_field)
        if inner is None:
            return None
        return {"span_field_masking": {**p, "query": inner}}
    if kind in ("span_near", "span_or"):
        kids = [rewrite_span_multi(c, ix, max_expansions,
                                   field_ixs, text_field)
                for c in p["clauses"]]
        if kind == "span_or":
            kids = [k for k in kids if k is not None]
            if not kids:
                return None
            return {"span_or": {**p, "clauses": kids}}
        if any(k is None for k in kids):
            return None
        return {"span_near": {**p, "clauses": kids}}
    if kind == "span_not":
        inc = rewrite_span_multi(p["include"], ix, max_expansions,
                             field_ixs, text_field)
        exc = rewrite_span_multi(p["exclude"], ix, max_expansions,
                             field_ixs, text_field)
        if inc is None:
            return None
        if exc is None:
            return inc
        return {"span_not": {**p, "include": inc, "exclude": exc}}
    if kind in ("span_within", "span_containing"):
        little = rewrite_span_multi(p["little"], ix, max_expansions,
                                    field_ixs, text_field)
        big = rewrite_span_multi(p["big"], ix, max_expansions,
                                 field_ixs, text_field)
        if little is None or big is None:
            return None
        return {kind: {**p, "little": little, "big": big}}
    if kind == "span_first":
        m = rewrite_span_multi(p["match"], ix, max_expansions,
                               field_ixs, text_field)
        if m is None:
            return None
        return {"span_first": {**p, "match": m}}
    return node


# ---------------------------------------------------------------------------
# intervals query -> span tree
# ---------------------------------------------------------------------------

_UNBOUNDED_GAPS = 1 << 30


def intervals_to_span(body: dict, ix: PostingsIndex | None = None) -> dict:
    """Desugar the OpenSearch ``intervals`` query onto the span
    executor (both are Lucene position-interval algebras; the span
    tree here reproduces the intervals MATCHING semantics — which
    docs, which position windows — while scoring follows this
    module's documented sloppy-span shape).

    ``{"intervals": {field: rule}}`` rules supported:

    * ``match`` — ``query`` analyzed to tokens; ``max_gaps``
      (default -1 = unbounded) -> span_near slop; ``ordered``
      (default False) -> in_order.
    * ``any_of`` — ``intervals`` list -> span_or.
    * ``all_of`` — ``intervals`` list + max_gaps/ordered -> span_near.
    * ``prefix`` — vocabulary expansion over ``ix.term_stats``
      (driver-side, bounded like the fuzzy path) -> span_or of
      span_terms.

    Returns ``None`` when the tree provably matches nothing (a
    prefix with no vocabulary expansion poisons its all_of/match
    ancestors and drops out of any_of).
    """
    field = "text"
    field_body = body
    if len(body) == 1 and isinstance(next(iter(body.values())), dict):
        # {"field": {rule...}} wrapper (the wire shape): the span
        # leaves carry THIS field so span_scores resolves them
        # against the right positional index (text_field= names the
        # primary; others come from field_ixs=)
        field, field_body = next(iter(body.items()))
    return _interval_rule(field_body, ix, str(field))


def _interval_rule(rule: dict, ix: PostingsIndex | None,
                   field: str = "text") -> dict | None:
    kind, p = _one(rule)
    if kind == "match":
        toks = tokenize_py(str(p["query"]))
        if not toks:
            raise ValueError("intervals match analyzed to no tokens")
        if len(toks) == 1:
            return {"span_term": {field: toks[0]}}
        gaps = int(p.get("max_gaps", -1))
        return {"span_near": {
            "clauses": [{"span_term": {field: t}} for t in toks],
            "slop": _UNBOUNDED_GAPS if gaps < 0 else gaps,
            "in_order": bool(p.get("ordered", False)),
        }}
    if kind == "any_of":
        kids = [_interval_rule(r, ix, field) for r in p["intervals"]]
        kids = [k for k in kids if k is not None]
        if not kids:
            return None
        return {"span_or": {"clauses": kids}}
    if kind == "all_of":
        kids = [_interval_rule(r, ix, field) for r in p["intervals"]]
        if any(k is None for k in kids):
            return None
        gaps = int(p.get("max_gaps", -1))
        return {"span_near": {
            "clauses": kids,
            "slop": _UNBOUNDED_GAPS if gaps < 0 else gaps,
            "in_order": bool(p.get("ordered", False)),
        }}
    if kind == "prefix":
        if ix is None:
            raise ValueError("intervals prefix needs the index "
                             "(vocabulary expansion)")
        pre = str(p["prefix"] if isinstance(p, dict) else p).lower()
        max_exp = int(p.get("max_expansions", 128)) \
            if isinstance(p, dict) else 128
        # Lucene rewrite bound: highest-df expansions first, capped --
        # an unbounded driver collect over a 'a*'-style prefix would
        # be a vocabulary-sized result at web scale
        terms = [r["term"] for r in ix.term_stats
                 .filter(F.col("term").startswith(pre))
                 .orderBy(F.desc("df"), F.asc("term"))
                 .limit(max_exp).select("term").collect()]
        if not terms:
            return None
        return {"span_or": {"clauses": [
            {"span_term": {field: t}} for t in sorted(terms)]}}
    raise ValueError(f"unsupported intervals rule: {kind!r}")
