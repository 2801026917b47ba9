"""query_string parser + executor -- the DSL the reference's
dashboards actually speak.

Every saved search / visualization in the reference ships a Lucene
``query_string`` (reference saved_objects/each-dashboard/*.ndjson,
e.g. ``eventSource:signin* AND NOT responseElements...``); the loader
never parses it -- OpenSearch does. This module rebuilds the
commonly-used subset natively:

    term            bare term          -> should clause (default OR)
    +term           required           -> must clause
    -term, NOT term excluded           -> must_not clause
    term^2.5        per-clause boost
    "a b c"         exact phrase       -> phrase clause (positional ix)
    pre*            prefix             -> constant-score clause
    term~ / term~2  fuzzy              -> dictionary-expansion clause
    field:value     keyword filter     -> non-scoring filter context
    -field:value    keyword exclusion
    AND             upgrades adjacent bare terms to must
    OR              explicit default (no-op)

Parsing happens ON THE DRIVER at plan time (strings are metadata);
execution composes the existing engine primitives into ONE DataFrame
DAG: every scoring clause contributes (doc_id, score, clause_id) rows,
a single groupBy(doc_id) sums contributions and counts matched must
clauses, filters/exclusions apply as broadcast (anti-)joins, and the
top-k cut is TakeOrderedAndProject. Scoring follows Lucene: a doc's
score is the sum over matching clauses; must clauses gate membership
but score like any other clause.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import tokenize_py
from ..bm25 import B, K1, idf as _idf
from .build import PostingsIndex
from .query import decode_blocks

_TOKEN_RE = re.compile(
    r"""
    \s*(
        "(?P<phrase>[^"]*)"              # quoted phrase
        | (?P<word>[^\s"]+)              # anything else up to space
    )
    """,
    re.VERBOSE,
)


@dataclass
class Clause:
    kind: str              # term | phrase | prefix | fuzzy
    text: str
    occur: str = "should"  # must | should | must_not
    boost: float = 1.0
    max_edits: int = 1


@dataclass
class QuerySpec:
    clauses: list[Clause] = field(default_factory=list)
    filters: list[tuple[str, str]] = field(default_factory=list)
    filter_nots: list[tuple[str, str]] = field(default_factory=list)


def parse_query_string(q: str) -> QuerySpec:
    """Driver-side parse of the query_string subset above."""
    spec = QuerySpec()
    raw: list[tuple[str | None, str | None]] = []
    for m in _TOKEN_RE.finditer(q):
        raw.append((m.group("phrase"), m.group("word")))

    pending_not = False
    upgrade_next = False
    # index of the most recent clause IF the most recent parsed item
    # was a clause (None after a filter): AND binds to adjacent ITEMS,
    # and filters are already conjunctive, so an AND touching a filter
    # upgrades nothing on that side.
    last_clause_idx: int | None = None

    def added_clauses(start: int) -> None:
        nonlocal upgrade_next, last_clause_idx
        if upgrade_next:
            for i in range(start, len(spec.clauses)):
                if spec.clauses[i].occur == "should":
                    spec.clauses[i].occur = "must"
            upgrade_next = False
        last_clause_idx = len(spec.clauses) - 1

    for phrase, word in raw:
        if word is not None and word.upper() == "OR":
            continue
        if word is not None and word.upper() == "AND":
            if last_clause_idx is not None and (
                spec.clauses[last_clause_idx].occur == "should"
            ):
                spec.clauses[last_clause_idx].occur = "must"
            upgrade_next = True
            continue
        if word is not None and word.upper() == "NOT":
            pending_not = True
            continue

        occur = "should"
        text = word if word is not None else None
        if text is not None:
            if text.startswith("+"):
                occur, text = "must", text[1:]
            elif text.startswith("-"):
                occur, text = "must_not", text[1:]
        if pending_not:
            occur = "must_not"
            pending_not = False

        if phrase is not None:
            start = len(spec.clauses)
            spec.clauses.append(Clause("phrase", phrase, occur))
            added_clauses(start)
            continue
        if not text:
            continue

        if ":" in text:  # field filter (non-scoring, keyword exact)
            fieldname, value = text.split(":", 1)
            if occur == "must_not":
                spec.filter_nots.append((fieldname, value))
            else:
                spec.filters.append((fieldname, value))
            upgrade_next = False    # AND consumed by the filter
            last_clause_idx = None
            continue

        boost = 1.0
        bm = re.match(r"^(.*)\^(\d+(?:\.\d+)?)$", text)
        if bm:
            text, boost = bm.group(1), float(bm.group(2))

        start = len(spec.clauses)
        fm = re.match(r"^(.*)~(\d*)$", text)
        if fm and fm.group(1):
            spec.clauses.append(
                Clause("fuzzy", fm.group(1).lower(), occur, boost,
                       max_edits=int(fm.group(2) or 1))
            )
        elif text.endswith("*") and len(text) > 1:
            spec.clauses.append(
                Clause("prefix", text[:-1].lower(), occur, boost)
            )
        else:
            for t in tokenize_py(text):
                spec.clauses.append(Clause("term", t, occur, boost))
        if len(spec.clauses) > start:
            added_clauses(start)
    return spec


def _term_scores(ix: PostingsIndex, terms_with_weights: dict[str, float]) -> DataFrame:
    """(doc_id, term, contrib): one decode over ALL needed terms, the
    per-term weight (boost * idf) folded into a literal map."""
    stats = {
        r["term"]: int(r["df"])
        for r in ix.term_stats.filter(
            F.col("term").isin(list(terms_with_weights))
        ).select("term", "df").collect()
    }
    present = {t: w for t, w in terms_with_weights.items() if t in stats}
    spark = ix.postings.sparkSession
    if not present:
        return spark.createDataFrame([], "term string, doc_id long, contrib double")
    wmap = F.create_map(
        *[
            F.lit(x)
            for t, w in present.items()
            for x in (t, float(w * _idf(ix.n_docs, stats[t])))
        ]
    )
    decoded = decode_blocks(ix.postings.filter(F.col("term").isin(list(present))))
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    return decoded.select(
        "term", "doc_id",
        (wmap[F.col("term")] * tf
         / (tf + K1 * (1.0 - B + B * dl / F.lit(ix.avgdl)))).alias("contrib"),
    )


def _escape_like(s: str) -> str:
    """Escape LIKE metacharacters so a user prefix is matched
    literally ('_' in a prefix must not act as a wildcard)."""
    return s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")


def _fuzzy_variants(ix: PostingsIndex, text: str, max_edits: int) -> list[str]:
    return [
        r["term"]
        for r in ix.term_stats.filter(
            F.levenshtein(F.col("term"), F.lit(text)) <= max_edits
        ).select("term").collect()
    ]


def _field_pred(value: str) -> F.Column:
    """Filter value -> predicate column builder: a trailing '*' means
    prefix match (the dashboards' 'eventSource:signin*' shape)."""
    def pred(col: F.Column) -> F.Column:
        if value.endswith("*") and len(value) > 1:
            return col.like(_escape_like(value[:-1]) + "%")
        return col == value

    return pred


def query_string_topk(
    ix: PostingsIndex,
    q: str,
    k: int = 10,
    positional_ix: PostingsIndex | None = None,
) -> DataFrame:
    """Execute a query_string against the index. Phrase clauses need a
    positional index (pass the same index if it was built positional).
    Returns (doc_id, score)."""
    spec = parse_query_string(q)
    spark = ix.postings.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")

    # rows: (doc_id, contrib, must_key) -- must_key identifies WHICH
    # must requirement the row satisfies ('t:<term>' for must terms,
    # 'c:<clause idx>' for must non-term clauses, NULL otherwise), so
    # the same term appearing in several clauses, or '+foo foo',
    # cannot double-count or under-count the must gate.
    parts: list[DataFrame] = []
    not_parts: list[DataFrame] = []  # (doc_id) exclusion sets

    must_terms = {
        c.text for c in spec.clauses
        if c.kind == "term" and c.occur == "must"
    }
    must_nonterm_ids = [
        cid for cid, c in enumerate(spec.clauses)
        if c.kind != "term" and c.occur == "must"
    ]
    n_must = len(must_terms) + len(must_nonterm_ids)

    # all plain term clauses share ONE decode pass; weights of a
    # repeated term add (Lucene's repeated-clause behavior)
    term_weights: dict[str, float] = {}
    for c in spec.clauses:
        if c.kind == "term" and c.occur != "must_not":
            term_weights[c.text] = term_weights.get(c.text, 0.0) + c.boost
    if term_weights:
        ts = _term_scores(ix, term_weights)
        must_key = (
            F.when(
                F.col("term").isin(list(must_terms)),
                F.concat(F.lit("t:"), F.col("term")),
            )
            if must_terms
            else F.lit(None).cast("string")
        )
        parts.append(
            ts.select("doc_id", "contrib", must_key.alias("must_key"))
        )

    def clause_key(cid: int) -> F.Column:
        if cid in must_nonterm_ids:
            return F.lit(f"c:{cid}")
        return F.lit(None).cast("string")

    for cid, c in enumerate(spec.clauses):
        if c.occur == "must_not":
            if c.kind == "term":
                toks = tokenize_py(c.text) or [c.text]
                not_parts.append(
                    decode_blocks(
                        ix.postings.filter(F.col("term").isin(toks))
                    ).select("doc_id").distinct()
                )
            elif c.kind == "prefix":
                not_parts.append(
                    decode_blocks(
                        ix.postings.filter(
                            F.col("term").like(_escape_like(c.text) + "%")
                        )
                    ).select("doc_id").distinct()
                )
            elif c.kind == "fuzzy":
                variants = _fuzzy_variants(ix, c.text, c.max_edits)
                if variants:
                    not_parts.append(
                        decode_blocks(
                            ix.postings.filter(F.col("term").isin(variants))
                        ).select("doc_id").distinct()
                    )
            elif c.kind == "phrase":
                if positional_ix is None:
                    raise ValueError("phrase clause needs a positional index")
                from .positional import phrase_scores

                not_parts.append(
                    phrase_scores(positional_ix, c.text).select("doc_id")
                )
            continue
        if c.kind == "prefix":
            matched = decode_blocks(
                ix.postings.filter(
                    F.col("term").like(_escape_like(c.text) + "%")
                )
            ).select("doc_id").distinct()
            parts.append(
                matched.select(
                    "doc_id", F.lit(float(c.boost)).alias("contrib"),
                    clause_key(cid).alias("must_key"),
                )
            )
        elif c.kind == "fuzzy":
            variants = _fuzzy_variants(ix, c.text, c.max_edits)
            if variants:
                vs = _term_scores(ix, {v: c.boost for v in variants})
                parts.append(
                    vs.select(
                        "doc_id", "contrib",
                        clause_key(cid).alias("must_key"),
                    )
                )
        elif c.kind == "phrase":
            if positional_ix is None:
                raise ValueError("phrase clause needs a positional index")
            from .positional import phrase_scores

            ph = phrase_scores(positional_ix, c.text)
            parts.append(
                ph.select(
                    "doc_id",
                    (F.col("score") * float(c.boost)).alias("contrib"),
                    clause_key(cid).alias("must_key"),
                )
            )

    filters_exist = bool(spec.filters or spec.filter_nots)

    if not parts:
        if not filters_exist:
            return empty
        # filter-only query ('lang:en'): constant-score match of the
        # filter context, the bool.filter-without-scoring-clauses shape
        per_doc = ix.docs.select(
            "doc_id", F.lit(1.0).alias("score")
        )
    else:
        allparts = parts[0]
        for p in parts[1:]:
            allparts = allparts.unionByName(p)
        per_doc = allparts.groupBy("doc_id").agg(
            F.sum("contrib").alias("score"),
            F.countDistinct("must_key").alias("_nm"),
        )
        if n_must:
            per_doc = per_doc.filter(F.col("_nm") == n_must)
        per_doc = per_doc.select("doc_id", "score")

    for np_ in not_parts:
        per_doc = per_doc.join(F.broadcast(np_), "doc_id", "left_anti")

    if filters_exist:
        keep = ix.docs
        for fieldname, value in spec.filters:
            keep = keep.filter(_field_pred(value)(F.col(fieldname)))
        for fieldname, value in spec.filter_nots:
            pred = _field_pred(value)(F.col(fieldname))
            keep = keep.filter(F.col(fieldname).isNull() | ~pred)
        per_doc = per_doc.join(keep.select("doc_id"), "doc_id", "left_semi")

    return (
        per_doc.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
