"""Boolean queries + faceted search over the postings index —
the OpenSearch query-DSL shapes the reference's dashboards issue
(``bool`` with must/should/must_not, and ``terms`` aggregations over
the match set, ref saved_objects/each-dashboard/*.ndjson).

Lucene/OpenSearch semantics reproduced:

* ``must``   — every clause term must appear; contributes to score.
* ``should`` — optional; contributes to score when present.
* ``must_not`` — excluding filter; never contributes to score.
* score = Σ BM25(term, doc) over matched must+should terms.

Plan shape: one decode pass over the union of must/should/must_not
terms (term-pruned scan), a conditional aggregate per doc counting
matched must terms (== len(must) keeps the doc — the co-partitioned
sort-merge-join restatement of Lucene's conjunction), an anti-join
for must_not, then the usual score-sum + TakeOrdered.

Facets: ``search_facets`` computes the reference's
search-then-aggregate dashboards in ONE job over the match set —
top-k hits plus per-column value counts over ALL matches (not just
the page of hits), exactly like OpenSearch's hits + aggregations
response.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import tokenize_py
from .build import PostingsIndex
from .query import decode_blocks, score_col


def _decoded_scored(ix: PostingsIndex, terms: list[str]) -> DataFrame:
    """(term, doc_id, score-component) rows for the given terms."""
    blocks = ix.postings.filter(F.col("term").isin(terms))
    decoded = decode_blocks(blocks)
    tstats = ix.term_stats.filter(F.col("term").isin(terms)).select("term", "df")
    return (
        decoded.join(F.broadcast(tstats), "term")
        .withColumn("_s", score_col(ix.avgdl, ix.n_docs))
    )


def bool_topk(ix: PostingsIndex, must: list[str] | str = (),
              should: list[str] | str = (), must_not: list[str] | str = (),
              k: int = 10, minimum_should_match: int = 0,
              boosts: dict[str, float] | None = None) -> DataFrame:
    """Top-k for a bool query. Clause strings are analyzed with the
    shared tokenizer; duplicate terms within a clause are deduped
    (set semantics, like Lucene's BooleanQuery clause sets).
    ``minimum_should_match`` requires at least that many distinct
    should terms per doc; ``boosts`` multiplies a term's score
    contribution (the ``term^2`` query_string boost)."""
    def norm(c) -> list[str]:
        if isinstance(c, str):
            c = [c]
        out: list[str] = []
        for chunk in c:
            out.extend(tokenize_py(chunk))
        return list(dict.fromkeys(out))

    must_t, should_t, not_t = norm(must), norm(should), norm(must_not)
    spark = ix.postings.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    scoring = list(dict.fromkeys(must_t + should_t))
    if not scoring:
        if not not_t:
            return empty
        # pure-negative bool: match_all minus the exclusions (the
        # OpenSearch behavior, and this repo's own query_string Group
        # semantics) at filter-context score 0.0 — NOT an empty page
        excluded = (
            decode_blocks(ix.postings.filter(F.col("term").isin(not_t)))
            .select("doc_id").distinct()
        )
        return (
            ix.docs.select("doc_id")
            .join(excluded, "doc_id", "left_anti")
            .withColumn("score", F.lit(0.0))
            .orderBy(F.asc("doc_id"))
            .limit(k)
        )

    scored = _decoded_scored(ix, scoring)
    if boosts:
        bmap = F.create_map(
            *[F.lit(x) for t, b in boosts.items() for x in (t, float(b))]
        )
        scored = scored.withColumn(
            "_s", F.col("_s") * F.coalesce(bmap[F.col("term")], F.lit(1.0))
        )
    is_must = F.col("term").isin(must_t) if must_t else F.lit(False)
    is_should = F.col("term").isin(should_t) if should_t else F.lit(False)
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("_s").alias("score"),
        F.countDistinct(F.when(is_must, F.col("term"))).alias("_n_must"),
        F.countDistinct(F.when(is_should, F.col("term"))).alias("_n_should"),
    )
    if must_t:
        per_doc = per_doc.filter(F.col("_n_must") == len(must_t))
    if minimum_should_match > 0:
        per_doc = per_doc.filter(F.col("_n_should") >= minimum_should_match)
    if not_t:
        excl = decode_blocks(
            ix.postings.filter(F.col("term").isin(not_t))
        ).select("doc_id").distinct()
        per_doc = per_doc.join(excl, "doc_id", "left_anti")
    return (
        per_doc.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def multiterm_topk(ix: PostingsIndex, like_pattern: str,
                   k: int = 10) -> DataFrame:
    """Prefix/wildcard query (OpenSearch ``query_string`` ``pre*`` /
    ``wild*card`` shapes): every doc containing ANY term matching the
    SQL LIKE pattern scores a constant 1.0 — Lucene's
    ConstantScore(MultiTermQuery) rewrite — ties broken by doc_id.

    A prefix pattern (``abc%``) pushes down to the parquet term scan
    as StringStartsWith, so only the matching dictionary range is
    read (the term-sorted layout makes this a range scan, same as
    Lucene's term-dictionary seek)."""
    blocks = ix.postings.filter(F.col("term").like(like_pattern))
    matched = decode_blocks(blocks).select("doc_id").distinct()
    return (
        matched.select("doc_id", F.lit(1.0).alias("score"))
        .orderBy(F.asc("doc_id"))
        .limit(k)
    )


def dl_distance(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein distance — the exact function
    DuckDB exposes as ``damerau_levenshtein`` (the oracle twin), with
    a transposition as one primitive edit. O(len(a)*len(b)) on the
    driver over dictionary-candidate lists only."""
    la, lb = len(a), len(b)
    if not la:
        return lb
    if not lb:
        return la
    inf = la + lb
    # Lowrance-Wagner: last-seen row per alphabet symbol
    da: dict[str, int] = {}
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = inf
    for i in range(la + 1):
        d[i + 1][0] = inf
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = inf
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l_ = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,              # substitute
                d[i + 1][j] + 1,             # insert
                d[i][j + 1] + 1,             # delete
                d[k][l_] + (i - k - 1) + 1 + (j - l_ - 1),  # transpose
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def fuzzy_topk(ix: PostingsIndex, term: str, k: int = 10,
               max_edits: int = 1) -> DataFrame:
    """Fuzzy term query (OpenSearch ``term~`` / fuzziness=1): expand
    against the term dictionary by Damerau-Levenshtein distance — a
    transposition counts as ONE edit, Lucene's ``transpositions:
    true`` default — then score every matched variant with its own
    BM25 and sum per doc.

    The expansion is a scan of term_stats (the term dictionary — tiny
    relative to postings) with a native ``levenshtein`` prefilter at
    ``2 * max_edits`` (sound: lev <= 2*DL, each transposition costs at
    most two plain edits) refined to exact DL on the driver-side
    candidate list; matched terms then follow the ordinary
    pruned-decode path. (Lucene's FuzzyQuery blends dfs across
    variants; summing per-variant BM25 keeps the same candidates with
    a deterministic, cross-engine-reproducible scoring — documented
    deviation.)"""
    q = term.lower().strip()
    matched_terms = [
        r["term"]
        for r in ix.term_stats.filter(
            F.levenshtein(F.col("term"), F.lit(q)) <= 2 * max_edits
        ).select("term").collect()
        if dl_distance(r["term"], q) <= max_edits
    ]
    spark = ix.postings.sparkSession
    if not matched_terms:
        return spark.createDataFrame([], "doc_id long, score double")
    scored = _decoded_scored(ix, matched_terms)
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("_s").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def regexp_topk(ix: PostingsIndex, pattern: str, k: int = 10,
                max_expansions: int = 50) -> DataFrame:
    """Regexp query (OpenSearch ``regexp``): the pattern is matched
    against whole terms (Lucene regexps are implicitly anchored) over
    the term DICTIONARY — term_stats, tiny relative to postings — and
    the matched variants' postings are unioned under a constant score
    (Lucene's ConstantScore(MultiTermQuery) rewrite, same as
    :func:`multiterm_topk`).

    Lucene compiles the regex to an automaton intersected with the
    term-dictionary FST; the Spark-native equivalent is a dictionary
    scan with a codegen'd ``RLIKE`` predicate. The expansion is capped
    like Lucene's rewrite limits (``max_expansions``, highest-df terms
    kept first, ties by term); the matched set then drives an ``In``
    pushdown on the postings scan, so only matching dictionary rows'
    blocks are read."""
    matched_terms = [
        r["term"]
        for r in ix.term_stats
        .filter(F.col("term").rlike(f"^(?:{pattern})$"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansions)
        .select("term")
        .collect()
    ]
    spark = ix.postings.sparkSession
    if not matched_terms:
        return spark.createDataFrame([], "doc_id long, score double")
    blocks = ix.postings.filter(F.col("term").isin(matched_terms))
    matched = decode_blocks(blocks).select("doc_id").distinct()
    return (
        matched.select("doc_id", F.lit(1.0).alias("score"))
        .orderBy(F.asc("doc_id"))
        .limit(k)
    )


def term_suggest(ix: PostingsIndex, text: str, max_edits: int = 2,
                 size: int = 5) -> DataFrame:
    """Term suggester (OpenSearch ``suggest.term`` — the
    "did you mean" correction): for each analyzed input token, propose
    dictionary terms within ``max_edits`` Levenshtein distance, ranked
    the way OpenSearch's default sort does — edit distance ascending,
    then document frequency descending, then term — excluding the
    token itself.

    Pure dictionary work: the token list broadcasts against
    term_stats (a few rows vs. the dictionary's thousands), the
    distance predicate is native ``levenshtein``, and the per-token
    top-``size`` is a row_number window partitioned by token — no
    postings are touched at all, exactly like Lucene's
    DirectSpellChecker. Returns (token, suggestion, distance, df,
    rank)."""
    from pyspark.sql import Window

    tokens = list(dict.fromkeys(tokenize_py(text)))
    spark = ix.postings.sparkSession
    out_schema = ("token string, suggestion string, distance int, "
                  "df long, rank int")
    if not tokens:
        return spark.createDataFrame([], out_schema)
    tok_df = spark.createDataFrame([(t,) for t in tokens], "token string")
    dist = F.levenshtein(F.col("term"), F.col("token"))
    cand = (
        ix.term_stats.select("term", "df")
        .join(F.broadcast(tok_df),
              (dist <= max_edits) & (F.col("term") != F.col("token")))
        .select("token", F.col("term").alias("suggestion"),
                dist.alias("distance"), F.col("df").cast("long").alias("df"))
    )
    w = Window.partitionBy("token").orderBy(
        F.asc("distance"), F.desc("df"), F.asc("suggestion"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= size)
        .orderBy("token", "rank")
    )


def mlt_select_terms(ix: PostingsIndex, like_text: str,
                     max_query_terms: int = 25, min_term_freq: int = 2,
                     min_doc_freq: int = 2,
                     minimum_should_match_pct: float = 0.3,
                     ) -> tuple[list[str], int]:
    """MLT term selection (Lucene MoreLikeThis): returns the selected
    terms and the resolved minimum_should_match count.  Candidates
    need ``min_term_freq`` occurrences in the like-text and
    ``min_doc_freq`` corpus docs; rank by tf * idf (the engine's BM25
    idf), ties by term; top ``max_query_terms`` survive.  Driver-side
    metadata only: the df lookup is a term-pruned dictionary scan
    collecting <= |candidate| rows."""
    import math

    from collections import Counter

    tf_c = Counter(tokenize_py(like_text))
    cand = sorted(t for t, n in tf_c.items() if n >= min_term_freq)
    if not cand:
        return [], 0
    stats = (
        ix.term_stats
        .filter(F.col("term").isin(cand) & (F.col("df") >= min_doc_freq))
        .select("term", "df")
        .collect()
    )
    if not stats:
        return [], 0
    n = float(ix.n_docs)

    def tfidf(r):
        return tf_c[r["term"]] * math.log(
            1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5))

    ranked = sorted(stats, key=lambda r: (-tfidf(r), r["term"]))
    sel = [r["term"] for r in ranked[:max_query_terms]]
    return sel, int(len(sel) * minimum_should_match_pct)


def more_like_this(ix: PostingsIndex, like_text: str,
                   max_query_terms: int = 25, min_term_freq: int = 2,
                   min_doc_freq: int = 2,
                   minimum_should_match_pct: float = 0.3,
                   exclude_doc_ids: list[int] | tuple = (),
                   k: int = 10) -> DataFrame:
    """``more_like_this`` query (OpenSearch MLT, like-text form): pick
    the most characteristic terms of ``like_text`` and find the docs
    most similar to it.

    Term selection follows Lucene's MoreLikeThis: candidate terms need
    ``min_term_freq`` occurrences in the input and ``min_doc_freq``
    docs in the corpus; candidates rank by tf * idf (the engine's
    shared BM25 idf) with ties by term, and the top
    ``max_query_terms`` survive. The selected terms run as a bool
    ``should`` query requiring ``int(n_selected *
    minimum_should_match_pct)`` distinct matches (Lucene MLT's
    default "30%"), scored by the ordinary BM25 sum. When MLT is
    seeded by an indexed document, pass its doc_id in
    ``exclude_doc_ids`` (OpenSearch excludes ``like`` docs from hits);
    the exclusion is a pre-limit filter, not a post-cut.

    Selection is driver-side metadata: tf comes from the like-text
    (already on the driver) and df from a term-pruned dictionary scan
    collecting <= |candidate| rows; the corpus-sized work is exactly
    one bool query."""
    sel, msm = mlt_select_terms(
        ix, like_text, max_query_terms=max_query_terms,
        min_term_freq=min_term_freq, min_doc_freq=min_doc_freq,
        minimum_should_match_pct=minimum_should_match_pct)
    spark = ix.postings.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not sel:
        return empty

    scored = _decoded_scored(ix, sel)
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("_s").alias("score"),
        F.countDistinct("term").alias("_n_should"),
    )
    if msm > 0:
        per_doc = per_doc.filter(F.col("_n_should") >= msm)
    if exclude_doc_ids:
        per_doc = per_doc.filter(
            ~F.col("doc_id").isin([int(d) for d in exclude_doc_ids]))
    return (
        per_doc.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def search_facets(ix: PostingsIndex, query: str, facet_cols: list[str],
                  k: int = 10, facet_size: int = 10) -> dict[str, DataFrame]:
    """OpenSearch-style hits + aggregations: returns
    ``{"hits": top-k DataFrame, "facet:<col>": counts DataFrame}``.
    Facets aggregate over the FULL match set (every doc containing at
    least one query term), joined to the docs table for the facet
    columns — a broadcast of the tiny facet dimension is not needed:
    the match set itself is the smaller side after aggregation."""
    terms = list(dict.fromkeys(tokenize_py(query)))
    spark = ix.postings.sparkSession
    if not terms:
        return {"hits": spark.createDataFrame([], "doc_id long, score double")}

    scored = _decoded_scored(ix, terms)
    per_doc = scored.groupBy("doc_id").agg(F.sum("_s").alias("score"))
    hits = (
        per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    )
    out: dict[str, DataFrame] = {"hits": hits}
    if facet_cols:
        matched = per_doc.select("doc_id").join(ix.docs, "doc_id")
        for c in facet_cols:
            out[f"facet:{c}"] = (
                matched.groupBy(c)
                .agg(F.count("*").alias("n"))
                .orderBy(F.desc("n"), F.asc(c))
                .limit(facet_size)
            )
    return out


def completion_suggest(ix: PostingsIndex, prefix: str,
                       size: int = 5) -> DataFrame:
    """Completion suggester (OpenSearch ``suggest.completion`` —
    search-box autocomplete): dictionary terms extending ``prefix``,
    highest document frequency first (df is the weight — OpenSearch
    lets the indexer attach weights; the natural corpus-derived
    weight is popularity).

    Lucene serves this from an in-memory FST; the Spark restatement
    is a dictionary scan with a leading-prefix predicate (sargable —
    term_stats parquet is term-sorted, so row-group pruning applies)
    and a TakeOrdered top-``size``. No postings are touched. The
    analyzed prefix is matched against single terms; multi-token
    input keeps only the LAST token as the live prefix with the
    earlier tokens untouched (the search-as-you-type convention).
    Returns (suggestion, weight, rank).
    """
    from pyspark.sql import Window

    toks = tokenize_py(prefix)
    spark = ix.postings.sparkSession
    out_schema = "suggestion string, weight long, rank int"
    if not toks:
        return spark.createDataFrame([], out_schema)
    live = toks[-1]
    head = " ".join(toks[:-1])
    cand = (
        ix.term_stats.filter(F.col("term").startswith(live))
        .select(
            (F.concat_ws(" ", F.lit(head), F.col("term")) if head
             else F.col("term")).alias("suggestion"),
            F.col("df").cast("long").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(size)
    )
    w = Window.orderBy(F.desc("weight"), F.asc("suggestion"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .orderBy("rank")
    )


def build_completion_contexts(docs: DataFrame, ctx_col: str,
                              text_col: str = "text") -> DataFrame:
    """Context-dictionary build for the completion suggester's
    *category contexts* (OpenSearch ``contexts`` on a completion
    field: every suggestion is indexed under its document's context
    values, and queries filter/boost by context).

    Corpus-derived analog: one pass exploding each doc's DISTINCT
    analyzed tokens under its context value -> (ctx, term, df) where
    df = documents in that context containing the term. One shuffle
    (the groupBy), vocabulary × contexts output — term_stats-sized
    per context, never corpus-sized.
    """
    from ..analysis import tokens_col

    return (
        docs.select(
            F.col(ctx_col).cast("string").alias("ctx"),
            F.explode(F.array_distinct(tokens_col(text_col)))
            .alias("term"),
        )
        .groupBy("ctx", "term")
        .agg(F.count("*").alias("df"))
    )


def completion_suggest_ctx(ctx_stats: DataFrame, prefix: str,
                           contexts: dict[str, float] | list[str],
                           size: int = 5) -> DataFrame:
    """Completion suggester with category contexts: candidates must
    carry at least one of the requested contexts; the weight is the
    boost-scaled df SUMMED over matching contexts (the plugin's
    context-boost semantics). ``contexts`` maps context value ->
    boost (a plain list = boost 1.0 each).

    Plan: literal ``ctx IN`` + leading-prefix predicate (sargable on a
    (ctx, term)-sorted layout), one tiny groupBy over the filtered
    dictionary rows, TakeOrdered top-``size``. No postings touched.
    Returns (suggestion, weight, rank).
    """
    from pyspark.sql import Window

    if isinstance(contexts, list):
        contexts = {c: 1.0 for c in contexts}
    if not contexts:
        raise ValueError("contexts must be non-empty")
    toks = tokenize_py(prefix)
    spark = ctx_stats.sparkSession
    out_schema = "suggestion string, weight double, rank int"
    if not toks:
        return spark.createDataFrame([], out_schema)
    live, head = toks[-1], " ".join(toks[:-1])
    boost = F.create_map(*[
        F.lit(x) for kv in contexts.items()
        for x in (str(kv[0]), float(kv[1]))
    ])
    cand = (
        ctx_stats.filter(F.col("ctx").isin([str(c) for c in contexts])
                         & F.col("term").startswith(live))
        .groupBy("term")
        .agg(F.sum(F.col("df").cast("double")
                   * F.element_at(boost, F.col("ctx"))).alias("weight"))
        .select(
            (F.concat_ws(" ", F.lit(head), F.col("term")) if head
             else F.col("term")).alias("suggestion"),
            F.round("weight", 4).alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(size)
    )
    w = Window.orderBy(F.desc("weight"), F.asc("suggestion"))
    return cand.withColumn("rank", F.row_number().over(w)).orderBy("rank")
