"""Text analysis operators for training-data curation: language id,
quality scoring, token counting, document fingerprinting.

All native column expressions (whole-stage codegen, map-side only, no
shuffle except final aggregates) with exact DuckDB twins for the
correctness gate. The analyzer is the engine's single shared
tokenizer (analysis.py) — same invariant as the index path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..analysis import duckdb_tokens_sql, tokens_sql
from ..detfloat import round_det, round_det_sql

#: tiny per-language stopword lists for the n-gram/stopword-ratio
#: language heuristic (public common function words).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "por", "con", "para"],
}

#: BPE-ish pre-tokenization: letter runs, digit runs, single other
#: non-space symbols (the GPT-2-style pretoken split, simplified to a
#: cross-engine-safe character-class regex).
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def _ratio(hits: Column, total: Column) -> Column:
    return F.when(total > 0, hits.cast("double") / total.cast("double")).otherwise(0.0)


# ---------------------------------------------------------------------------
# language id
# ---------------------------------------------------------------------------

def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Per-language stopword-hit ratio columns."""
    toks = F.expr(tokens_sql(text_col))
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        hits = F.size(
            F.filter(toks, lambda t: t.isin(*words))  # noqa: B023
        )
        out[lang] = _ratio(hits, F.size(toks))
    return out


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language = argmax stopword ratio; 'und' when no list
    scores > 0. Ties break in fixed LANG_STOPWORDS order."""
    scores = lang_scores(text_col)
    best = F.lit("und")
    best_s = F.lit(0.0)
    for lang, s in scores.items():  # first lang wins ties (> not >=)
        take = s > best_s
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_s = F.when(take, s).otherwise(best_s)
    return docs.withColumn("lang_pred", best).withColumn(
        "lang_score", round_det(best_s, 4)
    )


def duckdb_lang_sql(text_expr: str = "text") -> tuple[str, str]:
    """(lang_pred_sql, lang_score_sql) DuckDB expressions — same
    greedy argmax with identical tie order."""
    toks = duckdb_tokens_sql(text_expr)
    ratios = {}
    for lang, words in LANG_STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        ratios[lang] = (
            f"(CASE WHEN len({toks}) > 0 THEN "
            f"len(list_filter({toks}, t -> t IN ({lst})))::DOUBLE"
            f" / len({toks}) ELSE 0.0 END)"
        )
    pred = "'und'"
    score = "0.0"
    for lang, r in ratios.items():
        pred = f"(CASE WHEN {r} > {score} THEN '{lang}' ELSE {pred} END)"
        score = f"(CASE WHEN {r} > {score} THEN {r} ELSE {score} END)"
    return pred, round_det_sql(score, 4)


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc curation features: token count, mean token length,
    distinct-token ratio, stopword ratio, non-alnum char ratio, plus a
    composite [0,1] quality score (heuristic gate in the Gopher/C4
    style: length window + lexical diversity + stopword presence)."""
    toks = F.expr(tokens_sql(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    alnum = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""))
    en = LANG_STOPWORDS["en"]
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*en)))
    mean_len = F.when(
        n_tok > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
        ).cast("double") / n_tok,
    ).otherwise(0.0)
    distinct_ratio = _ratio(F.size(F.array_distinct(toks)), n_tok)
    stop_ratio = _ratio(stop_hits, n_tok)
    sym_ratio = _ratio(n_chars - alnum, n_chars)

    length_ok = (n_tok >= 10) & (n_tok <= 100000)
    word_ok = (mean_len >= 2.0) & (mean_len <= 12.0)
    score = (
        F.when(length_ok, 0.25).otherwise(0.0)
        + F.when(word_ok, 0.25).otherwise(0.0)
        + F.least(distinct_ratio * 0.5, F.lit(0.25))
        + F.least(stop_ratio * 2.5, F.lit(0.25))
    )
    return docs.select(
        "*",
        n_tok.cast("long").alias("n_tokens"),
        round_det(mean_len, 4).alias("mean_token_len"),
        round_det(distinct_ratio, 4).alias("distinct_ratio"),
        round_det(stop_ratio, 4).alias("stopword_ratio"),
        round_det(sym_ratio, 4).alias("symbol_ratio"),
        round_det(score, 4).alias("quality_score"),
    )


def duckdb_quality_sql(table: str = "documents", text_expr: str = "text",
                       id_col: str = "doc_id") -> str:
    toks = duckdb_tokens_sql(text_expr)
    en = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    return f"""
    WITH b AS (
      SELECT {id_col}, {toks} AS t, length({text_expr}) AS n_chars,
             length(regexp_replace(lower({text_expr}), '[^a-z0-9]', '', 'g')) AS alnum
      FROM {table}
    ), f AS (
      SELECT {id_col},
        len(t) AS n_tok,
        CASE WHEN len(t) > 0 THEN
          list_sum(list_transform(t, x -> length(x)))::DOUBLE / len(t)
          ELSE 0.0 END AS mean_len,
        CASE WHEN len(t) > 0 THEN
          len(list_distinct(t))::DOUBLE / len(t) ELSE 0.0 END AS dratio,
        CASE WHEN len(t) > 0 THEN
          len(list_filter(t, x -> x IN ({en})))::DOUBLE / len(t)
          ELSE 0.0 END AS sratio,
        CASE WHEN n_chars > 0 THEN
          (n_chars - alnum)::DOUBLE / n_chars ELSE 0.0 END AS symr
      FROM b
    )
    SELECT {id_col},
      n_tok::BIGINT AS n_tokens,
      {round_det_sql('mean_len', 4)} AS mean_token_len,
      {round_det_sql('dratio', 4)} AS distinct_ratio,
      {round_det_sql('sratio', 4)} AS stopword_ratio,
      {round_det_sql('symr', 4)} AS symbol_ratio,
      {round_det_sql('''
        (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 0.25 ELSE 0.0 END)
        + (CASE WHEN mean_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
        + least(dratio * 0.5, 0.25) + least(sratio * 2.5, 0.25)''', 4)}
        AS quality_score
    FROM f
    """


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens vs BPE-ish pretokens vs analyzer tokens —
    the three counts a data pipeline budgets with."""
    ws = F.size(
        F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != "")
    )
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
    an = F.size(F.expr(tokens_sql(text_col)))
    return docs.select(
        "*",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
        an.cast("long").alias("analyzer_tokens"),
    )


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------

def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Two deterministic fingerprints per doc:

    * ``fp_exact``  — md5 of the normalized token stream (order-
      sensitive; equal iff texts tokenize identically);
    * ``fp_bag``    — md5 of the sorted distinct token set (order-
      INsensitive; robust to shuffled/reflowed boilerplate — the
      cheap rolling-hash-family analog for near-dup bucketing).
    """
    toks = F.expr(tokens_sql(text_col))
    return docs.select(
        "*",
        F.md5(F.concat_ws(" ", toks)).alias("fp_exact"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("fp_bag"),
    )


# ---------------------------------------------------------------------------
# repetition features (Gopher-style quality signals)
# ---------------------------------------------------------------------------

def repetition_features(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", Table A1 filters): fraction of
    duplicate lines, fraction of characters in duplicate lines, and
    the fraction of characters inside the most frequent 2-gram /
    3-gram. High values mark boilerplate/spam for corpus filtering.

    All-native per-doc computation: lines via split, dedup via
    array_distinct, n-gram tops via a groupBy over exploded n-grams
    (vocabulary-keyed shuffle with map-side partials — the same scale
    shape as the index's tf pass). Returns (id, n_lines,
    dup_line_frac, dup_line_char_frac, top_2gram_char_frac,
    top_3gram_char_frac).
    """
    from ..analysis import tokens_col

    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda s: F.trim(s) != "")
    n_lines = F.size(lines)
    n_dist = F.size(F.array_distinct(lines))
    line_chars = F.aggregate(
        lines, F.lit(0), lambda acc, s: acc + F.length(s))
    dist_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0), lambda acc, s: acc + F.length(s))
    base = docs.select(
        F.col(id_col),
        F.when(n_lines > 0,
               (n_lines - n_dist).cast("double") / n_lines)
        .otherwise(0.0).alias("dup_line_frac"),
        F.when(line_chars > 0,
               (line_chars - dist_chars).cast("double") / line_chars)
        .otherwise(0.0).alias("dup_line_char_frac"),
        n_lines.alias("n_lines"),
        tokens_col(text_col).alias("_ts"),
    )

    def top_ngram_frac(n: int) -> DataFrame:
        idx = F.when(
            F.size(F.col("_ts")) >= n,
            F.sequence(F.lit(0), F.size(F.col("_ts")) - n),
        ).otherwise(F.array().cast("array<int>"))
        gram = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("_ts"), i + j + 1)
                       for j in range(n)]),
        )
        toks_chars = F.aggregate(
            F.col("_ts"), F.lit(0), lambda a, t: a + F.length(t))
        grams = base.select(
            id_col, toks_chars.alias("_tc"), F.explode(gram).alias("g"))
        per = grams.groupBy(id_col, "_tc", "g").agg(
            F.count("*").alias("c"))
        # chars covered by the most frequent n-gram = count * len(gram
        # tokens' chars); Gopher counts characters, token chars here
        top = per.groupBy(id_col, "_tc").agg(
            F.max(F.struct(
                F.col("c"),
                (F.length(F.col("g")) - (n - 1)).alias("glen"),
                F.col("g"),
            )).alias("m"))
        return top.select(
            id_col,
            F.when(
                F.col("_tc") > 0,
                (F.col("m.c") * F.col("m.glen")).cast("double")
                / F.col("_tc"),
            ).otherwise(0.0).alias(f"top_{n}gram_char_frac"),
        )

    g2, g3 = top_ngram_frac(2), top_ngram_frac(3)
    return (
        base.drop("_ts")
        .join(g2, id_col, "left").join(g3, id_col, "left")
        .select(
            id_col, "n_lines",
            round_det("dup_line_frac", 6).alias("dup_line_frac"),
            round_det("dup_line_char_frac", 6).alias("dup_line_char_frac"),
            round_det(F.coalesce("top_2gram_char_frac", F.lit(0.0)), 6)
            .alias("top_2gram_char_frac"),
            round_det(F.coalesce("top_3gram_char_frac", F.lit(0.0)), 6)
            .alias("top_3gram_char_frac"),
        )
    )


def duckdb_top_ngram_sql(n: int, table: str = "documents",
                         text_expr: str = "text",
                         id_col: str = "doc_id") -> str:
    """DuckDB twin of the top-n-gram char fraction inside
    :func:`repetition_features`: per doc, the (count, token-chars,
    gram)-max n-gram's covered chars over total token chars. The
    tie-break (count desc, gram char length desc, gram desc) mirrors
    the Spark struct-max exactly. Yields (doc_id, frac) rows."""
    from ..analysis import duckdb_tokens_sql

    toks = duckdb_tokens_sql(text_expr)
    parts = " || ' ' || ".join(f"ts[i + {j}]" for j in range(n))
    return f"""
      WITH tok_{n} AS (
        SELECT {id_col} AS doc_id, {toks} AS ts FROM {table}
      ),
      grams_{n} AS (
        SELECT doc_id, len(array_to_string(ts, '')) AS tc,
               unnest(list_transform(
                 range(1, greatest(len(ts) - {n - 1}, 0) + 1),
                 i -> {parts})) AS g
        FROM tok_{n}
      ),
      cnt_{n} AS (
        SELECT doc_id, tc, g, count(*) AS c
        FROM grams_{n} GROUP BY 1, 2, 3
      ),
      rk_{n} AS (
        SELECT doc_id, tc, c * (len(g) - {n - 1}) AS cover,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY c DESC, len(g) - {n - 1} DESC, g DESC) AS rn
        FROM cnt_{n}
      )
      SELECT doc_id,
             {round_det_sql('CASE WHEN tc > 0 THEN cover / tc::DOUBLE ELSE 0 END', 6)}
               AS frac
      FROM rk_{n} WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# LM perplexity quality signal
# ---------------------------------------------------------------------------

def doc_log_perplexity(docs: DataFrame, model, text_col: str = "text",
                       id_col: str = "doc_id",
                       discount: float = 0.4) -> DataFrame:
    """Per-document log-perplexity under the corpus bigram LM
    (``index.suggest.BigramModel``) -- the kenlm-style quality filter
    of web-curation pipelines (CCNet/Gopher family: score each doc
    with an n-gram LM, drop the high-perplexity tail), restated on the
    engine's own Stupid-Backoff LM so it shares one definition with
    the phrase suggester.

    logppl(d) = -(1/n) * [log P(t_1) + sum_i log P_SB(t_i | t_{i-1})]

    with EXACTLY the suggester's scoring: bigram chain when (prev, w)
    and prev both exist, else discount-smoothed unigram backoff, with
    the +1e-9 unknown-word floor.

    One narrow pass: tokens pair with their predecessor via a
    zero-shuffle array shift INSIDE each row (no per-doc window), the
    corpus-sized pair stream joins the vocabulary-sized LM tables
    (AQE broadcasts them when small; at web scale they hash-join on
    vocabulary keys), and one groupBy(doc_id) folds the sum.  Returns
    (doc_id, n_tokens, logppl); empty docs get NULL logppl.
    """
    from ..analysis import tokens_col

    ts = tokens_col(text_col)
    base = docs.select(F.col(id_col).alias("doc_id"), ts.alias("ts"))
    shifted = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
    )
    pairs = base.select(
        "doc_id",
        F.posexplode(
            F.arrays_zip(shifted.alias("pv"), F.col("ts").alias("wd"))
        ).alias("pos", "p"),
    ).select("doc_id", "pos", F.col("p.pv").alias("prev"),
             F.col("p.wd").alias("w"))

    uni_w = model.unigrams.select(F.col("w"), F.col("n").alias("n_w"))
    uni_p = model.unigrams.select(
        F.col("w").alias("prev"), F.col("n").alias("n_prev"))
    bi = model.bigrams.select(
        F.col("w1").alias("prev"), F.col("w2").alias("w"),
        F.col("n").alias("n_bi"))
    total = float(model.total) if model.total else 1.0

    j = (
        pairs.join(bi, ["prev", "w"], "left")
        .join(uni_p, "prev", "left")
        .join(uni_w, "w", "left")
    )
    backoff = F.log(
        F.lit(discount) * (F.coalesce(F.col("n_w"), F.lit(0.0)) + 1e-9)
        / F.lit(total))
    first = F.log(
        (F.coalesce(F.col("n_w"), F.lit(0.0)) + 1e-9) / F.lit(total))
    chained = F.when(
        F.col("n_bi").isNotNull() & F.col("n_prev").isNotNull(),
        F.log(F.col("n_bi").cast("double") / F.col("n_prev")),
    ).otherwise(backoff)
    s = F.when(F.col("pos") == 0, first).otherwise(chained)

    return (
        j.groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum(s).alias("_lp"))
        .select(
            "doc_id", "n_tokens",
            round_det(-F.col("_lp") / F.col("n_tokens"), 6).alias("logppl"),
        )
    )


def filter_by_perplexity(docs: DataFrame, model, max_logppl: float,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Keep docs whose LM log-perplexity is at most ``max_logppl`` --
    the curation drop-the-tail move. One semi-join against the scored
    ids; empty docs (no score) are dropped."""
    keep = doc_log_perplexity(docs, model, text_col, id_col).filter(
        F.col("logppl") <= max_logppl
    ).select("doc_id")
    return docs.join(keep.withColumnRenamed("doc_id", id_col),
                     id_col, "left_semi")
