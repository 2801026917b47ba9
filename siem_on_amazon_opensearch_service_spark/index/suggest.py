"""Phrase suggester ("did you mean" over whole queries) — the
OpenSearch ``suggest.phrase`` feature, built on a corpus bigram
language model with Stupid-Backoff smoothing.

OpenSearch implementation (public docs + Lucene source): the phrase
suggester builds candidates per term with a DirectSpellChecker-style
candidate generator, enumerates whole-phrase candidates bounded by
``max_errors``, and ranks them with an n-gram LM over a shingled
sub-field (default smoothing StupidBackoff, discount 0.4). The
reference stack exposes it through the dashboards' search box.

Spark restatement:

* :func:`build_bigram_model` — ONE tokenize scan over the corpus
  producing the unigram and bigram count tables (two hash aggregates,
  map-side combined; vocabulary-sized outputs, not corpus-sized).
  This is the LM the shingle sub-field would hold.
* :func:`phrase_suggest` — candidate generation against the unigram
  vocabulary (native levenshtein, same plan as the term suggester),
  phrase enumeration driver-side (per-slot shortlists are query
  metadata: <= per_token * n_slots rows), and LM scoring as ONE join
  of the exploded (prev, word) pairs — broadcast, they are query
  metadata — against the bigram/unigram tables, followed by a
  phrase-id aggregate. No corpus scan at query time.

Scoring: log StupidBackoff. score(w_i | w_{i-1}) =
``log(count(w_{i-1} w_i) / count(w_{i-1}))`` when the bigram exists,
else ``log(discount * count(w_i) / total_tokens)``; the first slot
scores ``log(count(w_0) / total_tokens)``. Unknown words get a
1/total floor so a candidate phrase never hits log(0).
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import product

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..detfloat import round_det

from ..analysis import tokenize_py, tokens_col


@dataclass
class BigramModel:
    """Corpus LM tables: ``unigrams`` (w, n), ``bigrams`` (w1, w2, n),
    ``total`` tokens. Both tables are vocabulary-sized — cache them
    for a query-serving deployment."""

    unigrams: DataFrame
    bigrams: DataFrame
    total: int


def build_bigram_model(df: DataFrame, text_col: str = "text") -> BigramModel:
    """One scan over ``df[text_col]``: tokenize (native expressions),
    explode once for unigram counts and once zipped-with-next for
    bigram counts. Two shuffles, both keyed on vocabulary-sized keys
    with map-side partial aggregation."""
    toks = df.select(tokens_col(text_col).alias("ts"))
    uni = (
        toks.select(F.explode("ts").alias("w"))
        .groupBy("w").agg(F.count("*").alias("n"))
    )
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("ts", 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                F.slice("ts", 2, F.greatest(F.size("ts") - 1, F.lit(0))),
            )
        ).alias("p")
    )
    bi = (
        pairs.select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
        .groupBy("w1", "w2").agg(F.count("*").alias("n"))
    )
    uni = uni.persist()
    total = uni.agg(F.sum("n")).collect()[0][0] or 0
    return BigramModel(unigrams=uni, bigrams=bi, total=int(total))


def _slot_candidates(model: BigramModel, tokens: list[str],
                     max_edits: int, per_token: int) -> list[list[str]]:
    """Per-slot shortlist: the token itself plus the ``per_token``
    nearest vocabulary words within ``max_edits`` (distance asc,
    count desc, word asc — the term-suggester rank)."""
    from pyspark.sql import Window

    spark = model.unigrams.sparkSession
    tok_df = spark.createDataFrame(
        [(t,) for t in dict.fromkeys(tokens)], "token string")
    dist = F.levenshtein(F.col("w"), F.col("token"))
    w = Window.partitionBy("token").orderBy(
        F.asc("d"), F.desc("n"), F.asc("w"))
    cand = (
        model.unigrams.join(F.broadcast(tok_df), dist <= max_edits)
        .select("token", "w", dist.alias("d"), "n")
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= per_token)
        .collect()
    )
    by_tok: dict[str, list[str]] = {}
    for r in cand:
        by_tok.setdefault(r["token"], []).append(r["w"])
    return [
        list(dict.fromkeys([t] + by_tok.get(t, []))) for t in tokens
    ]


def phrase_suggest(model: BigramModel, text: str, size: int = 3,
                   max_edits: int = 1, per_token: int = 4,
                   max_errors: int = 2,
                   discount: float = 0.4) -> DataFrame:
    """Top-``size`` corrected phrases for ``text`` under the corpus
    LM. Candidate phrases change at most ``max_errors`` slots
    (OpenSearch's ``max_errors``, absolute form). Returns
    (suggestion, score, rank); the input phrase itself is a candidate,
    so a well-spelled query ranks on equal footing (OpenSearch drops
    it from the response; callers can filter ``suggestion != text``).
    """
    spark = model.unigrams.sparkSession
    out_schema = "suggestion string, score double, rank int"
    tokens = tokenize_py(text)
    if not tokens:
        return spark.createDataFrame([], out_schema)

    slots = _slot_candidates(model, tokens, max_edits, per_token)
    phrases = [
        cand for cand in product(*slots)
        if sum(a != b for a, b in zip(cand, tokens)) <= max_errors
    ]
    rows = []
    for pid, cand in enumerate(phrases):
        for i, w in enumerate(cand):
            rows.append((pid, " ".join(cand), i,
                         cand[i - 1] if i else None, w))
    pairs = spark.createDataFrame(
        rows, "pid long, phrase string, pos int, prev string, w string")

    uni_w = model.unigrams.select(F.col("w"), F.col("n").alias("n_w"))
    uni_p = model.unigrams.select(
        F.col("w").alias("prev"), F.col("n").alias("n_prev"))
    bi = model.bigrams.select(
        F.col("w1").alias("prev"), F.col("w2").alias("w"),
        F.col("n").alias("n_bi"))
    total = float(model.total) if model.total else 1.0

    # The (prev, w) pair table is query metadata (tens of rows). A
    # pairs-preserving outer join can't broadcast its small preserved
    # side (Spark must build on the non-preserved side), which would
    # sort-merge the corpus-sized LM tables — so instead SEMI-filter
    # each LM table down to the probe keys first (broadcast left-semi:
    # the big table streams, nothing shuffles or sorts), leaving
    # pair-count-sized slices that then broadcast into the
    # pairs-preserving left joins. Plan-pinned: BroadcastHashJoin
    # only, no SortMergeJoin (tests/test_plan_shapes.py).
    bi_s = bi.join(
        F.broadcast(pairs.select("prev", "w").distinct().na.drop()),
        ["prev", "w"], "leftsemi")
    uni_p_s = uni_p.join(
        F.broadcast(pairs.select("prev").distinct().na.drop()),
        "prev", "leftsemi")
    uni_w_s = uni_w.join(
        F.broadcast(pairs.select("w").distinct()), "w", "leftsemi")
    j = (
        pairs.join(F.broadcast(bi_s), ["prev", "w"], "left")
        .join(F.broadcast(uni_p_s), "prev", "left")
        .join(F.broadcast(uni_w_s), "w", "left")
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
    term_score = F.when(F.col("pos") == 0, first).otherwise(chained)

    from pyspark.sql import Window

    scored = (
        j.select("pid", "phrase", term_score.alias("s"))
        .groupBy("pid", "phrase").agg(F.sum("s").alias("score"))
    )
    w = Window.orderBy(F.desc("score"), F.asc("phrase"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= size)
        .select(F.col("phrase").alias("suggestion"),
                round_det("score", 6).alias("score"), "rank")
        .orderBy("rank")
    )


def term_suggest(model: BigramModel, text: str, size: int = 5,
                 max_edits: int = 2,
                 suggest_mode: str = "missing") -> DataFrame:
    """The OpenSearch ``suggest.term`` feature: per input token,
    candidate corrections from the corpus vocabulary.

    Scoring follows Lucene's DirectSpellChecker rank: similarity
    ``1 - distance / len(token)`` descending, then corpus frequency
    descending, then word (deterministic). ``suggest_mode``:

    - ``missing`` (default): suggest only for tokens absent from the
      vocabulary;
    - ``popular``: only candidates MORE frequent than the input token;
    - ``always``: all tokens.

    Plan: the token list is query metadata, broadcast against the
    vocabulary-sized unigram table (one scan, no shuffle of anything
    corpus-sized); per-token ranking is a window partitioned by token
    over candidate-shortlist rows."""
    from pyspark.sql import Window

    spark = model.unigrams.sparkSession
    out_schema = ("token string, suggestion string, score double, "
                  "freq long, rank int")
    tokens = list(dict.fromkeys(tokenize_py(text)))
    if not tokens:
        return spark.createDataFrame([], out_schema)
    if suggest_mode not in ("missing", "popular", "always"):
        raise ValueError(f"bad suggest_mode {suggest_mode!r}")

    tok_df = spark.createDataFrame([(t,) for t in tokens], "token string")
    vocab = model.unigrams  # (w, n)

    if suggest_mode == "missing":
        # which probe tokens exist is a literal-IN lookup bounded by
        # the query length -- no anti-join against the vocabulary
        present = {
            r["w"] for r in
            vocab.filter(F.col("w").isin(tokens)).select("w").collect()
        }
        tokens = [t for t in tokens if t not in present]
        if not tokens:
            return spark.createDataFrame([], out_schema)
        tok_df = spark.createDataFrame(
            [(t,) for t in tokens], "token string")

    dist = F.levenshtein(F.col("w"), F.col("token"))
    cand = (
        vocab.join(F.broadcast(tok_df),
                   (dist <= max_edits) & (F.col("w") != F.col("token")))
        .select(
            "token", F.col("w").alias("suggestion"),
            (1.0 - dist.cast("double")
             / F.length("token").cast("double")).alias("score"),
            F.col("n").alias("freq"),
        )
    )
    if suggest_mode == "popular":
        # probe-token frequencies only (literal IN over query
        # metadata) -- never broadcast the whole vocabulary
        in_freq = vocab.filter(F.col("w").isin(tokens)).select(
            F.col("w").alias("token"), F.col("n").alias("_tok_n"))
        cand = (
            cand.join(F.broadcast(in_freq), "token", "left")
            .filter(F.col("freq") > F.coalesce(F.col("_tok_n"), F.lit(0)))
            .drop("_tok_n")
        )
    w = Window.partitionBy("token").orderBy(
        F.desc("score"), F.desc("freq"), F.asc("suggestion"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= size)
        .select("token", "suggestion", round_det("score", 6).alias("score"),
                "freq", "rank")
        .orderBy("token", "rank")
    )
