"""Multi-field index + multi_match scoring (per-field boosts).

Reference parity target: OpenSearch multi-fields mappings (reference
deploy_es/data.ini:314 -- ``url.original`` indexed both as ``keyword``
and as a ``.text`` subfield) queried with ``multi_match`` /
``query_string`` over several fields with per-field boosts
(``fields: ["title^2", "body"]``). Lucene semantics rebuilt here
(``most_fields``): every field is an independent BM25 scoring space
(its own df, doc length, avgdl, docCount), and the document score is

    score(q, d) = sum_f boost_f * BM25_f(q, d)

Spark-first design
------------------
The single-field build (build.py) already reduces to "group postings
by a key and encode". A field is just one more dimension of that key,
so the multi-field build reuses the SAME streaming encoder and salting
machinery by shuffling on the composite key ``field:term`` (tokens are
``[a-z0-9]+`` so ``:`` can never collide), then splits the composite
back out so the stored layout carries an explicit ``field`` column:

    (field, term, salt, block_id, doc_count, max_tf, max_impact,
     min_doc_id, max_doc_id, doc_ids_vb, tfs_vb, dls_vb)

Hot-term salting therefore operates per (field, term) -- a stopword
hot in ``body`` but rare in ``title`` only salts where it is hot.

Block ``max_impact`` bounds use the dl->0 upper limit (sound for every
avgdl) because blocks of different fields share an encoder pass;
multi_match queries run the exhaustive path, so the looser bound is
never consulted.

Scale: postings volume grows by the extra fields' tokens only; the
build keeps the single (key, salt) shuffle, and scoring stays
join-free -- per-(field, term) idf*boost and per-field avgdl are
metadata-sized literal maps folded into one native expression.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis import tokenize_py, tokens_col
from ..bm25 import B, K1, idf as _idf
from .build import DEFAULT_SALT_THRESHOLD, encode_postings_df
from .docids import assign_doc_ids
from .query import decode_blocks

#: separator between field and term in the composite shuffle key --
#: analyzer tokens match [a-z0-9]+ so this byte never appears in one.
SEP = ":"


@dataclass
class MultiFieldIndex:
    """Built multi-field index handles.

    ``field_stats``: field -> (n_docs_f, avgdl_f) where n_docs_f counts
    docs with >=1 token in the field (the Lucene per-field docCount
    analog) and avgdl_f averages doc length over those docs.  The
    reserved pseudo-field ``"*"`` carries (n_union, 0.0) -- the number
    of docs with >=1 token in ANY field, the docCount of the combined
    pseudo-field that ``combined_fields`` scores against.

    ``doc_lens``: (doc_id, field, doclen) -- per-doc per-field lengths.
    ``combined_fields`` needs the weighted length of EVERY indexed
    field of a matched doc (a field contributes length even when the
    query term never occurs in it), which the norms-in-postings trick
    cannot provide; this table is the Lucene norms file analog.
    """

    docs: DataFrame        # doc_id + presentation cols
    postings: DataFrame    # field + POSTINGS_SCHEMA columns
    term_stats: DataFrame  # field, term, df
    field_stats: dict[str, tuple[int, float]]
    doc_lens: DataFrame | None = None

    def save(self, spark: SparkSession, path: str, buckets: int = 32) -> None:
        (
            self.postings.repartition(buckets, "field", "term")
            .sortWithinPartitions("field", "term", "salt", "block_id")
            .write.mode("overwrite").parquet(f"{path}/postings")
        )
        self.docs.write.mode("overwrite").parquet(f"{path}/docs")
        self.term_stats.write.mode("overwrite").parquet(f"{path}/term_stats")
        rows = [(f, int(n), float(a)) for f, (n, a) in self.field_stats.items()]
        spark.createDataFrame(
            rows, "field string, n_docs long, avgdl double"
        ).write.mode("overwrite").parquet(f"{path}/field_stats")
        if self.doc_lens is not None:
            self.doc_lens.write.mode("overwrite").parquet(
                f"{path}/doc_lens")

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "MultiFieldIndex":
        fs = {
            r["field"]: (int(r["n_docs"]), float(r["avgdl"]))
            for r in spark.read.parquet(f"{path}/field_stats").collect()
        }
        try:  # older layouts have no norms table; combined_fields
            dls = spark.read.parquet(f"{path}/doc_lens")  # will say so
        except Exception:
            dls = None
        return cls(
            docs=spark.read.parquet(f"{path}/docs"),
            postings=spark.read.parquet(f"{path}/postings"),
            term_stats=spark.read.parquet(f"{path}/term_stats"),
            field_stats=fs,
            doc_lens=dls,
        )


def build_multi_index(
    spark: SparkSession,
    pages: DataFrame,
    fields: dict[str, Column | str],
    id_col: str | None = None,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    shuffle_partitions: int | None = None,
) -> MultiFieldIndex:
    """Build one index over several text fields.

    ``fields``: field name -> source column (name or Column expr); each
    is analyzed with THE shared analyzer (analysis.py) -- per-field
    analyzers would slot in here, mirroring Lucene's per-field config.
    """
    if id_col is None:
        pages = assign_doc_ids(pages, order_col="url")
        id_col = "doc_id"

    keep = [c for c in ("url", "warc_ts", "lang") if c in pages.columns]
    base = pages.select(
        F.col(id_col).cast("long").alias("doc_id"),
        *keep,
        *[
            tokens_col(F.col(src) if isinstance(src, str) else src)
            .alias(f"_toks_{name}")
            for name, src in fields.items()
        ],
    )

    # One union of per-field token streams; each row carries its
    # field's doclen so scoring never joins back (norms-in-postings,
    # same trick as the single-field build).
    per_field = [
        base.select(
            "doc_id",
            F.lit(name).alias("field"),
            F.size(f"_toks_{name}").alias("doclen"),
            F.explode(f"_toks_{name}").alias("term"),
        )
        for name in fields
    ]
    tokens = per_field[0]
    for p in per_field[1:]:
        tokens = tokens.unionByName(p)

    tf = (
        tokens.groupBy("doc_id", "field", "doclen", "term")
        .agg(F.count("*").alias("tf"))
        .persist()
    )

    # per-field corpus stats from tf (no re-tokenize): docs with >=1
    # token and their average length.
    doc_lens = (
        tf.select("doc_id", "field", "doclen")
        .dropDuplicates(["doc_id", "field"])
        .withColumnRenamed("doclen", "dl")
    )
    srows = (
        doc_lens.groupBy("field")
        .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
        .collect()
    )
    field_stats = {
        r["field"]: (int(r["n"]), float(r["avgdl"] or 0.0)) for r in srows
    }
    for name in fields:
        field_stats.setdefault(name, (0, 0.0))
    # union docCount for the combined_fields pseudo-field "*": docs
    # with >=1 token in ANY field (one count over the norms table).
    n_union = doc_lens.select("doc_id").distinct().count()
    field_stats["*"] = (int(n_union), 0.0)

    # composite shuffle key -> reuse single-field salting + encoder.
    ckey = tf.withColumn("term", F.concat_ws(SEP, "field", "term")).drop("field")
    df_tbl = ckey.groupBy("term").agg(F.count("*").alias("df"))
    hot = df_tbl.filter(F.col("df") > salt_threshold).select(
        "term",
        F.ceil(F.col("df") / F.lit(salt_threshold)).cast("int").alias("n_salts"),
    )
    salted = (
        ckey.join(F.broadcast(hot), "term", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("n_salts").isNotNull(),
                F.pmod(F.xxhash64("doc_id"), F.col("n_salts")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("n_salts")
    )
    enc = encode_postings_df(salted, shuffle_partitions, avgdl=None)
    postings = enc.select(
        F.split_part("term", F.lit(SEP), F.lit(1)).alias("field"),
        F.split_part("term", F.lit(SEP), F.lit(2)).alias("term"),
        *[c for c in enc.columns if c != "term"],
    )

    term_stats = postings.groupBy("field", "term").agg(
        F.sum("doc_count").alias("df"), F.max("max_tf").alias("max_tf"),
    )

    docs = base.select("doc_id", *keep)
    return MultiFieldIndex(
        docs=docs, postings=postings, term_stats=term_stats,
        field_stats=field_stats, doc_lens=doc_lens,
    )


def multi_match_scores(
    mix: MultiFieldIndex, query: str, boosts: dict[str, float],
    mode: str = "most_fields", tie_breaker: float = 0.0,
) -> DataFrame:
    """(doc_id, score) over the full match set.

    ``mode`` selects the OpenSearch ``multi_match`` type:

    * ``most_fields`` -- score = sum over fields of boost_f * BM25_f
      (fields reinforce each other).
    * ``best_fields`` -- the OpenSearch DEFAULT: a per-doc dis_max
      over the per-field scores, score = max_f + tie_breaker *
      sum(other fields) (Lucene DisjunctionMaxQuery).
    * ``cross_fields`` -- the fields act as ONE field (Lucene
      BlendedTermQuery model): term statistics blend ACROSS fields --
      idf_t uses df_blend = max_f df_f(t) against N_blend =
      max_f docCount_f, so a term common in `title` but rare in `body`
      stops being spuriously "rare" -- and each TERM contributes a
      per-doc dis_max over its fields' saturated tfs (+ tie_breaker *
      the rest), summed over query terms.

    Join-free plan: scan postings filtered to (query terms x boosted
    fields) -- the term predicate pushes to parquet -- decode varbyte
    blocks once, then one native expression scores with two literal
    maps: (field:term) -> boost*qtf*idf_field and field -> avgdl_field.
    most_fields is a single exchange (groupBy(doc_id) partial+final
    sum); best_fields shuffles once on (doc_id, field) and the second
    groupBy(doc_id) runs over the already-reduced per-field rows --
    both map-side-combined, no joins.
    """
    if mode not in ("most_fields", "best_fields", "cross_fields"):
        raise ValueError(f"unknown multi_match mode: {mode}")
    weights: dict[str, int] = {}
    for t in tokenize_py(query):
        weights[t] = weights.get(t, 0) + 1
    terms = list(weights)
    spark = mix.postings.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    use_fields = [
        f for f, b in boosts.items()
        if b and f != "*" and f in mix.field_stats
    ]
    if not terms or not use_fields:
        return empty

    stats = (
        mix.term_stats.filter(
            F.col("term").isin(terms) & F.col("field").isin(use_fields)
        )
        .select("field", "term", "df")
        .collect()
    )
    if not stats:
        return empty
    wmap_items: list[F.Column] = []
    if mode == "cross_fields":
        # blended statistics: one idf per TERM from the max df across
        # fields vs the max per-field docCount (driver metadata)
        df_blend: dict[str, int] = {}
        for r in stats:
            df_blend[r["term"]] = max(df_blend.get(r["term"], 0),
                                      int(r["df"]))
        n_blend = max(mix.field_stats[f_][0] for f_ in use_fields)
        for r in stats:
            f_, t_ = r["field"], r["term"]
            w = boosts[f_] * weights[t_] * _idf(n_blend, df_blend[t_])
            wmap_items += [F.lit(f_ + SEP + t_), F.lit(float(w))]
    else:
        for r in stats:
            f_, t_ = r["field"], r["term"]
            n_f, _ = mix.field_stats[f_]
            w = boosts[f_] * weights[t_] * _idf(n_f, int(r["df"]))
            wmap_items += [F.lit(f_ + SEP + t_), F.lit(float(w))]
    wmap = F.create_map(*wmap_items)
    amap = F.create_map(
        *[
            F.lit(x)
            for f_ in use_fields
            for x in (f_, float(mix.field_stats[f_][1]) or 1.0)
        ]
    )

    present_terms = sorted({r["term"] for r in stats})
    blocks = mix.postings.filter(
        F.col("term").isin(present_terms) & F.col("field").isin(use_fields)
    )
    # decode_blocks keys on `term` alone: thread the composite through.
    composite = blocks.withColumn("term", F.concat_ws(SEP, "field", "term"))
    decoded = decode_blocks(composite)
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    avgdl = amap[F.split_part("term", F.lit(SEP), F.lit(1))]
    scored = decoded.withColumn(
        "_s",
        wmap[F.col("term")] * tf / (tf + K1 * (1.0 - B + B * dl / avgdl)),
    ).filter(F.col("_s").isNotNull())
    tb = float(tie_breaker)
    if mode == "most_fields":
        return scored.groupBy("doc_id").agg(F.sum("_s").alias("score"))
    if mode == "cross_fields":
        # per-TERM dis_max over fields, then sum over terms: both
        # aggs hash on doc_id-prefixed keys, one exchange total
        per_term = scored.groupBy(
            "doc_id",
            F.split_part("term", F.lit(SEP), F.lit(2)).alias("_t"),
        ).agg(
            (F.max("_s") + F.lit(tb) * (F.sum("_s") - F.max("_s")))
            .alias("_ts")
        )
        return per_term.groupBy("doc_id").agg(F.sum("_ts").alias("score"))
    # best_fields: per-field subtotal first, then dis_max across fields
    per_field = scored.groupBy(
        "doc_id", F.split_part("term", F.lit(SEP), F.lit(1)).alias("_f")
    ).agg(F.sum("_s").alias("_fs"))
    return per_field.groupBy("doc_id").agg(
        (F.max("_fs") + F.lit(tb) * (F.sum("_fs") - F.max("_fs")))
        .alias("score")
    )


def combined_fields_scores(
    mix: MultiFieldIndex, query: str, weights: dict[str, float],
    operator: str = "or", minimum_should_match: int = 0,
) -> DataFrame:
    """(doc_id, score): the ``combined_fields`` query type.

    OpenSearch's ``combined_fields`` (Lucene CombinedFieldQuery,
    LUCENE-9341) scores as if the fields were ONE concatenated
    pseudo-field, with per-field multipliers folded into the term
    frequencies and lengths *before* BM25 saturation -- principled
    BM25F (Robertson et al., "Simple BM25 extension to multiple
    weighted fields", CIKM 2004) rather than a score-space mix:

        tf_c(t, d)  = sum_f w_f * tf_f(t, d)
        dl_c(d)     = sum_f w_f * dl_f(d)      (ALL fields of d, even
                                                ones never matching t)
        avgdl_c     = sum_f w_f * n_f * avgdl_f / n_union
        idf_c(t)    = idf(n_union, max_f df_f(t))   (blended stats,
                                                Lucene BlendedTermQuery)
        score(q, d) = sum_t qtf_t * idf_c(t) *
                      tf_c / (tf_c + K1 * (1 - B + B * dl_c / avgdl_c))

    n_union is the "*" pseudo-field docCount persisted at build.

    Plan: postings filtered to (query terms x fields) -- parquet
    ``In`` pushdown -- decode once, one groupBy(doc_id, term) folds
    the weighted tf sum; the per-doc combined length comes from the
    norms table (doc_lens) filtered to the query fields and reduced
    per doc, joined on doc_id.  The norms side is corpus-wide but
    2-column (doc_id, weighted dl); AQE picks the join strategy --
    at 100 TB this is the one shuffle Lucene avoids by reading norms
    per-hit, and the match-set side arrives already reduced.
    """
    weights = {
        f: w for f, w in weights.items()
        if w and f != "*" and f in mix.field_stats
    }
    qtf: dict[str, int] = {}
    for t in tokenize_py(query):
        qtf[t] = qtf.get(t, 0) + 1
    spark = mix.postings.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not qtf or not weights:
        return empty
    if mix.doc_lens is None:
        raise ValueError(
            "combined_fields needs the per-field norms table; this "
            "index was built/saved before doc_lens existed -- rebuild"
        )
    if "*" not in mix.field_stats:
        raise ValueError("index lacks the '*' union docCount -- rebuild")

    use_fields = list(weights)
    terms = list(qtf)
    stats = (
        mix.term_stats.filter(
            F.col("term").isin(terms) & F.col("field").isin(use_fields)
        )
        .select("field", "term", "df")
        .collect()
    )
    if not stats:
        return empty
    n_union = mix.field_stats["*"][0]
    avgdl_c = sum(
        w * mix.field_stats[f_][0] * mix.field_stats[f_][1]
        for f_, w in weights.items()
    ) / float(n_union)
    df_blend: dict[str, int] = {}
    for r in stats:
        df_blend[r["term"]] = max(df_blend.get(r["term"], 0), int(r["df"]))
    # literal maps: field:term -> w_f (tf multiplier), term -> qtf*idf
    wmap = F.create_map(
        *[
            F.lit(x)
            for r in stats
            for x in (r["field"] + SEP + r["term"], float(weights[r["field"]]))
        ]
    )
    imap = F.create_map(
        *[
            F.lit(x)
            for t_, d_ in df_blend.items()
            for x in (t_, float(qtf[t_] * _idf(n_union, d_)))
        ]
    )
    fmap = F.create_map(
        *[F.lit(x) for f_, w in weights.items() for x in (f_, float(w))]
    )

    present_terms = sorted(df_blend)
    blocks = mix.postings.filter(
        F.col("term").isin(present_terms) & F.col("field").isin(use_fields)
    )
    composite = blocks.withColumn("term", F.concat_ws(SEP, "field", "term"))
    decoded = decode_blocks(composite)
    wtf = (
        decoded.withColumn(
            "_wtf", wmap[F.col("term")] * F.col("tf").cast("double")
        )
        .filter(F.col("_wtf").isNotNull())
        .groupBy(
            "doc_id",
            F.split_part("term", F.lit(SEP), F.lit(2)).alias("_t"),
        )
        .agg(F.sum("_wtf").alias("wtf"))
    )
    wdl = (
        mix.doc_lens.filter(F.col("field").isin(use_fields))
        .groupBy("doc_id")
        .agg(F.sum(fmap[F.col("field")] * F.col("dl")).alias("wdl"))
    )
    joined = wtf.join(wdl, "doc_id")
    tf_c = F.col("wtf")
    sat = tf_c / (
        tf_c + K1 * (1.0 - B + B * F.col("wdl") / F.lit(avgdl_c))
    )
    # operator / minimum_should_match gate on the count of DISTINCT
    # query terms matched (any field), folded into the same groupBy --
    # the wire's combined_fields operator semantics, no extra pass
    if str(operator).lower() == "and":
        need = len(qtf)
    else:
        need = int(minimum_should_match)
    scored = (
        joined.withColumn("_s", imap[F.col("_t")] * sat)
        .groupBy("doc_id")
        .agg(F.sum("_s").alias("score"),
             F.count("*").alias("_n_terms"))
    )
    if need > 1:
        scored = scored.filter(F.col("_n_terms") >= need)
    return scored.drop("_n_terms")


def combined_fields_topk(
    mix: MultiFieldIndex, query: str, weights: dict[str, float], k: int = 10,
) -> DataFrame:
    """Top-k combined_fields, (score desc, doc_id asc) tie-break."""
    return (
        combined_fields_scores(mix, query, weights)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def multi_match_topk(
    mix: MultiFieldIndex, query: str, boosts: dict[str, float], k: int = 10,
    mode: str = "most_fields", tie_breaker: float = 0.0,
) -> DataFrame:
    """Top-k multi_match: TakeOrderedAndProject over the match set,
    ties broken (score desc, doc_id asc) like every other query path."""
    return (
        multi_match_scores(mix, query, boosts, mode=mode,
                           tie_breaker=tie_breaker)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
