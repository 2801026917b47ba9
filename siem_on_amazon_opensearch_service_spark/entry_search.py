"""Registry entries for the query-DSL surface: phrase queries
(positional index), boolean must/should/must_not, faceted search."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analysis import duckdb_tokens_sql
from .bm25 import B, K1
from .detfloat import round_det, round_det_sql
from .entry_queries import _built_index, _t, register

_PIX_CACHE: dict[str, object] = {}


def _pos_index(spark: SparkSession, sf_dir: str):
    from .index.positional import build_positional_index

    key = (spark.sparkContext.applicationId, sf_dir)
    ix = _PIX_CACHE.get(key)
    if ix is None:
        docs = _t(spark, sf_dir, "documents")
        ix = build_positional_index(spark, docs, text_col="text",
                                    id_col="doc_id", salt_threshold=200)
        ix.postings = ix.postings.persist()
        ix.term_stats = ix.term_stats.persist()
        _PIX_CACHE[key] = ix
    return ix


PHRASE = "table value"
_PHRASE_TERMS = PHRASE.split()

_TOK = duckdb_tokens_sql("text")

_PHRASE_SQL = f"""
WITH d AS (SELECT doc_id, {_TOK} AS t FROM documents),
dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM d),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tokpos AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS term
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)
),
slots(slot, term) AS (VALUES {", ".join(f"({i}, '{t}')" for i, t in enumerate(_PHRASE_TERMS))}),
dft AS (
  SELECT s.term, count(DISTINCT tokpos.doc_id)::DOUBLE AS df
  FROM tokpos JOIN slots s ON tokpos.term = s.term GROUP BY s.term
),
idfsum AS (
  SELECT sum(ln(1 + (stats.n - df + 0.5) / (df + 0.5))) AS v
  FROM dft, stats
),
adj AS (
  SELECT tokpos.doc_id, tokpos.pos - s.slot AS adj, s.slot
  FROM tokpos JOIN slots s ON tokpos.term = s.term
),
cov AS (
  SELECT doc_id, adj FROM adj WHERE adj >= 0
  GROUP BY doc_id, adj HAVING count(DISTINCT slot) = {len(_PHRASE_TERMS)}
),
freq AS (SELECT doc_id, count(*)::DOUBLE AS ptf FROM cov GROUP BY doc_id),
scored AS (
  SELECT f.doc_id,
         idfsum.v * f.ptf
           / (f.ptf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) AS s
  FROM freq f JOIN dl ON dl.doc_id = f.doc_id, stats, idfsum
)
SELECT doc_id, {round_det_sql('s', 4)} AS score
FROM scored ORDER BY s DESC, doc_id LIMIT 20
"""


PROX_SLOP = 3

_PROX_SQL = f"""
WITH d AS (SELECT doc_id, {_TOK} AS t FROM documents),
dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM d),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tokpos AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS term
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)
),
dft AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tokpos
  WHERE term IN ('{_PHRASE_TERMS[0]}', '{_PHRASE_TERMS[1]}') GROUP BY term
),
idfsum AS (
  SELECT sum(ln(1 + (stats.n - df + 0.5) / (df + 0.5))) AS v
  FROM dft, stats
),
pairs AS (
  SELECT a.doc_id, a.pos AS pa, b.pos AS pb
  FROM tokpos a JOIN tokpos b ON a.doc_id = b.doc_id
  WHERE a.term = '{_PHRASE_TERMS[0]}' AND b.term = '{_PHRASE_TERMS[1]}'
    AND b.pos > a.pos AND b.pos <= a.pos + 1 + {PROX_SLOP}
),
freq AS (
  SELECT doc_id, sum(1.0 / (1.0 + (pb - pa - 1))) AS ptf
  FROM pairs GROUP BY doc_id
),
scored AS (
  SELECT f.doc_id,
         idfsum.v * f.ptf
           / (f.ptf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) AS s
  FROM freq f JOIN dl ON dl.doc_id = f.doc_id, stats, idfsum
)
SELECT doc_id, {round_det_sql('s', 4)} AS score
FROM scored ORDER BY s DESC, doc_id LIMIT 20
"""


SPAN_A, SPAN_B = "table", "value"
SPAN_SLOP = 4
SPAN_FIRST_END = 15

_SPAN_NEAR_SQL = f"""
WITH d AS (SELECT doc_id, {_TOK} AS t FROM documents),
dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM d),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tokpos AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS term
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)
),
dft AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tokpos
  WHERE term IN ('{SPAN_A}', '{SPAN_B}') GROUP BY term
),
idfsum AS (
  SELECT sum(ln(1 + (stats.n - df + 0.5) / (df + 0.5))) AS v
  FROM dft, stats
),
pairs AS (
  SELECT a.doc_id, abs(b.pos - a.pos) - 1 AS gap
  FROM tokpos a JOIN tokpos b ON a.doc_id = b.doc_id
  WHERE a.term = '{SPAN_A}' AND b.term = '{SPAN_B}'
    AND abs(b.pos - a.pos) - 1 <= {SPAN_SLOP}
),
freq AS (
  SELECT doc_id, sum(1.0 / (1.0 + gap)) AS ptf FROM pairs GROUP BY doc_id
),
scored AS (
  SELECT f.doc_id,
         idfsum.v * f.ptf
           / (f.ptf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) AS s
  FROM freq f JOIN dl ON dl.doc_id = f.doc_id, stats, idfsum
)
SELECT doc_id, {round_det_sql('s', 4)} AS score
FROM scored ORDER BY s DESC, doc_id LIMIT 20
"""

_SPAN_FIRST_SQL = f"""
WITH d AS (SELECT doc_id, {_TOK} AS t FROM documents),
dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM d),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tokpos AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS term
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)
),
fdf AS (
  SELECT count(DISTINCT doc_id)::DOUBLE AS df FROM tokpos
  WHERE term = '{SPAN_A}'
),
fidf AS (
  SELECT ln(1 + (stats.n - df + 0.5) / (df + 0.5)) AS v FROM fdf, stats
),
freq AS (
  SELECT doc_id, count(*)::DOUBLE AS ptf FROM tokpos
  WHERE term = '{SPAN_A}' AND pos + 1 <= {SPAN_FIRST_END} GROUP BY doc_id
),
scored AS (
  SELECT f.doc_id,
         fidf.v * f.ptf
           / (f.ptf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) AS s
  FROM freq f JOIN dl ON dl.doc_id = f.doc_id, stats, fidf
)
SELECT doc_id, {round_det_sql('s', 4)} AS score
FROM scored ORDER BY s DESC, doc_id LIMIT 20
"""


PP_EXACT = ["table"]          # exact leading slots
PP_PREFIX = "val"             # trailing prefix slot (matches value/...)
PHRASE_PREFIX = " ".join(PP_EXACT + [PP_PREFIX])

_PP_SQL = f"""
WITH d AS (SELECT doc_id, {_TOK} AS t FROM documents),
dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM d),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tokpos AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS term
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)
),
adjp AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, pos - {i} AS adj, {i} AS slot FROM tokpos "
      f"WHERE term = '{t}'" for i, t in enumerate(PP_EXACT))}
  UNION ALL
  SELECT doc_id, pos - {len(PP_EXACT)} AS adj, {len(PP_EXACT)} AS slot
  FROM tokpos WHERE term LIKE '{PP_PREFIX}%'
),
covp AS (
  SELECT doc_id, adj FROM adjp WHERE adj >= 0
  GROUP BY doc_id, adj HAVING count(DISTINCT slot) = {len(PP_EXACT) + 1}
),
freqp AS (SELECT doc_id, count(*)::DOUBLE AS ptf FROM covp GROUP BY doc_id),
uniondf AS (
  SELECT count(DISTINCT doc_id)::DOUBLE AS v FROM tokpos
  WHERE term LIKE '{PP_PREFIX}%'
),
dfte AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tokpos
  WHERE term IN ({", ".join(f"'{t}'" for t in PP_EXACT)}) GROUP BY term
),
idfsump AS (
  SELECT (SELECT sum(ln(1 + (stats.n - df + 0.5) / (df + 0.5)))
          FROM dfte, stats)
       + (SELECT ln(1 + (stats.n - uniondf.v + 0.5) / (uniondf.v + 0.5))
          FROM uniondf, stats) AS v
),
scoredp AS (
  SELECT f.doc_id,
         idfsump.v * f.ptf
           / (f.ptf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) AS s
  FROM freqp f JOIN dl ON dl.doc_id = f.doc_id, stats, idfsump
)
SELECT doc_id, {round_det_sql('s', 4)} AS score
FROM scoredp ORDER BY s DESC, doc_id LIMIT 20
"""


@register(
    "ft_phrase_topk",
    f"""
    SELECT 'phrase' AS chk, doc_id, score FROM ({_PHRASE_SQL})
    UNION ALL
    SELECT 'phrase_prefix', doc_id, score FROM ({_PP_SQL})
    UNION ALL
    SELECT 'proximity', doc_id, score FROM ({_PROX_SQL})
    UNION ALL
    SELECT 'span_near', doc_id, score FROM ({_SPAN_NEAR_SQL})
    UNION ALL
    SELECT 'span_first', doc_id, score FROM ({_SPAN_FIRST_SQL})
    """,
)
def ft_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """match_phrase (chk='phrase': Lucene PhraseQuery shape, tf =
    phrase frequency, idf = sum of term idfs) + match_phrase_prefix
    (chk='phrase_prefix': the search-as-you-type query -- last token
    is a prefix expanded INSIDE the postings scan, union-df idf for
    the prefix slot) + sloppy phrase (chk='proximity': query_string
    ``"a b"~{PROX_SLOP}``, ordered matches with total gap <= slop
    weighted 1/(1+gap) -- Lucene sloppyFreq shape) + span queries
    (chk='span_near': unordered two-clause near, every child
    combination a match weighted 1/(1+gap); chk='span_first': match
    confined to the first {SPAN_FIRST_END} positions, full-corpus
    idf), all through the positional index."""
    from .index.positional import (phrase_prefix_topk, phrase_topk,
                                   proximity_topk)
    from .index.spans import span_topk

    pix = _pos_index(spark, sf_dir)
    top = phrase_topk(pix, PHRASE, k=20).select(
        F.lit("phrase").alias("chk"),
        "doc_id", round_det("score", 4).alias("score"),
    )
    pp = phrase_prefix_topk(pix, PHRASE_PREFIX, k=20).select(
        F.lit("phrase_prefix").alias("chk"),
        "doc_id", round_det("score", 4).alias("score"),
    )
    prox = proximity_topk(pix, PHRASE, slop=PROX_SLOP, k=20).select(
        F.lit("proximity").alias("chk"),
        "doc_id", round_det("score", 4).alias("score"),
    )
    t = lambda x: {"span_term": {"text": x}}  # noqa: E731
    near = span_topk(pix, {"span_near": {
        "clauses": [t(SPAN_A), t(SPAN_B)], "slop": SPAN_SLOP,
        "in_order": False}}, k=20).select(
        F.lit("span_near").alias("chk"),
        "doc_id", round_det("score", 4).alias("score"),
    )
    first = span_topk(pix, {"span_first": {
        "match": t(SPAN_A), "end": SPAN_FIRST_END}}, k=20).select(
        F.lit("span_first").alias("chk"),
        "doc_id", round_det("score", 4).alias("score"),
    )
    return (top.unionByName(pp).unionByName(prox)
            .unionByName(near).unionByName(first))


_BOOL_MUST = ["table", "value"]
_BOOL_SHOULD = ["spark"]
_BOOL_NOT = ["slow"]
_BOOL_SCORING = _BOOL_MUST + _BOOL_SHOULD

_BOOL_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scoring(term) AS (VALUES {", ".join(f"('{t}')" for t in _BOOL_SCORING)}),
per_doc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf
             / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) AS s,
         count(DISTINCT CASE WHEN tf.term IN
               ({", ".join(f"'{t}'" for t in _BOOL_MUST)}) THEN tf.term END)
           AS n_must
  FROM tf JOIN scoring USING (term) JOIN dft USING (term)
       JOIN dl USING (doc_id), stats
  GROUP BY tf.doc_id
),
kept AS (
  SELECT * FROM per_doc
  WHERE n_must = {len(_BOOL_MUST)}
    AND doc_id NOT IN (
      SELECT DISTINCT doc_id FROM tok
      WHERE term IN ({", ".join(f"'{t}'" for t in _BOOL_NOT)}))
)
SELECT doc_id, {round_det_sql('s', 4)} AS score
FROM kept ORDER BY s DESC, doc_id LIMIT 20
"""


def ft_bool_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bool-query family in one gated entry: must/should/must_not
    conjunction + exclusion, per-clause boosts (query_string term^N),
    and minimum_should_match=2 -- each variant's top-20 tagged and
    unioned."""
    from .index.boolquery import bool_topk

    ix = _built_index(spark, sf_dir)

    def tagged(tag: str, top: DataFrame) -> DataFrame:
        return top.select(
            F.lit(tag).alias("variant"), "doc_id",
            round_det("score", 4).alias("score"),
        )

    return (
        tagged("bool", bool_topk(
            ix, must=_BOOL_MUST, should=_BOOL_SHOULD, must_not=_BOOL_NOT,
            k=20,
        ))
        .unionByName(tagged("boosted", bool_topk(
            ix, should=["spark", "table"], k=20, boosts={"spark": 3.0},
        )))
        .unionByName(tagged("min_should", bool_topk(
            ix, should=_MSM_SHOULD, k=20, minimum_should_match=2,
        )))
    )


_PREFIX_SQL = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOK}) AS term FROM documents
    )
    SELECT DISTINCT doc_id, 1.0::DOUBLE AS score FROM tok
    WHERE term LIKE 'st%'
    ORDER BY doc_id LIMIT 30
"""


_TOPHITS_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
q(term) AS (VALUES ('spark'), ('table'), ('join'), ('stream')),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf
             / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN dft USING (term)
       JOIN dl USING (doc_id), stats
  GROUP BY tf.doc_id
),
ranked AS (
  SELECT d.lang, s.doc_id, s.s,
         row_number() OVER (PARTITION BY d.lang ORDER BY s.s DESC, s.doc_id)
           AS rn
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
)
SELECT lang, rn AS rank, doc_id, {round_det_sql('s', 4)} AS score
FROM ranked WHERE rn <= 3
"""


def _top_hits_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`top_hits` sub-aggregation: the best 3 hits inside every facet
    bucket (the dashboard per-group table) — window row_number over
    the match set joined to the facet column."""
    from pyspark.sql import Window

    from .index.query import bm25_scores

    ix = _built_index(spark, sf_dir)
    scored = bm25_scores(ix, _FACET_QUERY)
    with_lang = scored.join(ix.docs.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        with_lang.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("lang", "rank", "doc_id", round_det("score", 4).alias("score"))
    )


_BOOST_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
q(term, boost) AS (VALUES ('spark', 3.0), ('table', 1.0)),
scored AS (
  SELECT tf.doc_id,
         sum(q.boost * ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf
             / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN dft USING (term)
       JOIN dl USING (doc_id), stats
  GROUP BY tf.doc_id
)
SELECT doc_id, {round_det_sql('s', 4)} AS score
FROM scored ORDER BY s DESC, doc_id LIMIT 20
"""




_MSM_SHOULD = ["spark", "join", "stream"]

_MSM_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {", ".join(f"('{t}')" for t in _MSM_SHOULD)}),
per_doc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf
             / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) AS s,
         count(DISTINCT tf.term) AS n_should
  FROM tf JOIN q USING (term) JOIN dft USING (term)
       JOIN dl USING (doc_id), stats
  GROUP BY tf.doc_id
)
SELECT doc_id, {round_det_sql('s', 4)} AS score
FROM per_doc WHERE n_should >= 2
ORDER BY s DESC, doc_id LIMIT 20
"""


# register the merged bool family now that all three oracle bodies
# exist (the callable itself is defined above).
register(
    "ft_bool_variants",
    f"""
    SELECT 'bool' AS variant, doc_id, score FROM ({_BOOL_SQL})
    UNION ALL
    SELECT 'boosted', doc_id, score FROM ({_BOOST_SQL})
    UNION ALL
    SELECT 'min_should', doc_id, score FROM ({_MSM_SQL})
    """,
)(ft_bool_variants)


_FUZZY_TERM = "tabl"  # one deletion from 'table'

_FUZZY_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
matched AS (
  SELECT term FROM dft WHERE damerau_levenshtein(term, '{_FUZZY_TERM}') <= 1
),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf
             / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) AS s
  FROM tf JOIN matched USING (term) JOIN dft USING (term)
       JOIN dl USING (doc_id), stats
  GROUP BY tf.doc_id
)
SELECT doc_id, {round_det_sql('s', 4)} AS score
FROM scored ORDER BY s DESC, doc_id LIMIT 20
"""


_REGEXP_PATTERN = "s[a-z]*a[a-z]*"  # scan, small, spark, stream

_REGEXP_SQL = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOK}) AS term FROM documents
    )
    SELECT DISTINCT doc_id, 1.0::DOUBLE AS score FROM tok
    WHERE regexp_matches(term, '^(?:{_REGEXP_PATTERN})$')
    ORDER BY doc_id LIMIT 30
"""

_SUGGEST_TEXT = "spak jion"  # -> spark/scan, join

_SUGGEST_SQL = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOK}) AS term FROM documents
    ),
    dict AS (
      SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY 1
    ),
    toks(token) AS (VALUES {", ".join(f"('{t}')" for t in _SUGGEST_TEXT.split())}),
    cand AS (
      SELECT token, term AS suggestion,
             levenshtein(term, token) AS distance, df
      FROM dict, toks
      WHERE levenshtein(term, token) <= 2 AND term <> token
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY token ORDER BY distance, df DESC, suggestion) AS rank
      FROM cand
    )
    SELECT df AS doc_id, rank::DOUBLE AS score,
           token || '->' || suggestion AS extra
    FROM ranked WHERE rank <= 5
"""


_MLT_SEED_DOC = 0
_MLT_K = 15

_MLT_SQL = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOK}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
           FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
    stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
    dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
    sel AS (
      SELECT t.term
      FROM tf t JOIN dft USING (term), stats
      WHERE t.doc_id = {_MLT_SEED_DOC} AND t.tf >= 2 AND dft.df >= 2
      ORDER BY t.tf * ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
        DESC, t.term
      LIMIT 25
    ),
    msm AS (SELECT floor(0.3 * count(*))::BIGINT AS m FROM sel),
    scored AS (
      SELECT tf.doc_id,
             sum(ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf
                 / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)))
               AS s,
             count(DISTINCT tf.term) AS nm
      FROM tf JOIN sel USING (term) JOIN dft USING (term)
           JOIN dl USING (doc_id), stats
      WHERE tf.doc_id <> {_MLT_SEED_DOC}
      GROUP BY tf.doc_id
    )
    SELECT doc_id, {round_det_sql('s', 4)} AS score
    FROM scored, msm WHERE nm >= msm.m
    ORDER BY s DESC, doc_id LIMIT {_MLT_K}
"""


@register(
    "ft_multiterm",
    f"""
    SELECT 'prefix' AS qtype, doc_id, score, '' AS extra FROM ({_PREFIX_SQL})
    UNION ALL
    SELECT 'fuzzy', doc_id, score, '' FROM ({_FUZZY_SQL})
    UNION ALL
    SELECT 'regexp', doc_id, score, '' FROM ({_REGEXP_SQL})
    UNION ALL
    SELECT 'suggest', doc_id, score, extra FROM ({_SUGGEST_SQL})
    UNION ALL
    SELECT 'mlt', doc_id, score, '' FROM ({_MLT_SQL})
    """,
)
def ft_multiterm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-term dictionary-expansion family in one gated entry:
    prefix st* (constant-score rewrite; the LIKE predicate pushes down
    to the term-sorted parquet scan), fuzzy 'tabl'~1 (edit-distance
    expansion over term_stats, matched variants scored and summed),
    regexp /s[a-z]*a[a-z]*/ (anchored full-term regex over the
    dictionary, ConstantScore rewrite — OpenSearch ``regexp``), the
    term suggester ("did you mean": per-token dictionary candidates
    ranked distance asc, df desc — OpenSearch ``suggest.term``;
    suggest rows carry df as doc_id, rank as score, and
    'token->suggestion' as extra), and ``more_like_this`` seeded by
    doc 0's text (tf-idf term selection, Lucene MLT defaults
    min_term_freq=2/min_doc_freq=2/max_query_terms=25/msm=30%, seed
    doc excluded from hits)."""
    from .index.boolquery import (fuzzy_topk, more_like_this,
                                  multiterm_topk, regexp_topk, term_suggest)

    ix = _built_index(spark, sf_dir)
    prefix = multiterm_topk(ix, "st%", k=30).select(
        F.lit("prefix").alias("qtype"), "doc_id",
        round_det("score", 4).alias("score"), F.lit("").alias("extra"),
    )
    fuzzy = fuzzy_topk(ix, _FUZZY_TERM, k=20, max_edits=1).select(
        F.lit("fuzzy").alias("qtype"), "doc_id",
        round_det("score", 4).alias("score"), F.lit("").alias("extra"),
    )
    rex = regexp_topk(ix, _REGEXP_PATTERN, k=30).select(
        F.lit("regexp").alias("qtype"), "doc_id",
        round_det("score", 4).alias("score"), F.lit("").alias("extra"),
    )
    sug = term_suggest(ix, _SUGGEST_TEXT, max_edits=2, size=5).select(
        F.lit("suggest").alias("qtype"),
        F.col("df").alias("doc_id"),
        F.col("rank").cast("double").alias("score"),
        F.concat_ws("->", "token", "suggestion").alias("extra"),
    )
    seed_text = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == _MLT_SEED_DOC)
        .select("text").collect()[0]["text"]
    )
    mlt = more_like_this(
        ix, seed_text, exclude_doc_ids=[_MLT_SEED_DOC], k=_MLT_K,
    ).select(
        F.lit("mlt").alias("qtype"), "doc_id",
        round_det("score", 4).alias("score"), F.lit("").alias("extra"),
    )
    return (prefix.unionByName(fuzzy).unionByName(rex)
            .unionByName(sug).unionByName(mlt))


@register(
    "ft_index_stats",
    f"""
    WITH tf AS (
      SELECT doc_id, term FROM (
        SELECT doc_id, unnest({_TOK}) AS term FROM documents)
      GROUP BY doc_id, term
    ), dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
    SELECT (SELECT count(*) FROM tf)::BIGINT AS n_postings,
           (SELECT count(*) FROM dft WHERE df > 200)::BIGINT
             AS n_salted_terms,
           TRUE AS layout_ok
    """,
)
def ft_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index storage metrics (the A8 build-metrics analog at rest).
    Oracle-checkable formulation: total postings and salted-term count
    are content-determined (salting is exactly df > threshold), and
    the engine-internal compressed layout is asserted as a boolean
    (blocks exist, 1-8 bytes/posting for delta+varbyte on dense ids)
    that the oracle pins to TRUE."""
    ix = _built_index(spark, sf_dir)
    byte_cols = (
        F.octet_length("doc_ids_vb") + F.octet_length("tfs_vb")
        + F.octet_length("dls_vb")
    )
    agged = ix.postings.agg(
        F.count("*").alias("n_blocks"),
        F.sum("doc_count").cast("long").alias("n_postings"),
        F.sum(byte_cols).cast("long").alias("compressed_bytes"),
        (F.sum(byte_cols) / F.sum("doc_count")).alias("bytes_per_posting"),
    )
    # df in term_stats is summed from compressed block doc_counts, so
    # this cross-checks the salting rule AND the block bookkeeping
    # against the oracle's raw-token df.
    salted = ix.term_stats.agg(
        F.count(F.when(F.col("df") > 200, 1)).alias("n_salted_terms")
    )
    layout_ok = (
        (F.col("n_blocks") > 0) & (F.col("compressed_bytes") > 0)
        & (F.col("bytes_per_posting") >= 1.0)
        & (F.col("bytes_per_posting") <= 8.0)
    )
    return agged.crossJoin(salted).select(
        "n_postings", "n_salted_terms", layout_ok.alias("layout_ok")
    )


_FILTER_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
q(term) AS (VALUES ('spark'), ('table')),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf
             / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN dft USING (term)
       JOIN dl USING (doc_id), stats
  GROUP BY tf.doc_id
)
SELECT s.doc_id, {round_det_sql('s.s', 4)} AS score
FROM scored s JOIN documents d ON d.doc_id = s.doc_id
WHERE d.lang = 'en'
ORDER BY s.s DESC, s.doc_id LIMIT 20
"""


_HL_TERM = "spark"

_HL_SQL = f"""
    WITH m AS (
      SELECT doc_id, lower(text) AS lt, text FROM documents
      WHERE strpos(lower(text), '{_HL_TERM}') > 0
    )
    SELECT doc_id,
      substr(text, greatest(strpos(lt, '{_HL_TERM}') - 20, 1), 60) AS snippet
    FROM m ORDER BY doc_id LIMIT 20
"""


_PAGE2_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
q(term) AS (VALUES ('spark'), ('table')),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf
             / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN dft USING (term)
       JOIN dl USING (doc_id), stats
  GROUP BY tf.doc_id
),
ranked AS (
  SELECT s.doc_id, s.s,
         row_number() OVER (ORDER BY s.s DESC, s.doc_id) AS rn
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
  WHERE d.lang = 'en'
)
SELECT doc_id, {round_det_sql('s', 4)} AS score FROM ranked WHERE rn BETWEEN 21 AND 30
"""


_SCORED_CTE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
q(term) AS (VALUES ('spark'), ('table')),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf
             / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN dft USING (term)
       JOIN dl USING (doc_id), stats
  GROUP BY tf.doc_id
)
"""

_COLLAPSE_SQL = f"""
{_SCORED_CTE},
ranked AS (
  SELECT s.doc_id, s.s, d.lang,
         row_number() OVER (PARTITION BY d.lang
           ORDER BY s.s DESC, s.doc_id) AS rn
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
)
SELECT doc_id, {round_det_sql('s', 4)} AS score, lang AS snippet
FROM ranked WHERE rn = 1 ORDER BY s DESC, doc_id LIMIT 10
"""

_FSCORE_SQL = f"""
{_SCORED_CTE}
SELECT s.doc_id, {round_det_sql('s.s * log10(1 + dl.dl)', 4)} AS score
FROM scored s JOIN dl USING (doc_id)
ORDER BY s.s * log10(1 + dl.dl) DESC, s.doc_id LIMIT 15
"""

_RESCORE_SQL = f"""
{_SCORED_CTE},
q2(term) AS (VALUES ('join'), ('stream')),
scored2 AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf
             / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) AS s2
  FROM tf JOIN q2 USING (term) JOIN dft USING (term)
       JOIN dl USING (doc_id), stats
  GROUP BY tf.doc_id
),
win AS (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id) AS rn
  FROM scored QUALIFY rn <= 30
)
SELECT w.doc_id,
       {round_det_sql('1.0 * w.s + 2.0 * coalesce(s2.s2, 0)', 4)} AS score
FROM win w LEFT JOIN scored2 s2 USING (doc_id)
ORDER BY 1.0 * w.s + 2.0 * coalesce(s2.s2, 0) DESC, w.doc_id LIMIT 10
"""


_DBQ_SQL = f"""
{_SCORED_CTE},
del AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'stream')
SELECT doc_id, {round_det_sql('s', 4)} AS score
FROM scored WHERE doc_id NOT IN (SELECT doc_id FROM del)
ORDER BY s DESC, doc_id LIMIT 10
"""

_SLICE_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
SELECT DISTINCT doc_id FROM tok
WHERE term = 'spark' AND doc_id % 4 = 1
"""

#: session-cached saved-index dirs with _delete_by_query applied once
_DBQ_CACHE: dict = {}


def _dbq_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Save the cached index to disk ONCE per session and run the real
    ``_delete_by_query`` task against it (tombstone appends through the
    storage seam). Idempotent: re-running the delete adds 0 rows, so
    repeated entry invocations see identical state."""
    import tempfile

    from .index.docops import delete_by_query

    key = (spark.sparkContext.applicationId, sf_dir)
    p = _DBQ_CACHE.get(key)
    if p is None:
        p = tempfile.mkdtemp(prefix="spark_graft_dbq_ix_")
        _built_index(spark, sf_dir).save(spark, p, buckets=4)
        delete_by_query(spark, p, {"query": {"match": {"text": "stream"}}})
        _DBQ_CACHE[key] = p
    return p


@register(
    "ft_filtered_search",
    f"""
    SELECT 'filtered' AS chk, doc_id, score, '' AS snippet
    FROM ({_FILTER_SQL})
    UNION ALL
    SELECT 'highlight', doc_id, 0.0 AS score, snippet FROM ({_HL_SQL})
    UNION ALL
    SELECT 'page2', doc_id, score, '' FROM ({_PAGE2_SQL})
    UNION ALL
    SELECT 'collapse', doc_id, score, snippet FROM ({_COLLAPSE_SQL})
    UNION ALL
    SELECT 'fscore', doc_id, score, '' FROM ({_FSCORE_SQL})
    UNION ALL
    SELECT 'rescore', doc_id, score, '' FROM ({_RESCORE_SQL})
    UNION ALL
    SELECT 'dbq', doc_id, score, '' FROM ({_DBQ_SQL})
    UNION ALL
    SELECT 'slice', doc_id, 0.0 AS score, '' FROM ({_SLICE_SQL})
    """,
)
def ft_filtered_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hits-presentation family in one gated entry: (a) OpenSearch
    filter context -- BM25 match scored as usual, then a non-scoring
    keyword filter (lang = en) applied as a join against the docs
    side-table, never touching scores, exactly like a `bool.filter`
    clause; (b) highlight/snippet extraction (OpenSearch `highlight`):
    a 60-char window around the first hit, native string ops only;
    (c) search_after deep pagination (chk='page2'): the page-1 cursor
    (20th hit's exact score + doc_id, a 1-row collect) re-enters as a
    filter predicate, so page 2 plans as Filter ->
    TakeOrderedAndProject with no offset sort -- the OpenSearch
    search_after contract; (d) `collapse` on lang (best hit per lang,
    field carried in snippet); (e) `function_score`
    field_value_factor (score * log10(1+doclen), multiply mode --
    OpenSearch log1p is the common logarithm);
    (f) `rescore`: top-30 window re-ranked by 1*primary +
    2*BM25('join stream') -- the secondary scorer touches only the
    window; (g) chk='dbq': the `_delete_by_query` task API run for
    real against a SAVED index (tombstone appends through the storage
    seam), then live top-k -- Lucene deleted-docs semantics: masked
    docs never occupy a top-k slot while idf/avgdl keep full-corpus
    stats until compaction; (h) chk='slice': sliced-scroll slice 1 of
    4 over the 'spark' match set -- slices partition the matched set
    disjointly (index/docops.py)."""
    from .index.docops import slice_hits
    from .index.query import (bm25_scores, collapse_topk, function_score,
                              rescore_topk, search_after)
    from .index.tombstones import live_topk

    ix = _built_index(spark, sf_dir)
    scored = bm25_scores(ix, "spark table")  # full match set, no limit
    en = ix.docs.filter(F.col("lang") == "en").select("doc_id")
    base = scored.join(en, "doc_id")
    filtered = (
        base
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
        .select(
            F.lit("filtered").alias("chk"), "doc_id",
            round_det("score", 4).alias("score"),
            F.lit("").alias("snippet"),
        )
    )
    # cursor = last hit of page 1 (1 row to the driver, metadata-sized)
    cur = (
        base.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)
        .orderBy(F.asc("score"), F.desc("doc_id")).limit(1)
        .collect()[0]
    )
    page2 = search_after(base, cur["score"], cur["doc_id"], size=10).select(
        F.lit("page2").alias("chk"), "doc_id",
        round_det("score", 4).alias("score"), F.lit("").alias("snippet"),
    )

    d = _t(spark, sf_dir, "documents")
    lt = F.lower(F.col("text"))
    pos = F.instr(lt, _HL_TERM)
    highlight = (
        d.filter(pos > 0)
        .select(
            "doc_id",
            F.substring(
                F.col("text"), F.greatest(pos - 20, F.lit(1)), 60
            ).alias("snippet"),
        )
        .orderBy("doc_id")
        .limit(20)
        .select(
            F.lit("highlight").alias("chk"), "doc_id",
            F.lit(0.0).alias("score"), "snippet",
        )
    )
    collapse = collapse_topk(scored, ix.docs, "lang", k=10).select(
        F.lit("collapse").alias("chk"), "doc_id",
        round_det("score", 4).alias("score"), F.col("lang").alias("snippet"),
    )
    fscore = function_score(
        scored, ix.docs, "doclen", modifier="log1p", boost_mode="multiply",
    )
    fscore = (
        fscore.orderBy(F.desc("score"), F.asc("doc_id")).limit(15)
        .select(
            F.lit("fscore").alias("chk"), "doc_id",
            round_det("score", 4).alias("score"), F.lit("").alias("snippet"),
        )
    )
    rescored = rescore_topk(
        scored, bm25_scores(ix, "join stream"),
        window_size=30, query_weight=1.0, rescore_query_weight=2.0, k=10,
    ).select(
        F.lit("rescore").alias("chk"), "doc_id",
        round_det("score", 4).alias("score"), F.lit("").alias("snippet"),
    )
    dbq_path = _dbq_index_path(spark, sf_dir)
    dbq = live_topk(ix, spark, dbq_path, "spark table", k=10).select(
        F.lit("dbq").alias("chk"), "doc_id",
        round_det("score", 4).alias("score"), F.lit("").alias("snippet"),
    )
    slice1 = slice_hits(
        ix, {"query": {"match": {"text": "spark"}}}, 1, 4
    ).select(
        F.lit("slice").alias("chk"), "doc_id",
        F.lit(0.0).alias("score"), F.lit("").alias("snippet"),
    )
    return (filtered.unionByName(highlight).unionByName(page2)
            .unionByName(collapse).unionByName(fscore)
            .unionByName(rescored).unionByName(dbq).unionByName(slice1))


_HY_QUERY = "spark table join stream"
_HY_DEPTH = 50
_HY_K = 20

_HY_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {", ".join(f"('{t}')" for t in _HY_QUERY.split())}),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf
             / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) AS s
  FROM tf JOIN q USING (term) JOIN dft USING (term)
       JOIN dl USING (doc_id), stats
  GROUP BY tf.doc_id
),
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rank
  FROM scored QUALIFY rank <= {_HY_DEPTH}
),
qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0),
v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
vcut AS (
  SELECT vec_id, {round_det_sql('{cos}', 4)} AS c4,
         row_number() OVER (ORDER BY {{cos}} DESC, vec_id) AS cutrank
  FROM v, qv QUALIFY cutrank <= {_HY_DEPTH}
),
vec AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY c4 DESC, vec_id) AS rank
  FROM vcut
),
fused AS (
  SELECT doc_id, sum(1.0 / (60.0 + rank)) AS rrf_score FROM (
    SELECT doc_id, rank FROM lex
    UNION ALL SELECT doc_id, rank FROM vec
  ) GROUP BY doc_id
)
SELECT doc_id, {round_det_sql('rrf_score', 6)} AS rrf_score
FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {_HY_K}
""".format(cos=(
    "list_dot_product(e, q) / (sqrt(list_dot_product(e, e))"
    " * sqrt(list_dot_product(q, q)))"
))


@register("ft_hybrid", _HY_SQL)
def ft_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenSearch 2.x hybrid retrieval, driver-gated: a lexical BM25
    sub-query over the inverted index and a k-NN cosine sub-query over
    the embeddings table, each cut to depth 50, fused by Reciprocal
    Rank Fusion (rank_const 60, the engine default) -- the oracle
    recomputes both sub-rankings and the fusion in SQL
    (operators/hybrid.py)."""
    from .operators.hybrid import hybrid_topk

    ix = _built_index(spark, sf_dir)
    vecs = _t(spark, sf_dir, "embeddings")
    row = (
        vecs.filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    )
    top = hybrid_topk(
        ix, vecs, _HY_QUERY, list(row["embedding"]),
        k=_HY_K, depth=_HY_DEPTH,
    )
    return top.select("doc_id", round_det("rrf_score", 6).alias("rrf_score"))


_MM_BOOSTS = {"body": 1.0, "title": 2.0}
_MM_QUERY = "spark table join stream"

_MM_SQL = f"""
WITH d AS (
  SELECT doc_id, {_TOK} AS bt FROM documents
),
per AS (
  SELECT doc_id, 'body' AS field, bt AS toks FROM d
  UNION ALL SELECT doc_id, 'title', bt[1:8] FROM d
),
tok AS (SELECT doc_id, field, unnest(toks) AS term FROM per),
dl AS (SELECT doc_id, field, count(*)::DOUBLE AS dl FROM tok GROUP BY 1, 2),
stats AS (
  SELECT field, count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl GROUP BY field
),
tf AS (
  SELECT doc_id, field, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2, 3
),
dft AS (SELECT field, term, count(*)::DOUBLE AS df FROM tf GROUP BY 1, 2),
q(term) AS (VALUES {", ".join(f"('{t}')" for t in _MM_QUERY.split())}),
boosts(field, boost) AS (
  VALUES {", ".join(f"('{f}', {b})" for f, b in _MM_BOOSTS.items())}
),
per_field AS (
  SELECT tf.doc_id, tf.field,
    sum(b.boost * ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf
        / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl))) AS fs
  FROM tf JOIN q USING (term)
       JOIN dft ON dft.field = tf.field AND dft.term = tf.term
       JOIN dl ON dl.doc_id = tf.doc_id AND dl.field = tf.field
       JOIN stats s ON s.field = tf.field
       JOIN boosts b ON b.field = tf.field
  GROUP BY tf.doc_id, tf.field
),
most AS (SELECT doc_id, sum(fs) AS sc FROM per_field GROUP BY doc_id),
best AS (
  SELECT doc_id, max(fs) + 0.3 * (sum(fs) - max(fs)) AS sc
  FROM per_field GROUP BY doc_id
),
-- cross_fields: blended statistics (df = max over fields per term,
-- N = max per-field docCount), per-TERM dis_max over fields
dfb AS (SELECT term, max(df) AS df FROM dft JOIN q USING (term) GROUP BY 1),
nb AS (SELECT max(n) AS n FROM stats),
xcontrib AS (
  SELECT tf.doc_id, tf.term,
    b.boost * ln(1 + (nb.n - dfb.df + 0.5) / (dfb.df + 0.5)) * tf.tf
      / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) AS c
  FROM tf JOIN dfb ON dfb.term = tf.term
       JOIN dl ON dl.doc_id = tf.doc_id AND dl.field = tf.field
       JOIN stats s ON s.field = tf.field
       JOIN boosts b ON b.field = tf.field, nb
),
xterm AS (
  SELECT doc_id, term, max(c) + 0.1 * (sum(c) - max(c)) AS tc
  FROM xcontrib GROUP BY 1, 2
),
crossf AS (SELECT doc_id, sum(tc) AS sc FROM xterm GROUP BY doc_id),
-- combined_fields (BM25F): weighted tf/dl folded BEFORE saturation,
-- union docCount, blended df
nu AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM dl),
av AS (
  SELECT sum(b.boost * dl.dl) / nu.n AS avgdl
  FROM dl JOIN boosts b USING (field), nu GROUP BY nu.n
),
wtf AS (
  SELECT tf.doc_id, tf.term, sum(b.boost * tf.tf) AS wtf
  FROM tf JOIN q USING (term) JOIN boosts b ON b.field = tf.field
  GROUP BY 1, 2
),
wdl AS (
  SELECT dl.doc_id, sum(b.boost * dl.dl) AS wdl
  FROM dl JOIN boosts b USING (field) GROUP BY 1
),
comb AS (
  SELECT w.doc_id,
    sum(ln(1 + (nu.n - dfb.df + 0.5) / (dfb.df + 0.5)) * w.wtf
        / (w.wtf + {K1} * (1 - {B} + {B} * d.wdl / av.avgdl))) AS sc
  FROM wtf w JOIN dfb USING (term) JOIN wdl d USING (doc_id), nu, av
  GROUP BY w.doc_id
)
SELECT 'most' AS chk, doc_id, {round_det_sql('sc', 4)} AS score FROM (
  SELECT * FROM most ORDER BY sc DESC, doc_id LIMIT 20)
UNION ALL
SELECT 'best', doc_id, {round_det_sql('sc', 4)} FROM (
  SELECT * FROM best ORDER BY sc DESC, doc_id LIMIT 20)
UNION ALL
SELECT 'cross', doc_id, {round_det_sql('sc', 4)} FROM (
  SELECT * FROM crossf ORDER BY sc DESC, doc_id LIMIT 20)
UNION ALL
SELECT 'combined', doc_id, {round_det_sql('sc', 4)} FROM (
  SELECT * FROM comb ORDER BY sc DESC, doc_id LIMIT 20)
"""


@register("ft_multi_match", _MM_SQL)
def ft_multi_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multi_match with per-field boosts over the reference's
    multi-fields mapping (deploy_es/data.ini:314), ALL FOUR scoring
    models in one gated entry: `most_fields` (sum_field boost_f *
    BM25_f), `best_fields` (the OpenSearch default: per-doc dis_max,
    max_f + tie_breaker * sum(others), tb 0.3), `cross_fields`
    (blended term statistics + per-term dis_max, tb 0.1 -- Lucene
    BlendedTermQuery), and `combined_fields` (BM25F: weighted tf/dl
    folded before saturation over a union pseudo-field -- Lucene
    CombinedFieldQuery). Fields here: body = full text (boost 1),
    title = first 8 tokens (boost 2) -- independently-built scoring
    spaces with their own df/avgdl, through the field-columned
    postings layout (index/multifield.py)."""
    from .analysis import tokens_col
    from .index.multifield import (
        build_multi_index, combined_fields_topk, multi_match_topk,
    )

    docs = _t(spark, sf_dir, "documents")
    title = F.array_join(F.slice(tokens_col("text"), 1, 8), " ")
    mix = build_multi_index(
        spark, docs, {"body": "text", "title": title},
        id_col="doc_id", salt_threshold=200,
    )

    def _cut(df, tag):
        return df.select(
            F.lit(tag).alias("chk"), "doc_id",
            round_det("score", 4).alias("score"),
        )

    most = _cut(multi_match_topk(mix, _MM_QUERY, _MM_BOOSTS, k=20), "most")
    best = _cut(
        multi_match_topk(mix, _MM_QUERY, _MM_BOOSTS, k=20,
                         mode="best_fields", tie_breaker=0.3),
        "best",
    )
    cross = _cut(
        multi_match_topk(mix, _MM_QUERY, _MM_BOOSTS, k=20,
                         mode="cross_fields", tie_breaker=0.1),
        "cross",
    )
    comb = _cut(
        combined_fields_topk(mix, _MM_QUERY, _MM_BOOSTS, k=20), "combined"
    )
    return most.unionByName(best).unionByName(cross).unionByName(comb)


_QS_QUERY = ("+table value^2 -slow st* (join AND stream) "
             "+lang:(en OR de) AND NOT source:*1 "
             "+n_chars:>=150 +n_chars:<=450 +n_chars:[150 TO 450] "
             "+_exists_:lang")

_QS_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, tf.term,
    ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf
      / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) AS c
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN ('table', 'value', 'join', 'stream')
),
agg AS (
  SELECT doc_id,
    max(CASE WHEN term = 'table' THEN c END) AS c_table,
    max(CASE WHEN term = 'value' THEN c END) AS c_value,
    max(CASE WHEN term = 'join' THEN c END) AS c_join,
    max(CASE WHEN term = 'stream' THEN c END) AS c_stream
  FROM contrib GROUP BY doc_id
),
pre AS (SELECT DISTINCT doc_id FROM tok WHERE term LIKE 'st%'),
scored AS (
  SELECT a.doc_id,
    a.c_table + 2.0 * coalesce(a.c_value, 0)
      + CASE WHEN p.doc_id IS NOT NULL THEN 1.0 ELSE 0 END
      + CASE WHEN a.c_join IS NOT NULL AND a.c_stream IS NOT NULL
             THEN a.c_join + a.c_stream ELSE 0 END AS s
  FROM agg a LEFT JOIN pre p USING (doc_id)
  WHERE a.c_table IS NOT NULL
),
qs_top AS (
  SELECT s.doc_id, {round_det_sql('s.s', 4)} AS score
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
  WHERE d.lang IN ('en', 'de') AND d.lang IS NOT NULL
    AND NOT (d.source LIKE '%1')
    AND d.n_chars::DOUBLE >= 150 AND d.n_chars::DOUBLE <= 450
    AND s.doc_id NOT IN (
      SELECT DISTINCT doc_id FROM tok WHERE term = 'slow')
  ORDER BY s.s DESC, s.doc_id LIMIT 20
),
-- the _search body twin: bool with must: match(table stream, AND);
-- should: join, value; filter: range(n_chars); must_not: lang:fr
body_scored AS (
  SELECT a.doc_id,
    a.c_table + a.c_stream
      + coalesce(a.c_join, 0) + coalesce(a.c_value, 0) AS s
  FROM agg a JOIN documents d ON d.doc_id = a.doc_id
  WHERE a.c_table IS NOT NULL AND a.c_stream IS NOT NULL
    AND d.n_chars::DOUBLE >= 150 AND d.n_chars::DOUBLE <= 450
    AND (d.lang IS NULL OR d.lang <> 'fr')
),
body_top AS (
  SELECT doc_id, {round_det_sql('s', 4)} AS score FROM body_scored
  ORDER BY s DESC, doc_id LIMIT 20
),
agg_buckets AS (
  SELECT d.lang AS k, count(*)::BIGINT AS doc_id,
         {round_det_sql('avg(d.n_chars::DOUBLE)', 4)} AS score
  FROM body_scored m JOIN documents d USING (doc_id)
  WHERE d.lang IS NOT NULL
  GROUP BY d.lang ORDER BY count(*) DESC, d.lang LIMIT 3
),
-- the second _msearch panel: match(table value) -- plain BM25 sum
ms_top AS (
  SELECT doc_id, {round_det_sql('coalesce(c_table, 0) + coalesce(c_value, 0)', 4)}
         AS score
  FROM agg
  WHERE c_table IS NOT NULL OR c_value IS NOT NULL
  ORDER BY coalesce(c_table, 0) + coalesce(c_value, 0) DESC, doc_id
  LIMIT 10
),
-- runtime_mappings twin: kchars = floor(n_chars/100) filter,
-- grp = 'g' || (source number % 3) bucketing
rt_matched AS (
  SELECT a.doc_id, a.c_table AS s
  FROM agg a JOIN documents d USING (doc_id)
  WHERE a.c_table IS NOT NULL
    AND floor(d.n_chars::DOUBLE / 100) = 2
),
rt_top AS (
  SELECT doc_id, {round_det_sql('s', 4)} AS score FROM rt_matched
  ORDER BY s DESC, doc_id LIMIT 15
),
rt_agg AS (
  SELECT 'g' || ((regexp_extract(d.source, '([0-9]+)', 1)::INT) % 3)
           ::VARCHAR AS k,
         count(*)::BIGINT AS doc_id, 0.0 AS score
  FROM rt_matched m JOIN documents d USING (doc_id)
  GROUP BY 1 ORDER BY count(*) DESC, 1 LIMIT 5
),
-- the SQL-plugin twins: SELECT ... WHERE match(text, 'table value')
-- is the ms_top ranking; the GROUP BY statement buckets the same
-- matched set by lang
sql_agg AS (
  SELECT coalesce(d.lang, '') AS k, count(*)::BIGINT AS n
  FROM agg a JOIN documents d USING (doc_id)
  WHERE a.c_table IS NOT NULL OR a.c_value IS NOT NULL
  GROUP BY 1
),
-- script_score twin: _score * 1.5 + ln(n_chars + 1) over match(table
-- value); the restricted-Painless compiler emits exactly this tree
sscore_top AS (
  SELECT a.doc_id,
    {round_det_sql('''(coalesce(a.c_table, 0) + coalesce(a.c_value, 0)) * 1.5
          + ln(d.n_chars::DOUBLE + 1)''', 4)} AS score
  FROM agg a JOIN documents d USING (doc_id)
  WHERE a.c_table IS NOT NULL OR a.c_value IS NOT NULL
  ORDER BY (coalesce(a.c_table, 0) + coalesce(a.c_value, 0)) * 1.5
           + ln(d.n_chars::DOUBLE + 1) DESC, a.doc_id LIMIT 15
),
-- distance_feature twin: recency-style proximity boost
-- 2 * pivot / (pivot + |n_chars - 300|) added to the must score
dfeat_top AS (
  SELECT a.doc_id,
    {round_det_sql('''a.c_table
          + 2.0 * 50.0 / (50.0 + abs(d.n_chars::DOUBLE - 300.0))''',
          4)} AS score
  FROM agg a JOIN documents d USING (doc_id)
  WHERE a.c_table IS NOT NULL
  ORDER BY a.c_table
           + 2.0 * 50.0 / (50.0 + abs(d.n_chars::DOUBLE - 300.0))
           DESC, a.doc_id LIMIT 15
),
-- pinned twin: ids (3, 1, 4) score PIN_BASE - rank, organic keeps
-- its BM25 sum; max() semantics = the CASE
pin_top AS (
  SELECT d.doc_id,
    {round_det_sql('''CASE d.doc_id WHEN 3 THEN 1000000000000.0
                        WHEN 1 THEN 999999999999.0
                        WHEN 4 THEN 999999999998.0
          ELSE coalesce(a.c_table, 0) + coalesce(a.c_value, 0)
          END''', 4)} AS score
  FROM documents d LEFT JOIN agg a USING (doc_id)
  WHERE d.doc_id IN (3, 1, 4)
     OR a.c_table IS NOT NULL OR a.c_value IS NOT NULL
  ORDER BY CASE d.doc_id WHEN 3 THEN 1000000000000.0
                         WHEN 1 THEN 999999999999.0
                         WHEN 4 THEN 999999999998.0
           ELSE coalesce(a.c_table, 0) + coalesce(a.c_value, 0) END
           DESC, d.doc_id LIMIT 10
),
-- terms_set twin: tags = [lang, source] must share >= (n_chars%2+1)
-- elements with the query terms (per-doc minimum_should_match_field)
tset AS (
  SELECT d.doc_id, 1.0 AS score
  FROM documents d
  WHERE len(list_intersect([d.lang, d.source],
                           ['en', 'de', 'src3', 'src7']))
        >= (d.n_chars % 2 + 1)
),
-- has_child twin: join layout doc_id<50 = parents, child's parent =
-- doc_id % 50; parents with >=2 children matching 'table',
-- score_mode=sum
haschild_top AS (
  SELECT (a.doc_id % 50) AS doc_id, {round_det_sql('sum(a.c_table)', 4)} AS score
  FROM agg a
  WHERE a.c_table IS NOT NULL AND a.doc_id >= 50
  GROUP BY 1 HAVING count(*) >= 2
  ORDER BY sum(a.c_table) DESC, 1 LIMIT 15
),
-- sltr twin (LTR plugin): linear model over the logged featureset
-- f1 = BM25(table value), f2 = BM25(join stream), f3 = ln(1+doclen);
-- the match_all-anchored f3 makes the logging set every doc
ltr_scored AS (
  SELECT dl.doc_id,
    0.8 * (coalesce(a.c_table, 0) + coalesce(a.c_value, 0))
    + 0.5 * (coalesce(a.c_join, 0) + coalesce(a.c_stream, 0))
    + 0.02 * ln(1 + dl.dl) - 0.1 AS s
  FROM dl LEFT JOIN agg a USING (doc_id)
),
ltr_top AS (
  SELECT doc_id, {round_det_sql('s', 4)} AS score FROM ltr_scored
  ORDER BY s DESC, doc_id LIMIT 15
),
-- nested twin: per-doc 2-element array<struct(typ,conf)> built from
-- (lang, n_chars%10) and (lang-or-source by n_chars%3, n_chars%7);
-- a doc matches when ONE element has typ='en' AND conf>=5
-- (block-join semantics), score_mode=sum = matching-element count
nested_elems AS (
  SELECT d.doc_id, unnest([
    struct_pack(typ := d.lang, conf := (d.n_chars % 10)::DOUBLE),
    struct_pack(typ := CASE WHEN d.n_chars % 3 = 0 THEN d.lang
                            ELSE d.source END,
                conf := (d.n_chars % 7)::DOUBLE)]) AS e
  FROM documents d
),
nested_hits AS (
  SELECT doc_id,
    count(*) FILTER (WHERE e.typ = 'en' AND e.conf >= 5)::DOUBLE
      AS score
  FROM nested_elems GROUP BY doc_id
  HAVING count(*) FILTER (WHERE e.typ = 'en' AND e.conf >= 5) > 0
),
-- nested agg + reverse_nested twin: element-context terms buckets
-- (doc_count = elements) with unique-parent counts, top 5
nestagg AS (
  SELECT e.typ AS k, count(*)::BIGINT AS n,
         count(DISTINCT doc_id)::DOUBLE AS par
  FROM nested_elems WHERE e.typ IS NOT NULL
  GROUP BY 1 ORDER BY n DESC, k LIMIT 5
)
SELECT 'qs' AS chk, '' AS k, doc_id, score FROM qs_top
UNION ALL
-- KQL twin (index/kql.py, Kibana's filter-context translation —
-- constant 1.0 scores): text:table and lang:(en or de) and
-- n_chars >= 150 and not source:*1
SELECT 'kql', '', doc_id, 1.0 FROM (
  SELECT a.doc_id FROM agg a JOIN documents d USING (doc_id)
  WHERE a.c_table IS NOT NULL
    AND d.lang IN ('en', 'de') AND d.n_chars >= 150
    AND d.source NOT LIKE '%1'
  ORDER BY a.doc_id LIMIT 20)
UNION ALL SELECT 'sayt', '', doc_id, score FROM qs_top
UNION ALL SELECT 'body', '', doc_id, score FROM body_top
UNION ALL SELECT 'agg', k, doc_id, score FROM agg_buckets
UNION ALL SELECT 'msearch', '', doc_id, score FROM ms_top
UNION ALL SELECT 'runtime', '', doc_id, score FROM rt_top
UNION ALL SELECT 'rtagg', k, doc_id, score FROM rt_agg
UNION ALL SELECT 'sql', '', doc_id, score FROM ms_top
UNION ALL SELECT 'sqlagg', k, n, 0.0 FROM sql_agg
UNION ALL SELECT 'sscore', '', doc_id, score FROM sscore_top
UNION ALL SELECT 'dfeat', '', doc_id, score FROM dfeat_top
UNION ALL SELECT 'pinned', '', doc_id, score FROM pin_top
UNION ALL SELECT 'tset', '', doc_id, score FROM tset
UNION ALL SELECT 'haschild', '', doc_id, score FROM haschild_top
UNION ALL SELECT 'ltr', '', doc_id, score FROM ltr_top
UNION ALL SELECT 'nested', '', doc_id, score FROM nested_hits
UNION ALL SELECT 'nestagg', k, n, par FROM nestagg
"""

_RT_BODY = {
    "runtime_mappings": {
        "grp": {"type": "keyword", "script": {"source":
            "concat('g', cast(cast(regexp_extract(source, '([0-9]+)', 1)"
            " as int) % 3 as string))"}},
        "kchars": {"type": "long",
                   "script": {"source": "floor(n_chars / 100)"}},
    },
    "query": {"bool": {
        "must": [{"match": {"text": "table"}}],
        "filter": [{"term": {"kchars": {"value": "2"}}}],
    }},
    "size": 15,
    "aggs": {"by_grp": {"terms": {"field": "grp", "size": 5}}},
}

_SB_BODY = {
    "query": {"bool": {
        "must": [{"match": {
            "text": {"query": "table stream", "operator": "and"}}}],
        "should": [{"term": {"text": "join"}},
                   {"term": {"text": "value"}}],
        "filter": [{"range": {"n_chars": {"gte": 150, "lte": 450}}}],
        "must_not": [{"term": {"lang": "fr"}}],
    }},
    "size": 20,
    "aggs": {"by_lang": {"terms": {"field": "lang", "size": 3},
             "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}}},
}


@register("ft_query_string", _QS_SQL)
def ft_query_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The query_string DSL end-to-end over the dashboards' REAL
    syntax shapes (reference saved_objects/each-dashboard/
    cloudtrail.ndjson query fields): required + boosted + excluded
    terms, constant-score prefix, a parenthesized scoring group
    (join AND stream) that contributes only when BOTH match, a
    grouped field value list lang:(en OR de), a leading-wildcard
    field exclusion NOT source:*1, a numeric range filter in BOTH
    syntaxes (n_chars:[150 TO 450] and the one-sided shorthands
    n_chars:>=150 n_chars:<=450 -- same bounds, so the oracle is
    unchanged), and a reserved-field existence check _exists_:lang
    (== lang:*). The
    whole string parses on the driver into a boolean tree and
    compiles into ONE DataFrame DAG with a single groupBy -- no
    broadcast of exclusion sets (index/querystring.py).

    chk='body'/'agg' drive the OpenSearch ``_search`` REQUEST-BODY
    compiler (index/searchbody.py) over the same index: a bool query
    with must (operator=and match) + should + filter-context range +
    must_not clauses (chk='body': top-20 hits), and a terms(lang)
    aggregation with a nested avg(n_chars) metric over the full
    matched set (chk='agg': k=lang, doc_id=doc_count,
    score=avg) -- the dashboards' actual wire shape end-to-end.

    Both body chks now execute through ``_msearch``
    (index/msearch.py): the batch compiles BOTH panels' trees into
    one forest, one postings scan + one shuffle, and chk='msearch'
    gates the second panel (match: "table value", plain BM25 top-10)
    -- the multi-panel-dashboard execution shape, value-hash-checked
    against the per-panel SQL oracle.

    chk='runtime'/'rtagg' exercise ``runtime_mappings``: two
    search-time computed fields (a keyword bucketing expression over
    ``source`` and a numeric ``floor(n_chars/100)``) used as a
    filter-context term predicate AND as a terms-agg key -- derived
    docs columns, zero stored-data changes
    (searchbody.with_runtime_mappings)."""
    from .index.build import PostingsIndex
    from .index.msearch import msearch
    from .index.querystring import query_string_topk
    from .index.searchbody import search_body

    ix = _built_index(spark, sf_dir)
    wide_docs = ix.docs.join(
        _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars"),
        "doc_id",
    )
    ix2 = PostingsIndex(
        docs=wide_docs, postings=ix.postings, term_stats=ix.term_stats,
        n_docs=ix.n_docs, avgdl=ix.avgdl,
    )
    qs = query_string_topk(ix2, _QS_QUERY, k=20).select(
        F.lit("qs").alias("chk"), F.lit("").alias("k"),
        "doc_id", round_det("score", 4).alias("score"),
    )
    # chk='kql': the dashboards' DEFAULT search-bar language
    # (index/kql.py) — grouped value list, comparison range, negated
    # wildcard — compiled to Kibana's exact filter-context translation
    # and executed by the same body executor (constant 1.0 scores,
    # doc_id order).
    from .index.kql import parse_kql
    from .index.searchbody import search_hits

    kql_hits = search_hits(ix2, {
        "query": parse_kql("text:table and lang:(en or de) and "
                           "n_chars >= 150 and not source:*1"),
        "size": 20,
    }).select(
        F.lit("kql").alias("chk"), F.lit("").alias("k"),
        "doc_id", round_det("score", 4).alias("score"),
    )
    # chk='sayt': the SAME query through an index_prefixes handle
    # (index/sayt.py) — the st* prefix expands by EqualTo on the
    # edge-ngram dictionary instead of a vocab LIKE; results (and
    # therefore the oracle ranking) are pinned identical to chk='qs'.
    from .index.sayt import build_prefix_vocab

    ix_sayt = PostingsIndex(
        docs=wide_docs, postings=ix.postings, term_stats=ix.term_stats,
        n_docs=ix.n_docs, avgdl=ix.avgdl,
        prefix_vocab=build_prefix_vocab(ix2, max_gram=3),
        prefix_max_gram=3,
    )
    sayt = query_string_topk(ix_sayt, _QS_QUERY, k=20).select(
        F.lit("sayt").alias("chk"), F.lit("").alias("k"),
        "doc_id", round_det("score", 4).alias("score"),
    )
    panel2 = {"query": {"match": {"text": "table value"}}, "size": 10}
    # persist=False: the driver collects these lazily after the entry
    # returns, so the entry must not leave a cached frame behind.
    res, res2 = msearch(ix2, [_SB_BODY, panel2], persist=False)
    body = res["hits"].select(
        F.lit("body").alias("chk"), F.lit("").alias("k"),
        "doc_id", round_det("score", 4).alias("score"),
    )
    agg = res["aggs"]["by_lang"].select(
        F.lit("agg").alias("chk"), F.col("by_lang").alias("k"),
        F.col("doc_count").cast("long").alias("doc_id"),
        round_det("avg_chars", 4).alias("score"),
    )
    ms = res2["hits"].select(
        F.lit("msearch").alias("chk"), F.lit("").alias("k"),
        "doc_id", round_det("score", 4).alias("score"),
    )
    rt_res = search_body(ix2, _RT_BODY)
    rt = rt_res["hits"].select(
        F.lit("runtime").alias("chk"), F.lit("").alias("k"),
        "doc_id", round_det("score", 4).alias("score"),
    )
    rtagg = rt_res["aggs"]["by_grp"].select(
        F.lit("rtagg").alias("chk"), F.col("by_grp").alias("k"),
        F.col("doc_count").cast("long").alias("doc_id"),
        F.lit(0.0).alias("score"),
    )
    # chk='sql'/'sqlagg': the OpenSearch SQL plugin (sqlplugin.py) —
    # the Query Workbench surface.  match() compiles through the SAME
    # tree_scores executor; the relational remainder (grouping,
    # ordering, limit) is plain Catalyst.
    from .sqlplugin import sql_query

    sqlhits = sql_query(
        spark,
        "SELECT doc_id, _score FROM pages "
        "WHERE match(text, 'table value') "
        "ORDER BY _score DESC, doc_id LIMIT 10",
        {"pages": ix2.docs}, ix=ix2,
    ).select(
        F.lit("sql").alias("chk"), F.lit("").alias("k"),
        "doc_id", round_det("_score", 4).alias("score"),
    )
    sqlagg = sql_query(
        spark,
        "SELECT coalesce(lang, '') AS k, count(*) AS n FROM pages "
        "WHERE match(text, 'table value') "
        "GROUP BY coalesce(lang, '')",
        {"pages": ix2.docs}, ix=ix2,
    ).select(
        F.lit("sqlagg").alias("chk"), "k",
        F.col("n").cast("long").alias("doc_id"),
        F.lit(0.0).alias("score"),
    )
    # chk='sscore'/'dfeat'/'pinned'/'tset'/'haschild': the seventh
    # query-type batch (script_score via the restricted-Painless
    # compiler, distance_feature proximity boost, pinned promoted
    # ids, terms_set per-doc minimum over an array column, and the
    # has_child join-field rollup over a doc_id%50 parent layout).
    from .index.searchbody import search_hits

    ix3 = PostingsIndex(
        docs=(wide_docs
              .withColumn("tags", F.array("lang", "source"))
              .withColumn("req",
                          ((F.col("n_chars") % 2) + 1).cast("int"))
              .withColumn("join_name",
                          F.when(F.col("doc_id") < 50, F.lit("question"))
                          .otherwise(F.lit("answer")))
              .withColumn("join_parent",
                          F.when(F.col("doc_id") >= 50,
                                 F.col("doc_id") % 50))
              # nested-field layout for chk='nested'/'nestagg': a
              # 2-element array<struct(typ,conf)> per doc
              .withColumn("ents", F.array(
                  F.struct(
                      F.col("lang").alias("typ"),
                      (F.col("n_chars") % 10).cast("double")
                      .alias("conf")),
                  F.struct(
                      F.when(F.col("n_chars") % 3 == 0, F.col("lang"))
                      .otherwise(F.col("source")).alias("typ"),
                      (F.col("n_chars") % 7).cast("double")
                      .alias("conf"))))),
        postings=ix.postings, term_stats=ix.term_stats,
        n_docs=ix.n_docs, avgdl=ix.avgdl,
    )

    def _chk(tag: str, hits: DataFrame) -> DataFrame:
        return hits.select(
            F.lit(tag).alias("chk"), F.lit("").alias("k"),
            "doc_id", round_det("score", 4).alias("score"),
        )

    sscore = _chk("sscore", search_hits(ix3, {
        "query": {"script_score": {
            "query": {"match": {"text": "table value"}},
            "script": {"source":
                       "_score * 1.5 + Math.log(doc['n_chars'].value"
                       " + 1)"},
        }}, "size": 15}))
    dfeat = _chk("dfeat", search_hits(ix3, {
        "query": {"bool": {
            "must": [{"match": {"text": "table"}}],
            "should": [{"distance_feature": {
                "field": "n_chars", "origin": 300, "pivot": 50,
                "boost": 2}}],
        }}, "size": 15}))
    pinned = _chk("pinned", search_hits(ix3, {
        "query": {"pinned": {
            "ids": ["3", "1", "4"],
            "organic": {"match": {"text": "table value"}},
        }}, "size": 10}))
    tset = _chk("tset", search_hits(ix3, {
        "query": {"terms_set": {"tags": {
            "terms": ["en", "de", "src3", "src7"],
            "minimum_should_match_field": "req",
        }}}, "size": 1000}))
    haschild = _chk("haschild", search_hits(ix3, {
        "query": {"has_child": {
            "type": "answer", "query": {"match": {"text": "table"}},
            "score_mode": "sum", "min_children": 2,
        }}, "size": 15}))

    # chk='ltr': the LTR plugin surface (index/ltr.py) — a linear
    # model scored over a logged featureset (two match features
    # through the shared forest + a function_score doclen signal);
    # the sltr primary-ranking path, value-hash-checked against the
    # same linear combination recomputed in SQL.
    from .index.ltr import LinearModel, sltr_topk

    ltr = _chk("ltr", sltr_topk(
        ix2,
        [{"name": "f1", "template": {"match": {"text": "{{kw}}"}}},
         {"name": "f2", "template": {"match": {"text": "{{kw2}}"}}},
         {"name": "f3", "template": {"function_score": {
             "query": {"match_all": {}},
             "functions": [{"field_value_factor": {
                 "field": "doclen", "modifier": "ln1p"}}],
             "boost_mode": "replace"}}}],
        {"kw": "table value", "kw2": "join stream"},
        LinearModel({"f1": 0.8, "f2": 0.5, "f3": 0.02},
                    intercept=-0.1),
        k=15))

    # chk='nested': block-join element semantics over the ents
    # array<struct> (score_mode=sum = matching-element count);
    # chk='nestagg': nested agg context switch + reverse_nested
    # parent counts -- both vs plain unnest/list_filter SQL twins
    from .index.searchbody import search_body as _sb

    nested = _chk("nested", search_hits(ix3, {
        "query": {"nested": {
            "path": "ents",
            "query": {"bool": {"must": [
                {"term": {"ents.typ": "en"}},
                {"range": {"ents.conf": {"gte": 5}}}]}},
            "score_mode": "sum"}},
        "size": 100000}))
    nest_res = _sb(ix3, {"query": {"match_all": {}}, "size": 0,
                         "aggs": {"enr": {
                             "nested": {"path": "ents"},
                             "aggs": {"typs": {
                                 "terms": {"field": "ents.typ",
                                           "size": 5},
                                 "aggs": {"par": {
                                     "reverse_nested": {}}}}}}}})
    nestagg = nest_res["aggs"]["enr>typs"].select(
        F.lit("nestagg").alias("chk"), F.col("typs").alias("k"),
        F.col("doc_count").cast("long").alias("doc_id"),
        F.col("par_doc_count").cast("double").alias("score"))

    return (qs.unionByName(kql_hits).unionByName(sayt)
            .unionByName(body).unionByName(agg).unionByName(ms)
            .unionByName(rt).unionByName(rtagg)
            .unionByName(sqlhits).unionByName(sqlagg)
            .unionByName(sscore).unionByName(dfeat)
            .unionByName(pinned).unionByName(tset)
            .unionByName(haschild).unionByName(ltr)
            .unionByName(nested).unionByName(nestagg))


_FACET_QUERY = "spark table join stream"
_FACET_TERMS = _FACET_QUERY.split()


_FACET_SQL = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOK}) AS term FROM documents
    ),
    matched AS (
      SELECT DISTINCT doc_id FROM tok
      WHERE term IN ({", ".join(f"'{t}'" for t in _FACET_TERMS)})
    )
    SELECT d.lang AS lang, count(*) AS n
    FROM matched m JOIN documents d ON d.doc_id = m.doc_id
    GROUP BY d.lang ORDER BY n DESC, lang LIMIT 10
"""


@register(
    "ft_facets",
    f"""
    SELECT 'facet' AS chk, lang, 0 AS rank, 0::BIGINT AS doc_id,
           n::DOUBLE AS score
    FROM ({_FACET_SQL})
    UNION ALL
    SELECT 'top_hits', lang, rank, doc_id, score FROM ({_TOPHITS_SQL})
    """,
)
def ft_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OpenSearch hits+aggregations shape in one gated entry: a
    `terms` facet over the FULL match set (dashboard pattern,
    SURVEY.md A1) UNION the `top_hits` best-3-per-bucket table."""
    from .index.boolquery import search_facets

    facet = search_facets(
        _built_index(spark, sf_dir), _FACET_QUERY, ["lang"], k=10
    )["facet:lang"].select(
        F.lit("facet").alias("chk"), "lang",
        F.lit(0).alias("rank"), F.lit(0).cast("long").alias("doc_id"),
        F.col("n").cast("double").alias("score"),
    )
    top = _top_hits_df(spark, sf_dir).select(
        F.lit("top_hits").alias("chk"), "lang", "rank", "doc_id", "score",
    )
    return facet.unionByName(top)
