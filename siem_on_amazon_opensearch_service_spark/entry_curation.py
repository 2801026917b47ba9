"""Registry entries for the training-data curation operators
(dedup, similarity search, text analysis, multimodal) — each a
(PySpark callable, DuckDB oracle SQL) pair on the shared testdata
tables. Imported by entry_queries at module bottom."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analysis import duckdb_tokens_sql
from .entry_queries import _t, register
from .detfloat import round_det_sql
from .operators import dedup, multimodal, packing, scrub, similarity, textstats

# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_stats",
    f"""
    WITH spans_cte AS ({dedup.duckdb_spans_sql(window=20)}),
    k AS (
      SELECT md5(array_to_string({duckdb_tokens_sql('text')}, ' ')) AS k
      FROM documents
    ), g AS (SELECT k, count(*) AS n FROM k GROUP BY k)
    SELECT * FROM (
      SELECT sum(n)::BIGINT AS n_docs, count(*)::BIGINT AS n_distinct,
             sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_groups,
             sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END)::BIGINT
               AS n_removable
      FROM g
    ), ({dedup.duckdb_substring_stats_sql(window=20)}),
       ({dedup.duckdb_strip_stats_sql(window=20)})
    """,
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash-groupBy on normalized text): corpus stats —
    plus the exact-substring pass (duplicated 20-token spans via
    window hashing, the shuffle-friendly restatement of the Lee et
    al. suffix-array dedup) folded in as a 1x1 stats cross join. The
    third fold pins the REMOVAL output: merged maximal spans
    (operators/dedup.py:duplicate_spans, native interval-merge
    aggregate) and the stripped corpus (strip_duplicate_spans) —
    span count, tokens removed, docs touched, and the total cleaned
    text length, all hash-matched against the gaps-and-islands SQL
    twin."""
    docs = _t(spark, sf_dir, "documents")
    spans = dedup.duplicate_spans(docs, window=20)
    strip = dedup.strip_duplicate_spans(docs, window=20)
    span_stats = spans.agg(
        F.count("*").cast("long").alias("n_merged_spans"),
        F.coalesce(F.sum(F.col("e") - F.col("s")), F.lit(0)).cast("long")
        .alias("n_tokens_removed"),
        F.countDistinct("id").cast("long").alias("n_docs_stripped"),
    )
    strip_stats = strip.agg(
        F.coalesce(F.sum(F.length("text_clean")), F.lit(0)).cast("long")
        .alias("n_clean_chars"))
    return (dedup.exact_dup_stats(docs)
            .crossJoin(dedup.substring_dup_stats(docs, window=20))
            .crossJoin(span_stats).crossJoin(strip_stats))


@register("dedup_minhash_lsh_pairs", dedup.duckdb_lsh_pairs_sql())
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8) + LSH(4 bands x 2) candidate near-dup pairs with
    estimated Jaccard (matching-signature fraction)."""
    return dedup.lsh_candidate_pairs(_t(spark, sf_dir, "documents"))


@register(
    "dedup_jaccard_verified",
    f"""
    WITH s AS (
      SELECT doc_id AS id, {dedup.duckdb_shingles_sql('text')} AS sh
      FROM documents WHERE doc_id < 100
    ), s2 AS (SELECT id, sh FROM s WHERE len(sh) > 0),
    pairs AS ({dedup.duckdb_lsh_pairs_sql()}),
    shall AS (
      SELECT doc_id AS id, {dedup.duckdb_shingles_sql('text')} AS s
      FROM documents
    )
    SELECT 'all_pairs_top20' AS mode, id_a, id_b, jaccard FROM (
      SELECT a.id AS id_a, b.id AS id_b,
             {round_det_sql('''len(list_intersect(a.sh, b.sh))::DOUBLE
                   / len(list_distinct(list_concat(a.sh, b.sh)))''', 4)}
               AS jaccard
      FROM s2 a JOIN s2 b ON a.id < b.id
      ORDER BY jaccard DESC, id_a, id_b LIMIT 20)
    UNION ALL
    SELECT 'lsh_verified', p.id_a, p.id_b,
      {round_det_sql('''len(list_intersect(a.s, b.s))::DOUBLE
            / len(list_distinct(list_concat(a.s, b.s)))''', 4)}
    FROM pairs p JOIN shall a ON a.id = p.id_a JOIN shall b ON b.id = p.id_b
    """,
)
def dedup_jaccard_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-shingle) Jaccard both ways, one gated entry:
    the all-pairs baseline over a bounded id range (the oracle the LSH
    path approximates) UNION the scale-path decision -- exact Jaccard
    computed ONLY for LSH candidate pairs (two joins against the
    shingle table; never all-pairs)."""
    docs = _t(spark, sf_dir, "documents")
    top20 = (
        dedup.jaccard_pairs(docs.filter(F.col("doc_id") < 100))
        .orderBy(F.desc("jaccard"), F.asc("id_a"), F.asc("id_b"))
        .limit(20)
        .select(F.lit("all_pairs_top20").alias("mode"), "id_a", "id_b",
                "jaccard")
    )
    pairs = dedup.lsh_candidate_pairs(docs).select("id_a", "id_b")
    verified = dedup.verify_candidates_jaccard(docs, pairs).select(
        F.lit("lsh_verified").alias("mode"), "id_a", "id_b", "jaccard"
    )
    return top20.unionByName(verified)


@register("dedup_simhash16", dedup.duckdb_simhash_sql())
def dedup_simhash16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document (md5-projection bits)."""
    return dedup.simhash16(_t(spark, sf_dir, "documents"))


def _semdedup_oracle() -> str:
    from .operators.semdedup import duckdb_semdedup_sql

    return duckdb_semdedup_sql(0.35, n_cents=8, max_id=200)


@register(
    "dedup_embedding_cosine_pairs",
    f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      WHERE vec_id < 100
    )
    SELECT 'pairs' AS chk, a.vec_id AS a, b.vec_id AS b,
           {round_det_sql('''list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b.e, b.e)))''', 4)} AS v1,
           0.0::DOUBLE AS v2
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e))
             * sqrt(list_dot_product(b.e, b.e))) >= 0.3
    UNION ALL
    SELECT 'semdedup', vec_id, comp, cell::DOUBLE,
           (CASE WHEN keep THEN 1.0 ELSE 0.0 END)::DOUBLE
    FROM ({{SD}})
    """.replace("{SD}", _semdedup_oracle()),
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-dup family, both shapes in one gated
    entry. chk='pairs': cosine pairs above threshold over a bounded
    id range (at scale this runs per ANN bucket). chk='semdedup':
    the full SemDeDup labeling (operators/semdedup.py, public
    algorithm arXiv:2303.09540) — 8-centroid assignment, within-cell
    pairs at t=0.35, connected components, lowest-cent_sim
    representative — against a recursive-CTE DuckDB oracle."""
    from .operators.semdedup import semdedup

    vecs = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    pairs = dedup.embedding_dup_pairs(vecs, threshold=0.3).select(
        F.lit("pairs").alias("chk"), F.col("id_a").alias("a"),
        F.col("id_b").alias("b"), F.col("cosine").alias("v1"),
        F.lit(0.0).alias("v2"),
    )
    v200 = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    cents = (
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cent_vec"))
    )
    sd = semdedup(v200, cents, threshold=0.35).select(
        F.lit("semdedup").alias("chk"), F.col("vec_id").alias("a"),
        F.col("comp").alias("b"), F.col("cell").cast("double").alias("v1"),
        F.when(F.col("keep"), 1.0).otherwise(0.0).alias("v2"),
    )
    return pairs.unionByName(sd)


@register(
    "dedup_lsh_components",
    f"""
    WITH RECURSIVE pairs AS ({dedup.duckdb_lsh_pairs_sql()}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, comp) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
    )
    SELECT id AS doc_id, min(comp) AS comp FROM reach GROUP BY id
    """,
)
def dedup_lsh_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components (min-label
    propagation) over the MinHash-LSH candidate graph — component id
    is the canonical survivor; everything else in a component is a
    near-duplicate removal candidate."""
    pairs = dedup.lsh_candidate_pairs(_t(spark, sf_dir, "documents"))
    comps = dedup.connected_components(pairs)
    return comps.select(F.col("id").alias("doc_id"), "comp")


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_COS = (
    "list_dot_product(e, q) / (sqrt(list_dot_product(e, e)) "
    "* sqrt(list_dot_product(q, q)))"
)


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]
    )
    return list(row["embedding"])


@register(
    "sim_cosine_topk",
    f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0
    ), v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    topk AS (
      SELECT vec_id, {round_det_sql(_COS, 4)} AS cosine
      FROM v, q ORDER BY {_COS} DESC, vec_id LIMIT 10
    )
    SELECT 'topk' AS chk, vec_id, cosine FROM topk
    """
    f"""
    UNION ALL
    SELECT 'radial', vec_id, {round_det_sql(_COS, 4)}
    FROM v, q WHERE {_COS} >= 0.1
    UNION ALL
    SELECT 'hnsw', vec_id, cosine FROM topk
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k to a query vector (exact baseline),
    plus chk='radial': the k-NN plugin's radial search
    (``min_score`` — every vector within the score radius, no k).
    The radial arm is a pure map-side filter over the scan — no
    TakeOrdered heap at all, the cheapest possible knn shape."""
    vecs = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    topk = similarity.cosine_topk(vecs, qv, k=10).select(
        F.lit("topk").alias("chk"), "vec_id", "cosine")
    radial = similarity.cosine_radial(vecs, qv, min_score=0.1).select(
        F.lit("radial").alias("chk"), "vec_id", "cosine")
    # chk='hnsw': the graph-ANN engine itself (operators/hnsw.py) at
    # the gate-exactness configuration — FOUR shards with per-shard
    # ef_search >= shard size, where each shard's search provably
    # degrades to exhaustive and the scatter-gather window merge of
    # per-shard top-k therefore equals global brute force — so the
    # brute top-k IS the oracle while the row exercises the SHARDED
    # build + scatter-gather query path the bench runs (round-4 used
    # n_shards=1, which only proved the degenerate single-partition
    # case). Approximate-ef behavior stays pinned by recall tests;
    # this row puts the whole build+query path under the driver's
    # value hash (graph is deterministic: md5 levels, sorted inserts).
    # Score parity note: the graph stores array<float>, which is
    # LOSSLESS here because the embeddings table is float32 storage
    # already — both paths then score the identical values upcast to
    # float64. A float64 source would quantize through the graph and
    # could diverge from the brute oracle at the 4dp boundary.
    from .operators.hnsw import hnsw_build, hnsw_query

    n_vecs = vecs.count()
    g = hnsw_build(vecs, n_shards=4, m=8, ef_construction=48)
    hnsw = hnsw_query(g, [(0, qv)], k=10, ef_search=n_vecs).select(
        F.lit("hnsw").alias("chk"), "vec_id", "cosine")
    return topk.unionByName(radial).unionByName(hnsw)


_IVF_CACHE: dict[tuple, str] = {}


def _ivf_path(spark: SparkSession, sf_dir: str, cents) -> str:
    """Materialize the IVF layout once per session (the build step);
    queries then run against the partitioned-by-cell parquet."""
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _IVF_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="ivf_")
        similarity.ivf_save(_t(spark, sf_dir, "embeddings"), cents, path)
        _IVF_CACHE[key] = path
    return path


@register(
    "sim_ivf_topk",
    f"""
    WITH cent AS (
      SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
      FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0),
    probe AS (
      SELECT cent_id FROM (
        SELECT cent_id, cv AS e FROM cent) c, qv
      ORDER BY {_COS} DESC, cent_id LIMIT 4
    ),
    asg AS (
      SELECT vec_id, cent_id, rn FROM (
        SELECT v.vec_id, c.cent_id,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_dot_product(v.e, c.cv)
                   / (sqrt(list_dot_product(v.e, v.e))
                      * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                 c.cent_id) AS rn
        FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) v
        CROSS JOIN cent c)
      WHERE rn = 1
    ),
    cand AS (
      SELECT v.vec_id, v.e
      FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) v
      JOIN asg ON asg.vec_id = v.vec_id
      JOIN probe ON probe.cent_id = asg.cent_id
    ),
    -- chk='pq': product quantization with the deterministic first-8
    -- codebook (m=4 subspaces x 16 dims), argmin-L2 codes via the
    -- c.c - 2 x.c identity (the engine's exact formula), ADC score =
    -- sum_j dot(q_sub_j, codebook[code_j]_sub_j)
    cb AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
             embedding::DOUBLE[] AS e
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    subs(j) AS (VALUES (0), (1), (2), (3)),
    pq_codes AS (
      SELECT vec_id, j, code FROM (
        SELECT v.vec_id, subs.j, cb.code,
               row_number() OVER (
                 PARTITION BY v.vec_id, subs.j
                 ORDER BY
                   list_dot_product(cb.e[subs.j*16+1 : (subs.j+1)*16],
                                    cb.e[subs.j*16+1 : (subs.j+1)*16])
                   - 2 * list_dot_product(v.e[subs.j*16+1 : (subs.j+1)*16],
                                          cb.e[subs.j*16+1 : (subs.j+1)*16]),
                   cb.code) AS rn
        FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) v
        CROSS JOIN subs CROSS JOIN cb)
      WHERE rn = 1
    ),
    pq_scored AS (
      SELECT c.vec_id,
             sum(list_dot_product(qv.q[c.j*16+1 : (c.j+1)*16],
                                  cb.e[c.j*16+1 : (c.j+1)*16])) AS s
      FROM pq_codes c JOIN cb ON cb.code = c.code, qv
      GROUP BY c.vec_id
    ),
    ivf_top AS (
      SELECT vec_id, {round_det_sql(_COS, 4)} AS cosine
      FROM cand, qv ORDER BY {_COS} DESC, vec_id LIMIT 10
    ),
    pq_top AS (
      SELECT vec_id, {round_det_sql('s', 4)} AS cosine
      FROM pq_scored ORDER BY s DESC, vec_id LIMIT 10
    )
    SELECT 'ivf' AS chk, vec_id, cosine FROM ivf_top
    UNION ALL
    SELECT 'pq', vec_id, cosine FROM pq_top
    """,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k over the MATERIALIZED layout (chk='ivf'):
    the vector corpus is written partitionBy(cell) once at build time;
    a query resolves its 4 probe cells of 16 on the driver (centroids
    are metadata) and the literal cell IN (...) prunes partitions --
    only nprobe/n_cells of the corpus is ever scanned.  chk='pq':
    product-quantized ADC top-k (operators/pq.py) -- 64-dim float
    vectors compressed to 4 code bytes, scored by a native
    element_at gather against the (m x ksub) driver-side table; the
    'cosine' column carries the approximate inner product."""
    from .operators import pq as pqm

    vecs = _t(spark, sf_dir, "embeddings")
    cents = similarity.make_centroids(vecs, 16)
    path = _ivf_path(spark, sf_dir, cents)
    qv = _query_vec(spark, sf_dir)
    ivf = similarity.ivf_topk_materialized(
        spark, path, cents, qv, k=10, nprobe=4
    ).select(F.lit("ivf").alias("chk"), "vec_id", "cosine")
    books = pqm.pq_codebooks(vecs, 4, 8)
    codes = pqm.pq_encode(vecs, books)
    pq_top = pqm.pq_topk(codes, books, qv, k=10).select(
        F.lit("pq").alias("chk"), "vec_id",
        F.col("score").alias("cosine"),
    )
    return ivf.unionByName(pq_top)


def _kmeans_oracle_sql(n_iter: int = 3, k: int = 16, nprobe: int = 4) -> str:
    """DuckDB twin of kmeans_fit(n_iter, tol=0) + ivf_topk: Lloyd
    iterations UNROLLED as CTE pairs (assignment argmax -> per-dim
    mean). Spark stores each round's centroids as float32; the
    ::FLOAT::DOUBLE cast chain reproduces that quantization, which
    also absorbs sum-order noise in avg()."""
    cte = [
        "v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv "
        f"FROM embeddings ORDER BY vec_id LIMIT {k})",
    ]
    cos = (
        "list_dot_product(v.e, c.cv) / (sqrt(list_dot_product(v.e, v.e))"
        " * sqrt(list_dot_product(c.cv, c.cv)))"
    )
    for i in range(n_iter):
        cte.append(f"""a{i} AS (
  SELECT vec_id, cent_id FROM (
    SELECT v.vec_id, c.cent_id,
      row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY {cos} DESC, c.cent_id) AS rn
    FROM v CROSS JOIN c{i} c) WHERE rn = 1)""")
        cte.append(f"""d{i} AS (
  SELECT a.cent_id AS cell, i.i AS pos, avg(v.e[i.i])::FLOAT::DOUBLE AS m
  FROM a{i} a JOIN v USING (vec_id),
       LATERAL (SELECT unnest(generate_series(1, len(v.e))) AS i) i
  GROUP BY 1, 2)""")
        cte.append(f"""c{i + 1} AS (
  SELECT p.cent_id, coalesce(n.vec, p.cv) AS cv FROM c{i} p
  LEFT JOIN (SELECT cell, list(m ORDER BY pos) AS vec
             FROM d{i} GROUP BY cell) n ON n.cell = p.cent_id)""")
    final = f"c{n_iter}"
    return f"""
    WITH {", ".join(cte)},
    qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0),
    probe AS (
      SELECT cent_id FROM (SELECT cent_id, cv AS e FROM {final}) c, qv
      ORDER BY {_COS} DESC, cent_id LIMIT {nprobe}
    ),
    fasg AS (
      SELECT vec_id, cent_id FROM (
        SELECT v.vec_id, c.cent_id,
          row_number() OVER (PARTITION BY v.vec_id
                             ORDER BY {cos} DESC, c.cent_id) AS rn
        FROM v CROSS JOIN {final} c) WHERE rn = 1
    ),
    cand AS (
      SELECT v.vec_id, v.e FROM v
      JOIN fasg ON fasg.vec_id = v.vec_id
      JOIN probe ON probe.cent_id = fasg.cent_id
    )
    SELECT vec_id, {round_det_sql(_COS, 4)} AS cosine
    FROM cand, qv ORDER BY {_COS} DESC, vec_id LIMIT 10
    """


@register("sim_kmeans_ivf_topk", _kmeans_oracle_sql())
def sim_kmeans_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with Lloyd-trained centroids (deterministic lowest-id init,
    FIXED 3-iteration budget so the training loop is a pure function
    of the data) -- the real ANN training step, now fully value-
    checked: the oracle unrolls the same 3 Lloyd iterations in SQL,
    reproducing Spark's per-round float32 centroid quantization, and
    must land the identical probe set and top-k."""
    vecs = _t(spark, sf_dir, "embeddings")
    cents = similarity.kmeans_fit(vecs, 16, n_iter=3, tol=0.0)
    return similarity.ivf_topk(vecs, cents, _query_vec(spark, sf_dir),
                               k=10, nprobe=4)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_LANG_PRED, _LANG_SCORE = textstats.duckdb_lang_sql()

# deterministic scrub-input synthesis (identical in Spark + DuckDB):
# append PII to the text, build a messy URL, and a multi-line body
# with two corpus-wide boilerplate lines (df 50% / ~33%, both above
# the 30% threshold) plus a per-doc unique line.
_SYN_PII = (
    "text || ' contact user' || doc_id || '@Example.COM at 10.' || "
    "(doc_id % 200) || '.' || ((doc_id * 7) % 250) || "
    "'.8 or 555-210-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')"
)
_SYN_URL = (
    "'HTTPS://WWW.Site' || (doc_id % 7) || '.Example.com:443/p/' || "
    "doc_id || '/?utm_source=t&q=' || (doc_id % 13) || '&b=2&a=1#x'"
)
_SYN_ML = (
    "text || chr(10) || (CASE WHEN doc_id % 2 = 0 THEN 'subscribe now' "
    "ELSE 'body ' || doc_id END) || (CASE WHEN doc_id % 3 = 0 THEN "
    "chr(10) || 'all rights reserved' ELSE '' END)"
)
_RED_EXPR, _RED_COUNTS = scrub.duckdb_redact_sql("pii_raw")
_SCRUB_SQL = f"""
    SELECT s.doc_id,
      {scrub.duckdb_canonical_url_sql('s.url_raw')} AS canon_url,
      ({_RED_COUNTS[0]} + {_RED_COUNTS[1]} + {_RED_COUNTS[2]}) AS n_pii,
      md5({_RED_EXPR}) AS fp_redacted,
      b.n_kept AS n_clean_lines, md5(b.text_clean) AS fp_clean
    FROM (
      SELECT doc_id, {_SYN_PII} AS pii_raw, {_SYN_URL} AS url_raw
      FROM documents
    ) s JOIN (
      {scrub.duckdb_strip_boilerplate_sql(
          f"SELECT doc_id, {_SYN_ML} AS text FROM documents")}
    ) b ON b.doc_id = s.doc_id
"""


def _scrub_metrics(d: DataFrame) -> DataFrame:
    """(doc_id, canon_url, n_pii, fp_redacted, n_clean_lines,
    fp_clean) — Spark twin of _SCRUB_SQL over the same synthesis."""
    did = F.col("doc_id").cast("string")
    pii_raw = F.concat(
        F.col("text"), F.lit(" contact user"), did,
        F.lit("@Example.COM at 10."),
        (F.col("doc_id") % 200).cast("string"), F.lit("."),
        ((F.col("doc_id") * 7) % 250).cast("string"),
        F.lit(".8 or 555-210-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    url_raw = F.concat(
        F.lit("HTTPS://WWW.Site"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example.com:443/p/"), did,
        F.lit("/?utm_source=t&q="), (F.col("doc_id") % 13).cast("string"),
        F.lit("&b=2&a=1#x"),
    )
    ml_text = F.concat(
        F.col("text"), F.lit("\n"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("subscribe now"))
        .otherwise(F.concat(F.lit("body "), did)),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit("\nall rights reserved")).otherwise(F.lit("")),
    )
    red = scrub.redact_pii(
        d.select("doc_id", pii_raw.alias("text"))
    ).select(
        "doc_id",
        (F.col("n_email") + F.col("n_ip") + F.col("n_phone")).alias("n_pii"),
        F.md5("text_redacted").alias("fp_redacted"),
    )
    boiler = scrub.strip_boilerplate(
        d.select("doc_id", ml_text.alias("text")), max_df_ratio=0.3
    ).select(
        "doc_id", F.col("n_kept").alias("n_clean_lines"),
        F.md5("text_clean").alias("fp_clean"),
    )
    return (
        d.select("doc_id", scrub.canonical_url(url_raw).alias("canon_url"))
        .join(red, "doc_id").join(boiler, "doc_id")
    )


@register(
    "text_doc_metrics",
    f"""
    WITH q AS ({textstats.duckdb_quality_sql()}),
    sc AS ({_SCRUB_SQL})
    SELECT d.doc_id, {_LANG_PRED} AS lang_pred,
      q.n_tokens, q.mean_token_len, q.distinct_ratio, q.stopword_ratio,
      q.symbol_ratio, q.quality_score,
      len(list_filter(regexp_split_to_array(d.text, '\\s+'),
          t -> t <> ''))::BIGINT AS ws_tokens,
      len(regexp_extract_all(d.text, '{textstats.BPE_ISH_PATTERN}'))::BIGINT
        AS bpe_tokens,
      len({duckdb_tokens_sql('d.text')})::BIGINT AS analyzer_tokens,
      md5(array_to_string({duckdb_tokens_sql('d.text')}, ' ')) AS fp_exact,
      md5(array_to_string(
        list_sort(list_distinct({duckdb_tokens_sql('d.text')})), ' '))
        AS fp_bag,
      sc.canon_url, sc.n_pii, sc.fp_redacted, sc.n_clean_lines, sc.fp_clean
    FROM documents d JOIN q ON q.doc_id = d.doc_id
    JOIN sc ON sc.doc_id = d.doc_id
    """,
)
def text_doc_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole text-analysis family as ONE wide per-doc row:
    language id (stopword-ratio argmax), quality features + composite
    score, the three token budgets (whitespace / BPE-ish / analyzer),
    both deterministic fingerprints (exact + bag-of-tokens), and the
    scrub family (operators/scrub.py) over deterministically
    synthesized inputs: canonical URL, PII redaction hit count +
    redacted-text md5, and CCNet-style boilerplate-line removal
    (kept-line count + cleaned-text md5)."""
    d = _t(spark, sf_dir, "documents")
    q = textstats.quality_features(d).select(
        "doc_id", "n_tokens", "mean_token_len", "distinct_ratio",
        "stopword_ratio", "symbol_ratio", "quality_score",
    )
    li = textstats.lang_id(d).select("doc_id", "lang_pred")
    tc = textstats.token_counts(d).select(
        "doc_id", "ws_tokens", "bpe_tokens", "analyzer_tokens"
    )
    fp = textstats.fingerprint(d).select("doc_id", "fp_exact", "fp_bag")
    sc = _scrub_metrics(d)
    return (
        li.join(q, "doc_id").join(tc, "doc_id").join(fp, "doc_id")
        .join(sc, "doc_id")
        .select(
            "doc_id", "lang_pred", "n_tokens", "mean_token_len",
            "distinct_ratio", "stopword_ratio", "symbol_ratio",
            "quality_score", "ws_tokens", "bpe_tokens", "analyzer_tokens",
            "fp_exact", "fp_bag", "canon_url", "n_pii", "fp_redacted",
            "n_clean_lines", "fp_clean",
        )
    )


# ---------------------------------------------------------------------------
# training-batch assembly: packing / sampling / sharding
# ---------------------------------------------------------------------------

_TOKEXPR = f"len({duckdb_tokens_sql('text')})"

#: DSIR selection parameters shared by the Spark side and the oracle
_DSIR_RAW = "doc_id < 300"
_DSIR_TGT = "doc_id >= 300 AND lang = 'en' AND n_chars > 300"
_DSIR_K, _DSIR_B = 30, 2048


def _dsir_oracle() -> str:
    from .operators.dsir import duckdb_dsir_sql

    return duckdb_dsir_sql(_DSIR_RAW, _DSIR_TGT, k=_DSIR_K,
                           n_buckets=_DSIR_B)


#: NB quality-classifier parameters shared by Spark side and oracle
_NBQ_TRAIN, _NBQ_B = "doc_id < 400", 2048


def _nbq_oracle() -> str:
    from .operators.classifier import duckdb_nb_sql

    return duckdb_nb_sql(_NBQ_TRAIN, n_buckets=_NBQ_B)


# ---------------------------------------------------------------------------
# BPE chk-row plumbing (the corpus-scale tokenizer APPLY,
# operators/bpe.py) — the merge table is a LITERAL (rank order; every
# multi-char component produced by an earlier rank, the invariant real
# BPE training guarantees), so both engines encode from the same
# metadata. The DuckDB twin exploits the standard equivalence between
# iterative lowest-rank-first merging and exhaustive rank-order
# application: each rule is one left-to-right replace() over a
# \x1f-separated symbol string, chained in rank order.
# ---------------------------------------------------------------------------

_BPE_MERGES = [
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e</w>"),
    ("s", "p"), ("sp", "a"), ("spa", "r"), ("spar", "k</w>"),
    ("t", "h"), ("th", "e</w>"),
    ("r", "o"), ("ro", "w</w>"),
    ("f", "a"), ("fa", "s"), ("fas", "t</w>"),
    ("v", "a"), ("va", "l"), ("val", "u"), ("valu", "e</w>"),
]


def _bpe_toks_duck(text_expr: str) -> str:
    """DuckDB list-of-tokens expression replaying operators/bpe.py's
    encode: pretokenize (same regex), wrap every symbol as
    ``chr(31) || sym || chr(31)`` (so each symbol owns BOTH its
    separators — a single shared separator would be consumed by one
    replace() match and hide the immediately following occurrence of
    the same pair, e.g. 'tata' under merge (t,a)), append the </w>
    end-of-word convention, then run the rank-ordered replace chain
    ``␟a␟␟b␟ -> ␟ab␟``."""
    from .operators.textstats import BPE_ISH_PATTERN

    # per-symbol wrapping: ␟c1␟␟c2␟...␟cn</w>␟
    sym = ("chr(31) || array_to_string(regexp_extract_all(w, '.', 0), "
           "chr(31) || chr(31)) || '</w>' || chr(31)")
    merged = sym
    for a, b in _BPE_MERGES:
        merged = (f"replace({merged}, chr(31) || '{a}' || chr(31) || "
                  f"chr(31) || '{b}' || chr(31), "
                  f"chr(31) || '{a}{b}' || chr(31))")
    return (
        "list_filter(string_split(array_to_string(list_transform("
        f"regexp_extract_all(lower({text_expr}), '{BPE_ISH_PATTERN}', 0), "
        f"w -> {merged}), ''), chr(31)), x -> x <> '')"
    )




@register(
    "pack_sample_shard",
    f"""
    WITH packed AS (
      {packing.duckdb_pack_sql("documents", _TOKEXPR, budget=512,
                               shard_col="lang")}
    )
    SELECT 'pack' AS chk, doc_id::VARCHAR AS key, pack_id AS n,
      lang || ':' || tokens::VARCHAR || ':' || oversize::VARCHAR AS detail
    FROM packed
    UNION ALL
    SELECT 'sample', lang, count(*), '' FROM documents
    WHERE (CASE
      WHEN lang = 'en' THEN {packing.duckdb_hash_sample_sql('doc_id', 0.25)}
      ELSE {packing.duckdb_hash_sample_sql('doc_id', 0.8)} END)
    GROUP BY lang
    UNION ALL
    SELECT 'shard', ({packing.duckdb_shard_sql('doc_id', 16)})::VARCHAR,
           count(*), ''
    FROM documents GROUP BY 2
    UNION ALL
    SELECT 'contam', tot.doc_id::VARCHAR, coalesce(hit.nc, 0),
           tot.n_grams::VARCHAR
    FROM (
      SELECT doc_id, len({dedup.duckdb_shingles_sql('text', 4)}) AS n_grams
      FROM documents
      WHERE len({dedup.duckdb_shingles_sql('text', 4)}) > 0
    ) tot
    LEFT JOIN (
      SELECT dg.doc_id, count(*) AS nc
      FROM (SELECT doc_id,
                   unnest({dedup.duckdb_shingles_sql('text', 4)}) AS g
            FROM documents) dg
      JOIN (SELECT DISTINCT
                   unnest({dedup.duckdb_shingles_sql('text', 4)}) AS g
            FROM documents WHERE doc_id < 5) bg
        USING (g)
      GROUP BY dg.doc_id
    ) hit ON tot.doc_id = hit.doc_id
    UNION ALL
    SELECT 'repetition', ls.doc_id::VARCHAR, ls.n_lines,
           (floor(ls.dlf * 1e6 + 5e-1)::BIGINT)::VARCHAR || '|' ||
           (floor(ls.dlcf * 1e6 + 5e-1)::BIGINT)::VARCHAR || '|' ||
           (floor(coalesce(t2.frac, 0) * 1e6 + 5e-1)::BIGINT)::VARCHAR || '|' ||
           (floor(coalesce(t3.frac, 0) * 1e6 + 5e-1)::BIGINT)::VARCHAR
    FROM (
      WITH lx AS (
        SELECT doc_id,
               list_filter(string_split(text, chr(10)),
                           s -> trim(s) <> '') AS ls
        FROM documents)
      SELECT doc_id, len(ls) AS n_lines,
             CASE WHEN len(ls) > 0 THEN
               {round_det_sql('''(len(ls) - len(list_distinct(ls)))
                     / len(ls)::DOUBLE''', 6)} ELSE 0 END AS dlf,
             CASE WHEN len(array_to_string(ls, '')) > 0 THEN
               {round_det_sql('''(len(array_to_string(ls, ''))
                      - len(array_to_string(list_distinct(ls), '')))
                     / len(array_to_string(ls, ''))::DOUBLE ''', 6)}
             ELSE 0 END AS dlcf
      FROM lx
    ) ls
    LEFT JOIN ({textstats.duckdb_top_ngram_sql(2)}) t2
      ON t2.doc_id = ls.doc_id
    LEFT JOIN ({textstats.duckdb_top_ngram_sql(3)}) t3
      ON t3.doc_id = ls.doc_id
    UNION ALL
    SELECT 'dsir', id::VARCHAR, floor(logw * 1e6 + 5e-1)::BIGINT, ''
    FROM ({{DSIR}})
    UNION ALL
    SELECT 'nbq', id::VARCHAR, floor(logit * 1e6 + 5e-1)::BIGINT,
           keep::VARCHAR
    FROM ({{NBQ}})
    UNION ALL
    SELECT 'chunk', id::VARCHAR || '#' || start::VARCHAR,
           n_tokens::BIGINT, md5(text_chunk)
    FROM ({packing.duckdb_chunk_sql('documents', chunk=64, overlap=16)})
    UNION ALL
    SELECT 'bpe', doc_id::VARCHAR, len(toks)::BIGINT,
           md5(array_to_string(toks, ' '))
    FROM (SELECT doc_id, {{BPETOKS}} AS toks FROM documents)
    UNION ALL
    SELECT 'domcap', doc_id::VARCHAR, (doc_id % 7)::BIGINT, '' FROM (
      SELECT doc_id, row_number() OVER (
        PARTITION BY (doc_id % 7)
        ORDER BY 'https://host' || (doc_id % 7)::VARCHAR
                 || '.example.com/p/' || doc_id::VARCHAR) AS rn
      FROM documents) WHERE rn <= 10
    """.replace("{DSIR}", _dsir_oracle()).replace("{NBQ}", _nbq_oracle())
       .replace("{BPETOKS}", _bpe_toks_duck("text")),
)
def pack_sample_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-batch assembly in one gated entry: ~512-token sequence
    packing per language shard (window cumsum), deterministic
    stratified sampling (md5-threshold, head language downsampled),
    and the 16-way training-shard assignment histogram.

    Plus the corpus-hygiene passes: 'contam' rows are per-doc 4-gram
    benchmark decontamination (operators/contamination.py; the "eval
    set" is docs 0-4 of the same corpus so overlap is guaranteed at
    any SF — those docs show fully contaminated, the rest measure
    incidental n-gram collision); 'repetition' rows are the
    Gopher-style repetition signals (dup-line fractions + top-2/3-gram
    char coverage, operators/textstats.py), fractions carried as
    micro-unit integers in `detail` to dodge cross-engine float
    formatting."""
    from .analysis import tokens_sql

    d = _t(spark, sf_dir, "documents")
    dt = d.withColumn("_tok", F.size(F.expr(tokens_sql("text"))).cast("long"))
    pack = packing.pack_sequences(dt, "_tok", budget=512, shard_col="lang") \
        .select(
            F.lit("pack").alias("chk"),
            F.col("doc_id").cast("string").alias("key"),
            F.col("pack_id").alias("n"),
            F.concat_ws(
                ":", "lang", F.col("tokens").cast("string"),
                F.col("oversize").cast("string"),
            ).alias("detail"),
        )
    sample = packing.stratified_sample(
        d, "lang", {"en": 0.25}, key_col="doc_id", default=0.8
    ).groupBy("lang").agg(F.count("*").alias("n")).select(
        F.lit("sample").alias("chk"), F.col("lang").alias("key"), "n",
        F.lit("").alias("detail"),
    )
    shard = (
        d.select(packing.shard_id("doc_id", 16).alias("shard"))
        .groupBy("shard")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("shard").alias("chk"),
            F.col("shard").cast("string").alias("key"), "n",
            F.lit("").alias("detail"),
        )
    )
    from .operators.contamination import ngram_contamination
    from .operators.textstats import repetition_features

    contam = ngram_contamination(
        d, d.filter(F.col("doc_id") < 5), n=4,
    ).select(
        F.lit("contam").alias("chk"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("n_contaminated").alias("n"),
        F.col("n_grams").cast("string").alias("detail"),
    )
    micro = lambda c: F.floor(F.col(c) * 1e6 + F.lit(0.5)).cast("long").cast("string")  # noqa: E731
    rep = repetition_features(d).select(
        F.lit("repetition").alias("chk"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("n_lines").cast("long").alias("n"),
        F.concat_ws(
            "|", micro("dup_line_frac"), micro("dup_line_char_frac"),
            micro("top_2gram_char_frac"), micro("top_3gram_char_frac"),
        ).alias("detail"),
    )
    # 'dsir' rows: importance-resampled selection (operators/dsir.py,
    # arXiv:2302.03169) — raw = low ids, target = long en docs from
    # the rest of the corpus; deterministic Gumbel top-k, logw carried
    # as micro-unit integers (same float-formatting dodge as above)
    from .operators.dsir import dsir_sample

    raw = d.filter(F.col("doc_id") < 300)
    tgt = d.filter((F.col("doc_id") >= 300) & (F.col("lang") == "en")
                   & (F.col("n_chars") > 300))
    dsir = dsir_sample(raw, tgt, k=_DSIR_K, n_buckets=_DSIR_B).select(
        F.lit("dsir").alias("chk"),
        F.col("id").cast("string").alias("key"),
        F.floor(F.col("logw") * 1e6 + F.lit(0.5)).cast("long").alias("n"),
        F.lit("").alias("detail"),
    )
    # 'nbq' rows: NB log-odds quality classifier (operators/
    # classifier.py, the CCNet/fineweb curation scorer) — fit on the
    # low-id docs with lang='en' as the keep label, score everything;
    # logit in micro-units (cross-engine drift measured at 1e-14)
    from .operators.classifier import nb_fit, nb_score

    nbq_train = d.filter(F.expr(_NBQ_TRAIN)).withColumn(
        "label", (F.col("lang") == "en").cast("int"))
    nbq = nb_score(d, nb_fit(nbq_train, n_buckets=_NBQ_B)).select(
        F.lit("nbq").alias("chk"),
        F.col("id").cast("string").alias("key"),
        F.floor(F.col("logit") * 1e6 + F.lit(0.5)).cast("long").alias("n"),
        F.col("keep").cast("string").alias("detail"),
    )
    # 'chunk' rows: sliding-window chunking (64-token windows, 16
    # overlap) — per-chunk md5 in `detail` pins the reconstructed
    # chunk TEXT, not just the window arithmetic
    chunks = packing.chunk_documents(d, chunk=64, overlap=16).select(
        F.lit("chunk").alias("chk"),
        F.concat_ws("#", F.col("id").cast("string"),
                    F.col("start").cast("string")).alias("key"),
        F.col("n_tokens").cast("long").alias("n"),
        F.md5("text_chunk").alias("detail"),
    )
    # 'domcap' rows: per-domain quota (operators/scrub.py:
    # cap_per_domain, the C4/RefinedWeb host cap) over synthetic
    # doc_id-derived urls (7 hosts) so both engines build the same
    # input — kept docs after capping at 10/host
    durl = F.concat(
        F.lit("https://host"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/p/"), F.col("doc_id").cast("string"))
    domcap = scrub.cap_per_domain(
        d.withColumn("url", durl), 10).select(
        F.lit("domcap").alias("chk"),
        F.col("doc_id").cast("string").alias("key"),
        (F.col("doc_id") % 7).cast("long").alias("n"),
        F.lit("").alias("detail"),
    )
    # 'bpe' rows: the tokenizer APPLY pass (operators/bpe.py, one
    # mapInPandas with the literal merge table broadcast via closure);
    # md5 of the space-joined token stream pins the full encode, not
    # just the count
    from .operators.bpe import bpe_encode

    bpe = bpe_encode(d, _BPE_MERGES).select(
        F.lit("bpe").alias("chk"),
        F.col("id").cast("string").alias("key"),
        F.col("n_tokens").alias("n"),
        F.md5(F.concat_ws(" ", "tokens")).alias("detail"),
    )
    return (pack.unionByName(sample).unionByName(shard)
            .unionByName(contam).unionByName(rep).unionByName(dsir)
            .unionByName(nbq).unionByName(chunks).unionByName(domcap)
            .unionByName(bpe))



_Q_SQL = textstats.duckdb_quality_sql()


@register(
    "pipeline_curate_corpus",
    f"""
    WITH RECURSIVE q AS ({_Q_SQL}),
    qualified AS (
      SELECT d.doc_id, d.lang,
             md5(array_to_string({duckdb_tokens_sql('d.text')}, ' ')) AS fp
      FROM documents d JOIN q ON q.doc_id = d.doc_id
      WHERE q.quality_score >= 0.5 AND q.n_tokens >= 20
    ),
    exact_kept AS (
      SELECT min(doc_id) AS doc_id FROM qualified GROUP BY fp
    ),
    pairs AS ({dedup.duckdb_lsh_pairs_sql()}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, comp) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
    ),
    comp AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
    near_dropped AS (SELECT id FROM comp WHERE id <> comp),
    survivors AS (
      SELECT k.doc_id FROM exact_kept k
      WHERE k.doc_id NOT IN (SELECT id FROM near_dropped)
    )
    SELECT d.lang AS lang, count(*) AS n_docs,
           sum(len({duckdb_tokens_sql('d.text')}))::BIGINT AS n_tokens
    FROM survivors s JOIN documents d ON d.doc_id = s.doc_id
    GROUP BY d.lang
    """,
)
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline in one DAG: quality gate →
    exact dedup (canonical survivor) → near-dup removal (LSH
    candidates → connected components, non-canonical members dropped)
    → per-language doc/token budget of the surviving corpus."""
    from .analysis import tokens_sql

    d = _t(spark, sf_dir, "documents")
    q = textstats.quality_features(d).select(
        "doc_id", "quality_score", "n_tokens"
    )
    qualified = (
        d.join(q, "doc_id")
        .filter((F.col("quality_score") >= 0.5) & (F.col("n_tokens") >= 20))
        .withColumn(
            "fp", F.md5(F.concat_ws(" ", F.expr(tokens_sql("text"))))
        )
    )
    exact_kept = qualified.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))

    pairs = dedup.lsh_candidate_pairs(d)
    comps = dedup.connected_components(pairs)
    near_dropped = comps.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias("doc_id")
    )
    survivors = exact_kept.select("doc_id").join(
        near_dropped, "doc_id", "left_anti"
    )
    return (
        survivors.join(d, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.expr(tokens_sql("text")))).cast("long")
            .alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

_MM_VARIANTS = [m[0] for m in multimodal.MAGIC[:4]]
_MM_HDR = (
    "(CASE doc_id % 4 "
    + " ".join(
        f"WHEN {i} THEN from_hex('{v}')" for i, v in enumerate(_MM_VARIANTS)
    )
    + " END)"
)


@register(
    "mm_magic_sniff_counts",
    f"""
    WITH m AS (
      SELECT doc_id AS media_id, {_MM_HDR} || encode(text) AS media
      FROM documents
    )
    SELECT {multimodal.duckdb_sniff_sql('media')} AS fmt,
           count(*) AS n, sum(octet_length(media))::BIGINT AS total_bytes
    FROM m GROUP BY 1
    """,
)
def mm_magic_sniff_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary plumbing: synthesize media payloads, sniff the
    container format from magic bytes (ref siem/utils.py:913-927
    analog), aggregate per format."""
    media = multimodal.synthesize_media(_t(spark, sf_dir, "documents"))
    meta = multimodal.media_metadata(media)
    return meta.groupBy("fmt").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
    )
