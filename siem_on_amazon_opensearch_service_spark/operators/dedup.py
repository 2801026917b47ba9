"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale design (the actual goal — 100 TB corpora):

* exact: one hash-aggregate on ``md5(normalized_text)`` — shuffle
  volume is one 32-byte digest per doc, not the text.
* MinHash+LSH: shingle explode is narrow (docs stay in place); the
  signature aggregate is a map-side-combinable ``min`` per (doc,
  seed); the only join is band-bucket self-join whose key cardinality
  is bounded by band keys, and bucket sizes are capped (``MAX_BUCKET``)
  before pairing so a degenerate bucket (boilerplate pages) can never
  produce a quadratic pair explosion.
* SimHash: pure per-doc map-side computation (explode + conditional
  sums), no pairwise work at all — collisions found by a groupBy on
  the 16-bit key.
* n-gram Jaccard: exact verification of *candidate pairs only* (LSH
  output), never all-pairs at scale; the all-pairs variant here is
  explicitly scoped to a bounded id range as the small-scale oracle
  baseline.
* embedding cosine: all math in double precision over float32 input
  so Spark and the oracle agree bit-for-bit after 4-decimal rounding.

Determinism: all hashing is md5 over explicit seed||value strings —
identical in Spark, DuckDB and Python, no engine-private hash.

Algorithms are the public classics: MinHash (Broder, "On the
resemblance and containment of documents", SEQUENCES 1997) with
banded LSH (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets
ch. 3), SimHash (Charikar, "Similarity estimation techniques from
rounding algorithms", STOC 2002), and min-label-propagation connected
components (the iterative MapReduce formulation, cf. Kang et al.
PEGASUS, ICDM 2009).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..analysis import duckdb_tokens_sql, tokens_sql
from ..detfloat import round_det, round_det_sql

SHINGLE = 3
N_HASH = 8          # minhash signature length
N_BANDS = 4         # LSH bands (rows per band = N_HASH / N_BANDS)
MAX_BUCKET = 64     # cap on docs per LSH bucket before pairing
SIMHASH_BITS = 16


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------

def shingles_col(text_col: str, n: int = SHINGLE) -> Column:
    """Spark Column of distinct n-token shingles (native, codegen'd)."""
    toks = F.expr(tokens_sql(text_col))
    # guard: sequence(0, negative) is a DESCENDING sequence in Spark,
    # so short docs need an explicit empty index array.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))

    def mk(i: Column) -> Column:
        return F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        )

    return F.array_distinct(F.transform(idx, mk))


def duckdb_shingles_sql(text_expr: str, n: int = SHINGLE) -> str:
    """DuckDB SQL producing the identical distinct shingle list."""
    toks = duckdb_tokens_sql(text_expr)
    parts = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))
    # single-element-list + lambda binds the token array to `t` once
    # (DuckDB has no correlated scalar subquery in this position).
    return (
        f"list_transform([{toks}], t -> list_distinct(list_transform("
        f"range(1, greatest(len(t) - {n - 1}, 0) + 1), i -> {parts})))[1]"
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level exact-duplicate stats on normalized text.

    Normalization: lowercase + whitespace-collapse (the token join),
    so trivially-reformatted copies hash identically. Shuffle carries
    md5 digests only.
    """
    key = F.md5(F.concat_ws(" ", F.expr(tokens_sql(text_col))))
    per_key = docs.select(key.alias("k")).groupBy("k").agg(
        F.count("*").alias("n")
    )
    return per_key.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("long").alias("n_dup_groups"),
        F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0))
        .cast("long").alias("n_removable"),
    )


def substring_windows(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", window: int = 20,
                      stride: int = 1) -> DataFrame:
    """One row per ``window``-token span: (id, p, wh) where ``wh`` is
    the md5 of the span's tokens — the window-hash approximation of
    exact-substring dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better", ACL 2022 §4: the suffix-array pass
    finds duplicated spans ≥ L tokens; hashing every L-token window at
    ``stride`` finds the same spans with a shuffle-friendly plan).

    Scale: the explode is narrow (each doc expands in place, no
    shuffle); the downstream groupBy shuffles 16-byte digests, never
    text. ``stride`` trades shuffle volume for recall: strided
    windows are only guaranteed to hit a duplicated span when joined
    against an EXHAUSTIVE (stride=1) window set on the other side —
    a shared span of ≥ L+stride-1 tokens then always contains an
    aligned pair — so stride>1 belongs on the bulky side of an
    asymmetric join (e.g. decontamination: strided corpus windows vs
    exhaustive benchmark windows). Corpus self-dedup (the
    groupBy-on-hash path) must use stride=1: two strided docs can
    sample the same span at incompatible phases."""
    toks = F.expr(tokens_sql(text_col))
    t = docs.select(
        F.col(id_col).alias("id"), toks.alias("_tk")
    ).withColumn("_npos", F.size("_tk") - window + 1)
    pos = (
        t.filter(F.col("_npos") >= 1)
        .select("id", "_tk",
                F.explode(F.sequence(F.lit(1), F.col("_npos"),
                                     F.lit(stride))).alias("p"))
    )
    return pos.select(
        "id", "p",
        F.md5(F.concat_ws(" ", F.slice("_tk", F.col("p"), window)))
        .alias("wh"),
    )


def substring_dup_stats(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        window: int = 20) -> DataFrame:
    """Corpus-level duplicated-span stats: total windows, distinct
    window hashes, duplicated span groups (hash seen ≥2 times), and
    docs containing at least one duplicated span. Two digest-only
    shuffles."""
    win = substring_windows(docs, text_col, id_col, window)
    per_hash = win.groupBy("wh").agg(F.count("*").alias("n"))
    tot = per_hash.agg(
        F.sum("n").cast("long").alias("n_windows"),
        F.count("*").cast("long").alias("n_span_hashes"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("long")
        .alias("n_dup_span_groups"),
    )
    dup_docs = (
        win.join(per_hash.filter(F.col("n") > 1).select("wh"), "wh",
                 "left_semi")
        .agg(F.countDistinct("id").cast("long")
             .alias("n_docs_with_dup_span"))
    )
    return tot.crossJoin(dup_docs)  # 1x1 stats fold


def duckdb_substring_stats_sql(window: int = 20,
                               table: str = "documents") -> str:
    """DuckDB twin of :func:`substring_dup_stats` (same tokenizer,
    same md5-of-joined-span keys)."""
    return f"""
    WITH tk AS (
      SELECT doc_id AS id, {duckdb_tokens_sql('text')} AS toks
      FROM {table}
    ), w AS (
      SELECT id, md5(array_to_string(list_slice(toks, p, p + {window} - 1),
                                     ' ')) AS wh
      FROM tk, unnest(generate_series(1, len(toks) - {window} + 1)) AS u(p)
      WHERE len(toks) >= {window}
    ), g AS (SELECT wh, count(*) AS n FROM w GROUP BY wh)
    SELECT (SELECT sum(n) FROM g)::BIGINT AS n_windows,
           (SELECT count(*) FROM g)::BIGINT AS n_span_hashes,
           (SELECT sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)
            FROM g)::BIGINT AS n_dup_span_groups,
           (SELECT count(DISTINCT w.id) FROM w
            JOIN g ON w.wh = g.wh AND g.n > 1)::BIGINT
             AS n_docs_with_dup_span
    """


def duplicate_spans(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", window: int = 20,
                    min_count: int = 2) -> DataFrame:
    """Maximal duplicated token spans per doc: every ``window``-token
    span whose hash occurs >= ``min_count`` times corpus-wide, with
    overlapping/adjacent windows MERGED into (id, s, e) intervals
    (1-based token positions, ``e`` exclusive) — the output of the
    Lee-et-al. suffix-array dedup restated over window hashes.

    Plan: the one digest shuffle from :func:`substring_windows`'s
    groupBy, a left-semi join back, then a per-doc sort+fold. The
    interval merge is a native ``aggregate`` over each doc's sorted
    duplicate starts (bounded by that doc's duplicated content, never
    the corpus), zero Python."""
    win = substring_windows(docs, text_col, id_col, window)
    per_hash = win.groupBy("wh").agg(F.count("*").alias("n"))
    dup = win.join(
        per_hash.filter(F.col("n") >= min_count).select("wh"),
        "wh", "left_semi")
    starts = dup.groupBy("id").agg(
        F.sort_array(F.collect_list("p")).alias("ps"))
    L = window
    empty = F.array().cast("array<struct<s:int,e:int>>")

    def step(acc, x):
        last = F.element_at(acc, -1)
        merged = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(F.struct(last["s"].alias("s"),
                             F.greatest(last["e"], x + L).alias("e"))))
        fresh = F.concat(acc, F.array(
            F.struct(x.alias("s"), (x + L).alias("e"))))
        # windows at x <= last.e overlap or touch the running span
        return F.when((F.size(acc) > 0) & (x <= last["e"]),
                      merged).otherwise(fresh)

    return (starts
            .select("id", F.aggregate("ps", empty, step).alias("iv"))
            .select("id", F.explode("iv").alias("iv"))
            .select("id", F.col("iv.s").alias("s"),
                    F.col("iv.e").alias("e")))


def strip_duplicate_spans(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", window: int = 20,
                          min_count: int = 2) -> DataFrame:
    """Remove every duplicated span (ALL occurrences — the paper's
    policy: spans frequent enough to dedup are frequent enough that
    dropping all copies is safe) and re-join the surviving tokens.
    Returns (id, text_clean, n_tokens, n_removed). Token-level, so
    original inter-token whitespace is normalized to single spaces —
    the same canonicalization the exact-dedup key uses."""
    spans = (duplicate_spans(docs, text_col, id_col, window, min_count)
             .groupBy("id")
             .agg(F.collect_list(F.struct("s", "e")).alias("iv")))
    toks = F.expr(tokens_sql(text_col))
    base = docs.select(F.col(id_col).alias("id"), toks.alias("_tk"))
    j = base.join(spans, "id", "left").withColumn(
        "iv", F.coalesce("iv", F.array().cast(
            "array<struct<s:int,e:int>>")))
    idx = F.transform(
        "_tk", lambda t, i: F.struct(t.alias("t"), (i + 1).alias("p")))
    keep = F.filter(idx, lambda s: ~F.exists(
        F.col("iv"), lambda v: (s["p"] >= v["s"]) & (s["p"] < v["e"])))
    return j.select(
        "id",
        F.concat_ws(" ", F.transform(keep, lambda s: s["t"]))
        .alias("text_clean"),
        F.size("_tk").alias("n_tokens"),
        (F.size("_tk") - F.size(keep)).alias("n_removed"),
    )


def duckdb_spans_sql(window: int = 20, table: str = "documents",
                     min_count: int = 2) -> str:
    """DuckDB twin of :func:`duplicate_spans` — the classic
    gaps-and-islands formulation (break when a start exceeds the
    running max span end, cumulative-sum the breaks, group)."""
    return f"""
    WITH tk AS (
      SELECT doc_id AS id, {duckdb_tokens_sql('text')} AS toks
      FROM {table}
    ), w AS (
      SELECT id, p, md5(array_to_string(
               list_slice(toks, p, p + {window} - 1), ' ')) AS wh
      FROM tk, unnest(generate_series(1, len(toks) - {window} + 1)) AS u(p)
      WHERE len(toks) >= {window}
    ), g AS (SELECT wh FROM w GROUP BY wh HAVING count(*) >= {min_count}),
    d AS (SELECT id, p FROM w JOIN g USING (wh)),
    m AS (
      SELECT id, p, CASE WHEN p <= coalesce(
               max(p) OVER (PARTITION BY id ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               + {window}, -1) THEN 0 ELSE 1 END AS brk
      FROM d),
    i AS (SELECT id, p, sum(brk) OVER (PARTITION BY id ORDER BY p
            ROWS UNBOUNDED PRECEDING) AS isl FROM m)
    SELECT id, min(p)::INT AS s, (max(p) + {window})::INT AS e
    FROM i GROUP BY id, isl
    """


def duckdb_strip_stats_sql(window: int = 20,
                           table: str = "documents") -> str:
    """DuckDB twin of the strip pass, reduced to corpus stats:
    merged-span count, tokens removed, docs touched, and the total
    cleaned-text length (pins the reconstructed output, not just the
    span arithmetic)."""
    return f"""
    SELECT
      (SELECT count(*) FROM spans_cte)::BIGINT AS n_merged_spans,
      (SELECT coalesce(sum(e - s), 0) FROM spans_cte)::BIGINT
        AS n_tokens_removed,
      (SELECT count(DISTINCT id) FROM spans_cte)::BIGINT
        AS n_docs_stripped,
      (SELECT coalesce(sum(length(clean)), 0) FROM (
         SELECT t.id, string_agg(t.tok, ' ' ORDER BY t.p) AS clean
         FROM (
           SELECT id, p, toks[p] AS tok
           FROM (SELECT doc_id AS id, {duckdb_tokens_sql('text')} AS toks
                 FROM {table}) tk,
                unnest(generate_series(1, len(toks))) AS u(p)
         ) t LEFT JOIN spans_cte s
           ON t.id = s.id AND t.p >= s.s AND t.p < s.e
         WHERE s.id IS NULL GROUP BY t.id))::BIGINT AS n_clean_chars
    """


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id doc per normalized-text group (the canonical
    survivor rule; deterministic)."""
    key = F.md5(F.concat_ws(" ", F.expr(tokens_sql(text_col))))
    keyed = docs.withColumn("_k", key)
    keep = keyed.groupBy("_k").agg(F.min(id_col).alias(id_col))
    return keyed.join(keep, ["_k", id_col], "left_semi").drop("_k")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

#: universal-hash family for minhash (MMDS ch. 3): ONE md5 per shingle
#: yields a 32-bit base h; member i is (a_i * h + b_i) mod P with P
#: prime > 2^32. Products stay < 2^63 (a_i < 2^31, h < 2^32), so both
#: engines evaluate in exact int64 -- and the per-shingle cost is one
#: digest + n_hash fused multiply-mods in whole-stage codegen, not
#: n_hash string digests (the 128-hash production setting was
#: md5-bound before).
MH_PRIME = 4294967311  # smallest prime > 2^32


def mh_params(n_hash: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) family -- the same constants feed the
    Spark operator and the DuckDB twin."""
    return [
        (((i * 2654435761) % (1 << 31)) | 1,
         (i * 40503 * 65537 + 12345) % MH_PRIME)
        for i in range(n_hash)
    ]


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       n_hash: int = N_HASH) -> DataFrame:
    """(id, h0..h{n-1}): per-family-member min of
    (a_i * md5_32(shingle) + b_i) mod P.

    Min-aggregate is map-side combinable; shuffle rows = docs, each
    n_hash * 8 bytes. Docs with < SHINGLE tokens have no shingles and
    drop out (cannot near-dup match).
    """
    # Shingle construction (regex tokenize + n-gram assembly) and the
    # n_hash min-aggs both run BEFORE any shuffle, so their
    # parallelism is the INPUT split count. A small-file corpus (one
    # parquet file = one split) would serialize the whole pass on one
    # core -- repartition the docs by id up to the cluster's
    # parallelism first. No-op at scale: a 100 TB input has orders of
    # magnitude more splits than cores, and hash-partitioning by id
    # also feeds the groupBy without a second exchange when the guard
    # does fire.
    src = docs
    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        src = docs.repartition(target, id_col)
    base = F.conv(
        F.substring(F.md5(F.col("s")), 1, 8), 16, 10
    ).cast("long")
    sh = src.select(
        F.col(id_col), F.explode(shingles_col(text_col)).alias("s")
    ).select(F.col(id_col), base.alias("_h"))
    aggs = [
        F.min(
            (F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(MH_PRIME)
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(mh_params(n_hash))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_threshold(n_hash: int = N_HASH, n_bands: int = N_BANDS) -> float:
    """The (b, r) S-curve midpoint: with b bands of r = n_hash/b rows,
    the probability a pair of Jaccard similarity s becomes a candidate
    is 1 - (1 - s^r)^b, which crosses ~0.5 near (1/b)^(1/r). Defaults
    (b=4, r=2) target ~0.5 — a deliberately recall-heavy toy setting;
    a production near-dup pass at 0.8+ similarity would run e.g.
    n_hash=128, n_bands=16 (r=8, threshold ~0.71) and let the exact
    verify step (verify_candidates_jaccard) cut the tail."""
    r = n_hash // n_bands
    return (1.0 / n_bands) ** (1.0 / r)


def lsh_candidate_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n_hash: int = N_HASH,
                        n_bands: int = N_BANDS,
                        max_bucket: int = MAX_BUCKET) -> DataFrame:
    """(id_a, id_b, n_bands) candidate near-dup pairs: docs sharing at
    least one LSH band key, with est_jaccard = matching signature
    fraction. ``(n_hash, n_bands)`` select the similarity threshold --
    see :func:`lsh_threshold` for the S-curve.

    Buckets are capped at ``max_bucket`` docs (rank by id within
    bucket) so boilerplate-heavy buckets cannot go quadratic — the cap
    is the skew guard this operator needs at web scale (same posture
    as the index build's hot-term salting).

    Cache hand-off: the n_docs x n_hash signature table persists
    (MEMORY_AND_DISK — it feeds every band) and stays referenced by
    the returned plan; the ContextCleaner reclaims it when the result
    frame is dropped. A long-running service that keeps many results
    alive should materialize + drop them promptly (the
    search_body/msearch release() posture).
    """
    from pyspark.sql import Window

    assert n_hash % n_bands == 0, "n_hash must divide into n_bands"
    rows = n_hash // n_bands
    # The signature table feeds THREE consumers (banding + both sides
    # of the est_jaccard join); without materialization each re-runs
    # the shingle explode + n_hash min-aggs -- at the production
    # n_hash=128 that triples the dominant cost. Persist it: n_docs x
    # n_hash*32B, the artifact a 100 TB run would checkpoint to a
    # table (MEMORY_AND_DISK -- spills, never recomputes).
    from pyspark import StorageLevel

    sigs = minhash_signatures(docs, text_col, id_col, n_hash).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            # '|'-separated: integer hash members need a delimiter so
            # "12"+"345" cannot collide with "123"+"45" across slots
            F.concat_ws(
                "|", *[F.col(f"h{b * rows + r}") for r in range(rows)]
            ).alias("key"),
        )
        for b in range(n_bands)
    ]
    bands = sigs.select(
        F.col(id_col).alias("id"), F.explode(F.array(*band_structs)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    w = Window.partitionBy("band", "key").orderBy("id")
    bands = bands.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_bucket
    ).drop("_rn")

    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count("*").cast("long").alias("n_bands"))
    )
    sa = sigs.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(n_hash)],
    )
    sb = sigs.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(n_hash)],
    )
    match = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(n_hash)
    )
    return (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .select(
            "id_a", "id_b", "n_bands",
            round_det(match.cast("double") / n_hash, 4).alias("est_jaccard"),
        )
    )


def duckdb_lsh_pairs_sql(table: str = "documents", text_expr: str = "text",
                         id_col: str = "doc_id", n_hash: int = N_HASH,
                         n_bands: int = N_BANDS,
                         max_bucket: int = MAX_BUCKET) -> str:
    """DuckDB twin of :func:`lsh_candidate_pairs` (same parameters)."""
    rows = n_hash // n_bands
    hashes = ", ".join(
        f"min(({a} * h + {b}) % {MH_PRIME}) AS h{i}"
        for i, (a, b) in enumerate(mh_params(n_hash))
    )
    band_rows = ", ".join(
        "({b}, {key})".format(
            b=b,
            key=" || '|' || ".join(
                f"h{b * rows + r}::VARCHAR" for r in range(rows)
            ),
        )
        for b in range(n_bands)
    )
    # flat list + len(list_filter): a 128-term "+ CASE WHEN" chain
    # exceeds DuckDB's expression-binder recursion depth at the
    # production n_hash; a list literal binds flat at any width.
    match = (
        "len(list_filter(["
        + ", ".join(f"sa.h{i} = sb.h{i}" for i in range(n_hash))
        + "], x -> x))"
    )
    return f"""
    WITH sh AS (
      SELECT {id_col} AS id,
             ('0x' || substr(md5(s), 1, 8))::BIGINT AS h
      FROM (
        SELECT {id_col}, unnest({duckdb_shingles_sql(text_expr)}) AS s
        FROM {table})
    ),
    sigs AS (SELECT id, {hashes} FROM sh GROUP BY id),
    bands AS (
      SELECT id, bk.band AS band, bk.key AS key
      FROM sigs, LATERAL (SELECT * FROM (VALUES {band_rows}) v(band, key)) bk
    ),
    capped AS (
      SELECT id, band, key,
             row_number() OVER (PARTITION BY band, key ORDER BY id) AS rn
      FROM bands
    ),
    c AS (SELECT id, band, key FROM capped WHERE rn <= {max_bucket}),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS n_bands
      FROM c a JOIN c b ON a.band = b.band AND a.key = b.key AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_bands,
           {round_det_sql(f'({match})::DOUBLE / {n_hash}', 4)} AS est_jaccard
    FROM pairs
    JOIN sigs sa ON sa.id = pairs.id_a
    JOIN sigs sb ON sb.id = pairs.id_b
    """


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

def jaccard_pairs(docs_a: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Exact 3-gram Jaccard over all pairs of ``docs_a`` (bound the
    input! — at scale this runs on LSH candidates, not the corpus).
    Returns (id_a, id_b, jaccard)."""
    sh = docs_a.select(
        F.col(id_col).alias("id"), shingles_col(text_col).alias("sh")
    ).filter(F.size("sh") > 0)
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            round_det(inter.cast("double") / union.cast("double"), 4).alias("jaccard"),
        )
    )


def verify_candidates_jaccard(docs: DataFrame, pairs: DataFrame,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """Scale path: exact Jaccard only for (id_a, id_b) candidate pairs
    (LSH output). Two broadcast-able joins against the shingle table."""
    sh = docs.select(
        F.col(id_col).alias("id"), shingles_col(text_col).alias("sh")
    )
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
    union = F.size(F.array_union(F.col("sha"), F.col("shb")))
    # zero-union guard: a caller-supplied pair of two shingle-less
    # (<n-token) docs must score 0.0, not DIVIDE_BY_ZERO under ANSI
    jac = F.when(union > 0,
                 round_det(inter.cast("double") / union.cast("double"), 4)
                 ).otherwise(F.lit(0.0))
    return (
        pairs.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sha")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("shb")), "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash16(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash per doc: bit p = sign of the sum over distinct
    tokens of (+1 if hex digit p of md5(token) >= 8 else -1).

    Each hex digit's top bit is an independent hash bit, so this is a
    real SimHash with 16 projections — and it is expressible
    identically in Spark SQL, DuckDB and Python. Entirely map-side:
    explode + conditional sum + bit-pack, no pairwise computation.
    """
    tok = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.expr(tokens_sql(text_col)))).alias("t"),
    ).withColumn("h", F.md5("t"))
    aggs = [
        F.sum(
            F.when(F.substring("h", p + 1, 1).isin(*"89abcdef"), 1).otherwise(-1)
        ).alias(f"b{p}")
        for p in range(SIMHASH_BITS)
    ]
    per_doc = tok.groupBy(id_col).agg(*aggs)
    packed = sum(
        F.when(F.col(f"b{p}") > 0, F.lit(1 << p)).otherwise(F.lit(0))
        for p in range(SIMHASH_BITS)
    )
    return per_doc.select(F.col(id_col), packed.cast("long").alias("simhash"))


def duckdb_simhash_sql(table: str = "documents", text_expr: str = "text",
                       id_col: str = "doc_id") -> str:
    hexhi = "('8','9','a','b','c','d','e','f')"
    bits = ", ".join(
        f"sum(CASE WHEN substr(h, {p + 1}, 1) IN {hexhi} "
        f"THEN 1 ELSE -1 END) AS b{p}"
        for p in range(SIMHASH_BITS)
    )
    pack = " + ".join(
        f"CASE WHEN b{p} > 0 THEN {1 << p} ELSE 0 END"
        for p in range(SIMHASH_BITS)
    )
    return f"""
    WITH tok AS (
      SELECT {id_col}, unnest(list_distinct({duckdb_tokens_sql(text_expr)})) AS t
      FROM {table}
    ), h AS (SELECT {id_col}, md5(t) AS h FROM tok),
    per_doc AS (SELECT {id_col}, {bits} FROM h GROUP BY {id_col})
    SELECT {id_col}, ({pack})::BIGINT AS simhash FROM per_doc
    """


# ---------------------------------------------------------------------------
# duplicate clustering: connected components over candidate pairs
# ---------------------------------------------------------------------------

def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """(node, component) for the undirected graph of candidate pairs;
    component id = min node id in the component (canonical survivor).

    Min-label propagation: each round every node takes the min of its
    own label and its neighbors' labels; converges in O(graph
    diameter) rounds — near-dup clusters are tiny and dense, so
    diameter is small. Each round is one join + one aggregate
    (shuffle on node id). Every round ``localCheckpoint``s its result:
    persist alone caches DATA but the logical plan still chains every
    prior round, so analysis cost (and driver heap) grows per round —
    checkpointing truncates the lineage to a constant per-round plan,
    the standard Spark idiom for iterative graph algorithms.
    """
    F_ = F
    fwd = pairs.select(F_.col(id_a).alias("src"), F_.col(id_b).alias("dst"))
    edges = fwd.union(
        fwd.select(F_.col("dst").alias("src"), F_.col("src").alias("dst"))
    ).persist()
    labels = (
        edges.select(F_.col("src").alias("id")).distinct()
        .withColumn("comp", F_.col("id"))
        .localCheckpoint(eager=True)
    )
    # convergence signal WITHOUT a join-back: each round carries a
    # per-node `_moved` flag (did a neighbor offer a smaller label?),
    # and ONE count aggregate both materializes the persisted round
    # and detects the fixpoint. Works for ANY orderable id type —
    # string ids (URL hashes, UUIDs) included; the earlier
    # sum(cast(comp AS DECIMAL)) signal crashed on non-numeric ids
    # under ANSI mode and silently mis-converged with ANSI off.
    moved = None
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(
                    F_.col("id").alias("dst"), F_.col("comp").alias("dcomp")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F_.min("dcomp").alias("ncomp"))
        )
        new = (
            labels.join(nbr, labels["id"] == nbr["src"], "left")
            .select(
                labels["id"],
                F_.least(
                    labels["comp"], F_.coalesce(F_.col("ncomp"), labels["comp"])
                ).alias("comp"),
                (F_.col("ncomp") < labels["comp"]).alias("_moved"),
            )
            .localCheckpoint(eager=True)
        )
        moved = new.agg(
            F_.count(F_.when(F_.col("_moved"), 1)).alias("n")
        ).collect()[0]["n"]
        # release the previous round's checkpointed blocks NOW: they
        # are pinned until driver GC otherwise, and memory would grow
        # with iteration count on large duplicate graphs
        prev, labels = labels, new
        prev.unpersist()
        if moved == 0:
            break  # no label moved: fixpoint
    edges.unpersist()
    if moved:
        # silent non-convergence splits one duplicate cluster into
        # several and keeps phantom survivors — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "rounds (graph diameter exceeds max_iter — a chain of "
            "transitive near-dups); raise max_iter")
    return labels.select(F_.col("id"), F_.col("comp"))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def cosine_col(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity of two array<float> columns, computed in
    double precision (cross-engine reproducible). A zero vector has
    no direction: the cosine is NULL (never a DIVIDE_BY_ZERO crash
    under ANSI mode), so threshold filters and top-k heaps exclude it
    naturally in both engines — the posture a 100 TB corpus with
    empty-doc/padding embeddings needs."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b

    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    denom = F.sqrt(dot(ca, ca)) * F.sqrt(dot(cb, cb))
    return F.when(denom != F.lit(0.0), dot(ca, cb) / denom)


def embedding_dup_pairs(vecs: DataFrame, threshold: float,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """All pairs with cosine >= threshold (bound the input at scale —
    run per LSH/IVF bucket, not all-pairs)."""
    a = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cos = cosine_col("va", "vb")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", round_det("cosine", 4).alias("cosine"))
    )
