"""SemDeDup: semantic deduplication over an embedding column.

The embedding-space sibling of the MinHash/SimHash family (public
algorithm: Abbas et al. 2023, "SemDeDup: Data-Efficient Learning at
Web-Scale Through Semantic Deduplication", arXiv:2303.09540):

1. cluster the embeddings around k centroids (cheap proxy for the
   pairwise structure; centroids are caller-provided, at scale from a
   sampled k-means — same contract as the IVF index),
2. WITHIN each cluster only, find pairs with cosine similarity above
   the threshold (the paper's 1 − ε),
3. group duplicates into connected components and keep ONE
   representative per component — the member with the LOWEST cosine
   similarity to its cluster centroid (the paper's best-performing
   keep rule: prefer the least prototypical member).

Scale shape (the reason step 1 exists): the pairwise join is
per-cell, never corpus-wide — O(Σ m_c²) with m_c ≈ n/k, so k is
chosen to bound cluster sizes (the paper uses ~100k clusters at
web scale). The cell assignment is a broadcast join against the
k-row centroid table; the component pass reuses the dedup module's
min-label propagation (one decreasing-aggregate job per round).

All cosine math runs in double precision via the shared
:func:`dedup.cosine_col`, so the DuckDB oracle reproduces values
bit-comparably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import connected_components, cosine_col


def semdedup_assign(vecs: DataFrame, centroids: DataFrame,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    cent_id: str = "cent_id", cent_vec: str = "cent_vec",
                    ) -> DataFrame:
    """(id, cell, cent_sim): max-cosine centroid per vector plus the
    similarity itself (the keep rule needs it). Broadcast join +
    single max-of-struct aggregate; ties break by centroid id asc."""
    sim = cosine_col(F.col(vec_col), F.col(cent_vec))
    crossed = vecs.join(F.broadcast(centroids)).select(
        F.col(id_col), F.col(cent_id), sim.alias("sim")
    )
    best = crossed.groupBy(id_col).agg(
        F.max(F.struct(F.col("sim"),
                       (-F.col(cent_id)).alias("_neg"))).alias("m")
    )
    return best.select(
        F.col(id_col),
        (-F.col("m._neg")).cast("long").alias("cell"),
        F.col("m.sim").alias("cent_sim"),
    )


def semdedup_pairs(vecs: DataFrame, assign: DataFrame, threshold: float,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   max_cell_size: int | None = None) -> DataFrame:
    """Within-cell duplicate pairs (id_a < id_b, cosine >= threshold).
    The self-join keys on ``cell``: pair work is bounded per cluster,
    never corpus-wide.

    ``max_cell_size`` bounds the one case the paper's k-choice cannot:
    a mega-cluster (near-duplicate flood, degenerate embeddings) whose
    m² pair join would dominate the job. Cells larger than the cap are
    deterministically sub-split (xxhash64 of the id into
    ceil(m/cap) sub-cells) so every pair task stays O(cap²). The
    documented approximation: duplicates landing in DIFFERENT
    sub-cells of an oversized cell are missed — the same contract as
    having chosen a larger k, and SemDeDup is an approximation by
    construction (cross-cell duplicates are always missed). Leave None
    for exact within-cell behavior."""
    key_names = ["cell"]
    if max_cell_size is not None:
        # per-cell sizes are a k-row metadata aggregate; the split
        # factor broadcasts back so the sub-cell tag is map-side
        sizes = assign.groupBy("cell").agg(F.count("*").alias("_m"))
        splits = sizes.select(
            "cell",
            F.ceil(F.col("_m") / F.lit(max_cell_size))
            .cast("long").alias("_n_sub"))
        assign = (assign.join(F.broadcast(splits), "cell")
                  .withColumn(
                      "_sub",
                      F.pmod(F.xxhash64(F.col(id_col)), F.col("_n_sub")))
                  .drop("_n_sub"))
        key_names = ["cell", "_sub"]
    tagged = vecs.join(
        assign.select(id_col, *key_names), id_col)
    a = tagged.select(F.col(id_col).alias("id_a"),
                      F.col(vec_col).alias("_va"), *key_names)
    b = tagged.select(F.col(id_col).alias("id_b"),
                      F.col(vec_col).alias("_vb"), *key_names)
    return (
        a.join(b, key_names)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_col(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cell", "cosine")
    )


def semdedup(vecs: DataFrame, centroids: DataFrame, threshold: float,
             id_col: str = "vec_id", vec_col: str = "embedding",
             cent_id: str = "cent_id", cent_vec: str = "cent_vec",
             max_cell_size: int | None = None) -> DataFrame:
    """Full SemDeDup labeling: one row per input vector with

    * ``cell``     — assigned cluster,
    * ``comp``     — duplicate-component id (own id when unpaired),
    * ``keep``     — True for singletons and for each component's
      representative (lowest ``cent_sim``, ties by id asc).

    Downstream keeps ``filter(keep)`` — the deduplicated corpus."""
    assign = semdedup_assign(vecs, centroids, id_col, vec_col,
                             cent_id, cent_vec)
    pairs = semdedup_pairs(vecs, assign, threshold, id_col, vec_col,
                           max_cell_size=max_cell_size)
    comps = connected_components(pairs)  # (id, comp), paired ids only

    labeled = (
        assign.join(comps.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn("comp", F.coalesce(F.col("comp"), F.col(id_col)))
    )
    # representative: ranked window per component — components are
    # duplicate groups (small by construction), so the window is
    # bounded; tie-break (cent_sim asc, id asc) is total
    w = Window.partitionBy("comp").orderBy(
        F.asc("cent_sim"), F.asc(id_col))
    return (
        labeled.withColumn("_rn", F.row_number().over(w))
        .withColumn("keep", F.col("_rn") == 1)
        .drop("_rn", "cent_sim")
        .select(id_col, "cell", "comp", "keep")
    )


def duckdb_semdedup_sql(threshold: float, n_cents: int = 8,
                        max_id: int = 200,
                        table: str = "embeddings") -> str:
    """The same algorithm in DuckDB SQL (oracle backend): argmax
    assignment, within-cell pairs, recursive min-label components,
    lowest-cent_sim representative."""
    cos = ("list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
           " * sqrt(list_dot_product({b}, {b})))")
    return f"""
    WITH RECURSIVE
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM {table}
          WHERE vec_id < {max_id}),
    c AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS ce
          FROM {table} WHERE vec_id < {n_cents}),
    sim AS (SELECT v.vec_id, c.cent_id,
                   {cos.format(a='e', b='ce')} AS s FROM v, c),
    assign AS (
      SELECT vec_id, cent_id AS cell, s AS cent_sim FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY s DESC, cent_id) AS rn
        FROM sim) WHERE rn = 1
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM v a JOIN assign aa ON a.vec_id = aa.vec_id
      JOIN v b ON a.vec_id < b.vec_id
      JOIN assign ab ON b.vec_id = ab.vec_id AND aa.cell = ab.cell
      WHERE {cos.format(a='a.e', b='b.e')} >= {threshold}
    ),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, comp) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
    ),
    comps AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
    labeled AS (
      SELECT a.vec_id, a.cell, coalesce(c2.comp, a.vec_id) AS comp,
             a.cent_sim
      FROM assign a LEFT JOIN comps c2 ON a.vec_id = c2.id
    )
    SELECT vec_id, cell, comp,
           (row_number() OVER (PARTITION BY comp
              ORDER BY cent_sim, vec_id) = 1) AS keep
    FROM labeled
    """
