"""Similarity search over an embedding column (array<float>).

Two paths (SURVEY-style baseline + scale path):

* :func:`cosine_topk` — brute-force: one narrow pass computing the
  query-vs-row cosine with native array expressions (``zip_with`` +
  ``aggregate``, whole-stage codegen — no Python in the hot path),
  then ``TakeOrderedAndProject`` for top-k. At 100 TB this is the
  exact-rescore stage, not the entry point.

* IVF (inverted-file) — the scale path: partition vectors into cells
  around centroids (:func:`ivf_assign`), at query time probe only the
  ``nprobe`` nearest cells (:func:`ivf_topk`). The cell assignment is
  a broadcast join against the (tiny) centroid table + per-row argmax;
  a materialized assignment table partitioned by ``cell`` gives
  partition-pruned probes, the IVF analog of the term-bucketed
  postings layout.

Centroids here are caller-provided (deterministic); at scale they come
from a sampled k-means — the engine's contract only needs "some
centroid table", keeping the operator testable without randomness.

All math in double precision over the float32 input so the DuckDB
oracle reproduces values bit-comparably (4-decimal rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import cosine_col
from ..detfloat import round_det


def cosine_topk(vecs: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine to ``query_vec``. Ties break by id asc."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = vecs.select(
        F.col(id_col), cosine_col(F.col(vec_col), q).alias("cosine")
    )
    return (
        scored.orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(id_col, round_det("cosine", 4).alias("cosine"))
    )


def cosine_radial(vecs: DataFrame, query_vec: list[float],
                  min_score: float | None = None,
                  max_distance: float | None = None,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """k-NN *radial* search (the k-NN plugin's ``min_score`` /
    ``max_distance`` query variants): every vector within the score
    radius, best first — no k.

    Exactly one of ``min_score`` / ``max_distance`` must be given; for
    the cosine space the plugin defines distance = 1 − cosine, so
    ``max_distance=d`` is ``min_score=1−d``. Scale shape: a radial
    query is a pure map-side FILTER over the scan — strictly cheaper
    than top-k (no global TakeOrdered heap at all); the result size is
    the caller's contract, exactly as in the plugin.
    """
    if (min_score is None) == (max_distance is None):
        raise ValueError("radial search takes exactly one of "
                         "min_score / max_distance")
    cutoff = (float(min_score) if min_score is not None
              else 1.0 - float(max_distance))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = vecs.select(
        F.col(id_col), cosine_col(F.col(vec_col), q).alias("cosine")
    ).filter(F.col("cosine") >= cutoff)
    return scored.select(
        id_col, round_det("cosine", 4).alias("cosine")
    ).orderBy(F.desc("cosine"), F.asc(id_col))


def _metric_sim(v, c, metric: str):
    """Similarity column for the argmax assignment: cosine, or
    NEGATED l2/l1 distance (max of the negation == min distance) —
    all native zip_with/aggregate folds, codegen."""
    if metric == "cosine":
        return cosine_col(v, c)
    # element-wise math in DOUBLE (same posture as cosine_col): for
    # array<float> inputs a float32 subtract/square can rank two
    # near-tied centroids differently from a double-precision oracle,
    # flipping a cell assignment
    diff = F.zip_with(v, c,
                      lambda a, b: a.cast("double") - b.cast("double"))
    if metric == "l2":
        return -F.aggregate(diff, F.lit(0.0),
                            lambda acc, x: acc + x * x)
    if metric == "l1":
        return -F.aggregate(diff, F.lit(0.0),
                            lambda acc, x: acc + F.abs(x))
    raise ValueError(f"unknown metric {metric!r}")


def ivf_assign(vecs: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding",
               cent_id: str = "cent_id", cent_vec: str = "cent_vec",
               metric: str = "cosine") -> DataFrame:
    """Assign every vector to its best centroid (max cosine — the
    IVF default — or min l2/l1 via ``metric``, the ml-commons kmeans
    distance_type options).

    centroids is small — broadcast; the argmax is a groupBy(max_by)
    whose input never leaves the vector's partition except for the
    final combine. Ties break by centroid id asc (deterministic).
    """
    sim = _metric_sim(F.col(vec_col), F.col(cent_vec), metric)
    crossed = vecs.join(F.broadcast(centroids)).select(
        F.col(id_col), F.col(cent_id), sim.alias("sim")
    )
    # max_by with explicit deterministic tie-break: struct ordering
    # (sim desc, cent_id asc) via a single max over struct(sim, -cent_id).
    best = crossed.groupBy(id_col).agg(
        F.max(F.struct(F.col("sim"), (-F.col(cent_id)).alias("_neg"))).alias("m")
    )
    return best.select(
        F.col(id_col), (-F.col("m._neg")).cast("long").alias("cell")
    )


def probe_cells(centroids: DataFrame, query_vec: list[float],
                nprobe: int = 4, cent_id: str = "cent_id",
                cent_vec: str = "cent_vec") -> list[int]:
    """The nprobe max-cosine cell ids for a query (driver-side: the
    centroid table is k rows of metadata by construction)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    rows = (
        centroids.select(
            F.col(cent_id).alias("cell"),
            cosine_col(F.col(cent_vec), q).alias("csim"),
        )
        .orderBy(F.desc("csim"), F.asc("cell"))
        .limit(nprobe)
        .collect()
    )
    return [int(r["cell"]) for r in rows]


def ivf_save(vecs: DataFrame, centroids: DataFrame, path: str,
             id_col: str = "vec_id", vec_col: str = "embedding",
             cent_id: str = "cent_id", cent_vec: str = "cent_vec") -> None:
    """Materialize the IVF layout ONCE at build time: vectors written
    ``partitionBy("cell")`` so a probe reads only its cells' files --
    the IVF analog of the term-bucketed postings layout. This is the
    index-build step; queries go through :func:`ivf_topk_materialized`
    and never recompute the assignment."""
    assign = ivf_assign(vecs, centroids, id_col, vec_col, cent_id, cent_vec)
    (
        vecs.join(assign, id_col)
        .write.partitionBy("cell").mode("overwrite").parquet(path)
    )


def ivf_topk_materialized(
    spark, path: str, centroids: DataFrame, query_vec: list[float],
    k: int = 10, nprobe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    cent_id: str = "cent_id", cent_vec: str = "cent_vec",
) -> DataFrame:
    """Approximate top-k over the materialized IVF layout: the probe
    cells resolve on the driver (k centroids = metadata), so the scan
    filter is a LITERAL ``cell IN (...)`` that Spark turns into
    directory-level partition pruning -- per-query cost is
    O(corpus * nprobe / n_cells), never a full scan (the round-2
    recompute-per-query flag is gone)."""
    cells = probe_cells(centroids, query_vec, nprobe, cent_id, cent_vec)
    cand = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def ivf_topk(vecs: DataFrame, centroids: DataFrame, query_vec: list[float],
             k: int = 10, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             cent_id: str = "cent_id", cent_vec: str = "cent_vec",
             assign: DataFrame | None = None) -> DataFrame:
    """Approximate top-k: probe the nprobe closest cells only.

    Pass ``assign`` (a precomputed (id, cell) table -- e.g. the one
    :func:`ivf_save` wrote) to skip recomputing the corpus assignment;
    without it this recomputes the argmax per call and is only the
    right shape for one-shot use. The production query path is
    :func:`ivf_topk_materialized`, where the assignment is baked into
    the storage layout and probing is partition pruning.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe = (
        centroids.select(
            F.col(cent_id).alias("cell"),
            cosine_col(F.col(cent_vec), q).alias("csim"),
        )
        .orderBy(F.desc("csim"), F.asc("cell"))
        .limit(nprobe)
        .select("cell")
    )
    if assign is None:
        assign = ivf_assign(vecs, centroids, id_col, vec_col,
                            cent_id, cent_vec)
    cand = vecs.join(
        assign.join(F.broadcast(probe), "cell").select(id_col), id_col
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def make_centroids(vecs: DataFrame, n_cells: int,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic centroid table: the vectors with the n_cells
    smallest ids (a fixed 'sample'; refine with :func:`kmeans_fit`)."""
    return (
        vecs.orderBy(F.asc(id_col))
        .limit(n_cells)
        .select(
            F.col(id_col).cast("long").alias("cent_id"),
            F.col(vec_col).alias("cent_vec"),
        )
    )


def kmeans_fit(vecs: DataFrame, n_cells: int, n_iter: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding",
               tol: float = 1e-4, metric: str = "cosine") -> DataFrame:
    """Lloyd's k-means with deterministic init (the n_cells lowest-id
    vectors) — the real IVF training step.

    Each iteration: assignment = broadcast-argmax against the tiny
    centroid table (narrow), update = per-dimension mean via
    ``posexplode`` + hash agg (one shuffle keyed (cell, dim)). Empty
    cells keep their previous centroid. The centroid table is
    collected per round (k x dim floats — tiny by construction), so
    lineage never grows with n_iter, and the collected rounds give a
    FREE convergence criterion: stop early once the max per-centroid
    L2 shift drops below ``tol`` (``n_iter`` stays the hard bound).
    """
    import math

    prev_rows: dict[int, list[float]] | None = None
    cents = make_centroids(vecs, n_cells, id_col, vec_col)
    for _ in range(n_iter):
        assign = ivf_assign(vecs, cents, id_col, vec_col,
                            metric=metric)
        joined = vecs.join(assign, id_col).select("cell", vec_col)
        dims = joined.select(
            "cell", F.posexplode(F.col(vec_col)).alias("pos", "x")
        )
        means = (
            dims.groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("v"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda s: s["v"].cast("float"),
                ).alias("new_vec")
            )
        )
        prev = cents
        updated = prev.join(
            means, prev["cent_id"] == means["cell"], "left"
        ).select(
            prev["cent_id"],
            F.coalesce(means["new_vec"], prev["cent_vec"]).alias("cent_vec"),
        )
        # materialize: the table is k x dim — collect breaks lineage
        rows = [(int(r["cent_id"]), list(r["cent_vec"])) for r in updated.collect()]
        cents = vecs.sparkSession.createDataFrame(
            rows, "cent_id long, cent_vec array<float>"
        )
        cur = {cid: vec for cid, vec in rows}
        if prev_rows is not None:
            shift = max(
                (
                    math.sqrt(
                        sum((a - b) ** 2 for a, b in zip(vec, prev_rows[cid]))
                    )
                    for cid, vec in cur.items()
                    if cid in prev_rows
                ),
                default=0.0,
            )
            if shift < tol:
                break  # converged: centroids stopped moving
        prev_rows = cur
    return cents
