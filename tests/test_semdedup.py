"""SemDeDup (embedding semantic dedup): Spark labeling vs a pure
numpy/union-find twin implementing the published algorithm, plus the
scale-shape plan check (per-cell join, no cartesian pair pass)."""

import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.operators.semdedup import (
    semdedup,
    semdedup_assign,
    semdedup_pairs,
)

DIM = 8
N_CENTS = 3


@pytest.fixture(scope="module")
def data():
    """Deterministic vectors with PLANTED near-duplicate groups:
    base directions plus tiny jitter => within-group cosine ~1."""
    rng = np.random.RandomState(7)
    bases = rng.randn(6, DIM)
    rows = []
    vid = 0
    for b in bases:
        group = rng.randint(1, 4)          # 1-3 near-copies per base
        for _ in range(group):
            v = b + rng.randn(DIM) * 0.01  # jitter: cosine ~ 0.999
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    # plus well-separated singletons
    for _ in range(8):
        v = rng.randn(DIM) * 3
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    return rows


@pytest.fixture(scope="module")
def frames(spark, data):
    vecs = spark.createDataFrame(
        data, "vec_id long, embedding array<float>")
    cents = spark.createDataFrame(
        [(i, v) for i, v in [(r[0], r[1]) for r in data[:N_CENTS]]],
        "cent_id long, cent_vec array<float>")
    return vecs, cents


def _twin(data, threshold):
    """Pure-python SemDeDup with the same float32-input/double-math
    contract."""
    ids = [r[0] for r in data]
    V = {r[0]: np.asarray(r[1], dtype=np.float32).astype(np.float64)
         for r in data}
    C = {i: V[data[i][0]] for i in range(N_CENTS)}

    def cos(a, b):
        return float(a @ b / (np.sqrt(a @ a) * np.sqrt(b @ b)))

    cell, cent_sim = {}, {}
    for i in ids:
        best = max(((cos(V[i], C[c]), -c) for c in C))
        cell[i], cent_sim[i] = -best[1], best[0]

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in ids:
        for b in ids:
            if a < b and cell[a] == cell[b] and cos(V[a], V[b]) >= threshold:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {i: find(i) for i in ids}
    keep = {}
    by_comp = {}
    for i in ids:
        by_comp.setdefault(comp[i], []).append(i)
    for members in by_comp.values():
        rep = min(members, key=lambda i: (cent_sim[i], i))
        for i in members:
            keep[i] = i == rep
    return {i: (cell[i], comp[i], keep[i]) for i in ids}


def test_semdedup_matches_twin(spark, frames, data):
    vecs, cents = frames
    got = {r.vec_id: (r.cell, r.comp, r.keep)
           for r in semdedup(vecs, cents, threshold=0.95).collect()}
    want = _twin(data, 0.95)
    assert got == want
    # the planted duplicates were actually found (non-vacuous)
    assert sum(1 for _, (_, _, k) in want.items() if not k) >= 3


def test_threshold_monotone(spark, frames):
    vecs, cents = frames
    kept_hi = semdedup(vecs, cents, 0.999).filter("keep").count()
    kept_lo = semdedup(vecs, cents, 0.5).filter("keep").count()
    assert kept_lo <= kept_hi  # lower threshold removes more


def test_pairs_stay_within_cells(spark, frames):
    vecs, cents = frames
    assign = semdedup_assign(vecs, cents)
    pairs = semdedup_pairs(vecs, assign, threshold=0.9)
    cells = {r.vec_id: r.cell for r in assign.collect()}
    for r in pairs.collect():
        assert cells[r.id_a] == cells[r.id_b] == r.cell


def test_plan_no_cartesian_pair_pass(spark, frames):
    """The pairwise stage must key on cell (hash join) — an
    all-pairs cartesian would be quadratic in the corpus. (The
    k-row centroid broadcast is the one intended nested-loop.)"""
    vecs, cents = frames
    out = semdedup(vecs, cents, threshold=0.9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_mega_cluster_cap_bounds_pair_work(spark):
    """One dominant cluster (all vectors near one direction) is the
    O(m^2) failure mode the paper's k-choice can't prevent;
    max_cell_size must sub-split it so pair tasks stay O(cap^2),
    while capped pairs remain a SUBSET of the exact within-cell
    pairs (the documented approximation)."""
    from pyspark.sql import functions as F

    from siem_on_amazon_opensearch_service_spark.operators.semdedup import (
        semdedup_assign, semdedup_pairs)

    n = 120
    rows = [(i, [1.0, 0.001 * (i % 5), 0.0]) for i in range(n)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "cent_id long, cent_vec array<double>")
    assign = semdedup_assign(vecs, cents)
    # everything lands in cell 0 — the mega-cluster
    assert assign.filter("cell = 0").count() == n

    exact = semdedup_pairs(vecs, assign, threshold=0.999)
    capped = semdedup_pairs(vecs, assign, threshold=0.999,
                            max_cell_size=20)
    n_exact, n_capped = exact.count(), capped.count()
    assert n_exact > 0 and n_capped < n_exact
    ekeys = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    ckeys = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert ckeys <= ekeys
    # the bound itself: ceil(120/20) = 6 sub-cells; the largest hash
    # bucket (== the largest pair task's row count) must sit near
    # n/6, far below the uncapped m = 120
    sub_sizes = (assign
                 .withColumn("_sub", F.pmod(F.xxhash64("vec_id"), F.lit(6)))
                 .groupBy("_sub").count().collect())
    assert max(r["count"] for r in sub_sizes) < n // 2


def test_cap_none_is_exact_default(spark):
    from siem_on_amazon_opensearch_service_spark.operators.semdedup import (
        semdedup, semdedup_assign, semdedup_pairs)  # noqa: F401

    rows = [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)])
            for i in range(30)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])],
        "cent_id long, cent_vec array<double>")
    lab = semdedup(vecs, cents, threshold=0.999)
    lab_cap = semdedup(vecs, cents, threshold=0.999, max_cell_size=1000)
    assert sorted(map(tuple, lab.collect())) == \
        sorted(map(tuple, lab_cap.collect()))
