"""Sharded HNSW graph ANN — the OpenSearch k-NN plugin's actual engine.

The reference delegates vector search to the OpenSearch k-NN plugin,
whose default method is an HNSW graph per Lucene segment with
scatter-gather merge across shards (knn_vector mapping; the plugin is
enabled in the reference domain config, reference
source/lambda/deploy_es/data.ini index settings). This module rebuilds
that shape Spark-first:

* **Build** — vectors are hash-sharded (``id % n_shards``; xxhash for
  sparse id spaces) and each shard constructs its own small-world graph
  in ONE ``applyInPandas`` group (numpy; the per-shard graph is the
  analog of a Lucene segment graph and must fit a worker, exactly the
  k-NN plugin's segment-memory contract). Construction is the standard
  HNSW insert (Malkov & Yashunin, arXiv:1603.09320): greedy descent on
  upper layers, ``ef_construction`` beam on insertion layers,
  reciprocal-edge prune to ``M`` (``2M`` at layer 0).

* **Determinism** — no RNG anywhere: node levels come from the id
  (md5 -> uniform -> geometric via floor(-ln(u)/ln(M))), inserts run in
  sorted-id order, all heap ties break on id. The graph is a pure
  function of the shard's rows, so results are stable across input
  partitioning — pinned by tests.

* **Query** — scatter-gather: every shard group loads its graph +
  vectors (one ``applyInPandas`` pass over the shard-partitioned
  parquet), answers the whole query batch with a greedy top-layer
  descent + ``ef_search`` beam at layer 0, and emits its local top-k;
  a per-query window over the (n_shards x k) candidate rows — metadata
  sized — keeps the global best. Recall (not exactness) is the ANN
  contract: tests pin recall@10 >= 0.95 vs the brute-force oracle and
  exact agreement when ef covers the shard.

Scale posture: 10^9 vectors / 256 shards -> ~4 M vectors per graph
(the k-NN plugin's per-segment ceiling is the same order); query cost
is n_shards * O(ef * M * log n) dot products, all inside one Arrow
batch per shard, no driver collect of anything but the final top-k.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..detfloat import round_det

GRAPH_SCHEMA = ("shard int, id long, layer int, neighbors array<long>, "
                "vec array<float>")


def _levels_for(ids: np.ndarray, m: int) -> np.ndarray:
    """Deterministic HNSW level per id: md5(id) -> u in (0,1) ->
    floor(-ln(u)/ln(M)) — the paper's geometric distribution with
    mL = 1/ln(M), minus the RNG."""
    import hashlib

    ml = 1.0 / math.log(m)
    out = np.empty(ids.size, dtype=np.int64)
    for j, i in enumerate(ids):
        h = int.from_bytes(
            hashlib.md5(str(int(i)).encode()).digest()[:8], "big")
        u = (h + 1) / float(2 ** 64 + 1)
        out[j] = int(-math.log(u) * ml)
    return out


def _norm_rows(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return mat / n


def _search_layer(q: np.ndarray, eps: list[int], ef: int,
                  adj: dict, vecs: np.ndarray, pos: dict) -> list:
    """Beam search one layer; returns [(sim, id)] best-first, <= ef."""
    visited = set(eps)
    best: list = []    # min-heap (sim, id): worst of the kept set first
    cand: list = []    # min-heap (-sim, id): most promising first
    for e in eps:
        s = float(vecs[pos[e]] @ q)
        heapq.heappush(best, (s, e))
        heapq.heappush(cand, (-s, e))
    while cand:
        negs, c = heapq.heappop(cand)
        if len(best) >= ef and -negs < best[0][0]:
            break
        for nb in adj.get(c, ()):
            if nb in visited:
                continue
            visited.add(nb)
            s = float(vecs[pos[nb]] @ q)
            if len(best) < ef or s > best[0][0]:
                heapq.heappush(cand, (-s, nb))
                heapq.heappush(best, (s, nb))
                if len(best) > ef:
                    heapq.heappop(best)
    return sorted(best, reverse=True)


def _build_shard(ids: np.ndarray, mat: np.ndarray, m: int,
                 efc: int) -> list[dict]:
    """Construct one shard's graph (sorted-id insertion); returns
    layered adjacency as dicts {layer: {id: [neighbors]}}."""
    order = np.argsort(ids)
    ids, mat = ids[order], _norm_rows(mat[order].astype(np.float64))
    pos = {int(i): j for j, i in enumerate(ids)}
    levels = _levels_for(ids, m)
    layers: list[dict] = [dict() for _ in range(int(levels.max()) + 1)]
    entry, entry_level = int(ids[0]), int(levels[0])
    for lay in range(int(levels[0]) + 1):
        layers[lay][int(ids[0])] = []
    for j in range(1, ids.size):
        i, lvl, q = int(ids[j]), int(levels[j]), mat[j]
        eps = [entry]
        for lay in range(entry_level, lvl, -1):
            got = _search_layer(q, eps, 1, layers[lay], mat, pos)
            eps = [got[0][1]]
        for lay in range(min(lvl, entry_level), -1, -1):
            cands = _search_layer(q, eps, efc, layers[lay], mat, pos)
            cap = m if lay > 0 else 2 * m
            sel = [cid for _s, cid in cands[:cap]]
            layers[lay][i] = list(sel)
            for nb in sel:
                lst = layers[lay].setdefault(nb, [])
                lst.append(i)
                if len(lst) > cap:
                    sims = sorted(
                        ((float(mat[pos[x]] @ mat[pos[nb]]), x)
                         for x in lst), reverse=True)
                    layers[lay][nb] = [x for _s, x in sims[:cap]]
            eps = [cid for _s, cid in cands]
        for lay in range(entry_level + 1, lvl + 1):
            layers[lay][i] = []
        if lvl > entry_level:
            entry, entry_level = i, lvl
    return layers


def hnsw_build(vecs: DataFrame, n_shards: int = 4, m: int = 8,
               ef_construction: int = 64, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Graph rows ``(shard, id, layer, neighbors, vec)`` — vec carried
    on layer-0 rows only. Persist with :func:`hnsw_save` (partitioned
    by shard) so query tasks stream one shard each."""
    src = vecs.select(
        (F.col(id_col).cast("long") % n_shards).cast("int").alias("shard"),
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<float>").alias("vec"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        ids = pdf["id"].to_numpy(dtype=np.int64)
        mat = np.stack(pdf["vec"].to_numpy())
        layers = _build_shard(ids, mat, m, ef_construction)
        vec_of = dict(zip((int(x) for x in pdf["id"]), pdf["vec"]))
        rows = []
        for lay, adj in enumerate(layers):
            for i, nbs in adj.items():
                rows.append((shard, i, lay,
                             [int(x) for x in nbs],
                             vec_of[i] if lay == 0 else None))
        return pd.DataFrame(
            rows, columns=["shard", "id", "layer", "neighbors", "vec"])

    return src.repartition(n_shards, "shard").groupBy("shard") \
        .applyInPandas(build, schema=GRAPH_SCHEMA)


def hnsw_save(graph: DataFrame, path: str) -> None:
    graph.write.mode("overwrite").partitionBy("shard").parquet(path)


def hnsw_load(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def hnsw_save_bucketed(graph: DataFrame, table: str,
                       buckets: int | None = None) -> None:
    """Persist the graph SHARD-BUCKETED (Iceberg ``bucket(shard, B)``
    analog): the per-shard ``applyInPandas`` in :func:`hnsw_query` then
    plans with ZERO exchanges — the bucketed scan already clusters rows
    by shard, so a query batch never reshuffles the graph (pinned by
    tests/test_plan_shapes.py). This is the layout a 10^9-vector
    deployment wants; the plain :func:`hnsw_save` path shuffles the
    graph once per query batch instead."""
    (graph.write.bucketBy(buckets or 16, "shard")
     .sortBy("shard", "layer", "id")
     .mode("overwrite").saveAsTable(table))


def hnsw_query(graph: DataFrame, queries: list[tuple[int, list[float]]],
               k: int = 10, ef_search: int = 64) -> DataFrame:
    """Scatter-gather ANN top-k for a (small, driver-held) query batch.
    Returns ``(query_id, vec_id, cosine)`` — cosine rounded to 4dp like
    the rest of the similarity family; ties rank by vec_id asc."""
    qlist = [(int(qid), [float(x) for x in qv]) for qid, qv in queries]

    def search(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf0 = pdf[pdf["layer"] == 0]
        ids = pdf0["id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = _norm_rows(
            np.stack(pdf0["vec"].to_numpy())[order].astype(np.float64))
        raw = np.stack(pdf0["vec"].to_numpy())[order].astype(np.float64)
        pos = {int(i): j for j, i in enumerate(ids)}
        layers: dict[int, dict] = {}
        for lay, i, nbs in zip(pdf["layer"], pdf["id"], pdf["neighbors"]):
            layers.setdefault(int(lay), {})[int(i)] = [int(x) for x in nbs]
        top_layer = max(layers)
        # entry point: deterministic — max level, then min id
        entry = min(layers[top_layer])
        out = []
        for qid, qv in qlist:
            q = np.asarray(qv, dtype=np.float64)
            qn = np.linalg.norm(q)
            qdir = q / qn if qn > 0 else q
            eps = [entry]
            for lay in range(top_layer, 0, -1):
                got = _search_layer(qdir, eps, 1, layers[lay], mat, pos)
                eps = [got[0][1]]
            got = _search_layer(qdir, eps, max(ef_search, k),
                                layers[0], mat, pos)
            for sim, i in got[:k]:
                # report TRUE cosine of the raw vectors (same value —
                # both sides normalized; recompute on raw for parity
                # with cosine_topk's formula)
                rv = raw[pos[i]]
                den = (np.linalg.norm(rv) * qn)
                c = float(rv @ q / den) if den > 0 else 0.0
                out.append((qid, i, c))
        return pd.DataFrame(out, columns=["query_id", "vec_id", "cosine"])

    cands = graph.groupBy("shard").applyInPandas(
        search, schema="query_id long, vec_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id"))
    return (cands.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "vec_id",
                    round_det("cosine", 4).alias("cosine")))
