"""ISM lifecycle (rollover / transitions / force_merge / delete):
policy evaluation must be deterministic under an explicit clock, and
queries over the managed generations must stay rank-identical to the
pure-Python oracle over exactly the live documents."""

import math
import os

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index.lifecycle import (
    ManagedIndex,
    parse_age,
    parse_size,
)
from siem_on_amazon_opensearch_service_spark.index.query import bm25_topk
from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex

N = 240
QUERIES = ["w00000 w00042", "w00001", "w00002 w00003"]


@pytest.fixture(scope="module")
def pages_pdf():
    return corpus.make_pages_pdf(N, seed=11)


def _thirds(spark, pages_pdf):
    third = N // 3
    return [
        spark.createDataFrame(pages_pdf.iloc[i * third:(i + 1) * third])
        for i in range(3)
    ]


def _oracle_topk(pages, k=10):
    docs = {row.url: row.text for row in pages.itertuples()}
    keys = sorted(docs)
    ora = OracleIndex.build({i: docs[u] for i, u in enumerate(keys)})
    return ora, keys


def _assert_matches_oracle(ix, pages, queries=QUERIES, k=10):
    ora, keys = _oracle_topk(pages, k)
    for q in queries:
        got = [
            (r["url"], r["score"])
            for r in bm25_topk(ix, q, k=k, with_url=True).collect()
        ]
        exp = [(keys[d], s) for d, s in ora.search(q, k)]
        assert [u for u, _ in got] == [u for u, _ in exp], q
        for (_, a), (_, b) in zip(got, exp):
            assert math.isclose(a, b, abs_tol=1e-6)


def test_parse_helpers():
    assert parse_size("100gb") == 100 * 1024**3
    assert parse_size("512") == 512
    assert parse_size(42) == 42
    assert parse_age("30d") == 30 * 86400
    assert parse_age("12h") == 12 * 3600
    with pytest.raises(ValueError):
        parse_size("100 lightyears")
    with pytest.raises(ValueError):
        parse_age("soon")


def test_rollover_by_doc_count_and_query_union(spark, pages_pdf, tmp_path):
    """min_doc_count rollover seals generations; the all-generations
    view scores rank-identically to the oracle on the full corpus."""
    policy = {
        "default_state": "hot",
        "states": [
            {"name": "hot",
             "actions": [{"rollover": {"min_doc_count": N // 3 + 1}}]},
        ],
    }
    mi = ManagedIndex(str(tmp_path / "mi"), policy, salt_threshold=500)
    batches = _thirds(spark, pages_pdf)
    acts0 = mi.append(batches[0], now=100.0)   # 80 docs: no rollover
    assert acts0 == []
    acts1 = mi.append(batches[1], now=200.0)   # 160 docs: seals gen 1
    assert {"rollover": "000001"} in acts1
    acts2 = mi.append(batches[2], now=300.0)   # gen 2 at 80 docs: stays
    assert acts2 == []
    gens = mi.generations()
    assert [g["name"] for g in gens] == ["000001", "000002"]
    assert gens[0]["sealed"] == 200.0 and gens[1]["sealed"] is None
    assert gens[0]["docs"] == 2 * (N // 3) and gens[1]["docs"] == N // 3

    ix = mi.load(spark)
    assert ix.n_docs == N
    _assert_matches_oracle(ix, pages_pdf)


def test_size_rollover_age_ladder_and_delete(spark, pages_pdf, tmp_path):
    """data.ini-style min_size rollover + hot->warm->delete age
    ladder: deletes retire directories AND the queryable doc set."""
    day = 86400.0
    policy = {
        "default_state": "hot",
        "states": [
            {"name": "hot",
             "actions": [{"rollover": {"min_size": "10kb"}}],
             "transitions": [{"state_name": "warm",
                              "conditions": {"min_index_age": "2d"}}]},
            {"name": "warm",
             "transitions": [{"state_name": "drop",
                              "conditions": {"min_index_age": "4d"}}]},
            {"name": "drop", "actions": [{"delete": {}}]},
        ],
    }
    mi = ManagedIndex(str(tmp_path / "mi2"), policy, salt_threshold=500)
    batches = _thirds(spark, pages_pdf)
    t0 = 1000.0
    mi.append(batches[0], now=t0)          # well over 10kb: seals
    assert mi.generations()[0]["sealed"] == t0
    mi.append(batches[1], now=t0 + 1 * day)
    # age past 2d: gen1 -> warm
    acts = mi.step(spark, now=t0 + 2.5 * day)
    assert {"transition": "000001", "from": "hot", "to": "warm"} in acts
    # age past 4d: gen1 -> drop state, next step deletes it
    acts = mi.step(spark, now=t0 + 4.5 * day)
    assert {"transition": "000001", "from": "warm", "to": "drop"} in acts
    gen1_dirs = [f"{mi.path}/delta/batch={b}"
                 for b in mi.generations()[0]["batches"]]
    acts = mi.step(spark, now=t0 + 4.5 * day)
    assert {"delete": "000001"} in acts
    assert [g["name"] for g in mi.generations()] == ["000002"]
    assert all(not os.path.exists(d) for d in gen1_dirs)

    # the queryable view is now exactly the second batch's docs
    third = N // 3
    live = pages_pdf.iloc[third:2 * third]
    ix = mi.load(spark)
    assert ix.n_docs == third
    _assert_matches_oracle(ix, live)


def test_force_merge_preserves_scores(spark, pages_pdf, tmp_path):
    """force_merge compacts a sealed generation's deltas into one dir
    (segment merge) without changing any score."""
    policy = {
        "default_state": "hot",
        "states": [
            {"name": "hot",
             "actions": [{"rollover": {"min_doc_count": N // 3 + 1}}],
             "transitions": [{"state_name": "warm",
                              "conditions": {"min_index_age": "1d"}}]},
            {"name": "warm", "actions": [{"force_merge": {}}]},
        ],
    }
    mi = ManagedIndex(str(tmp_path / "mi3"), policy, salt_threshold=500)
    batches = _thirds(spark, pages_pdf)
    mi.append(batches[0], now=0.0)
    mi.append(batches[1], now=1.0)          # seals gen1 (2 batches)
    mi.append(batches[2], now=2.0)
    acts = mi.step(spark, now=2 * 86400.0)  # gen1 -> warm
    assert any("transition" in a for a in acts)
    acts = mi.step(spark, now=2 * 86400.0)  # warm action: force_merge
    assert {"force_merge": "000001"} in acts
    gens = mi.generations()
    assert gens[0]["merged"] is True and len(gens[0]["batches"]) == 1
    # idempotent: second pass does not re-merge
    assert mi.step(spark, now=3 * 86400.0) == []

    ix = mi.load(spark)
    assert ix.n_docs == N
    _assert_matches_oracle(ix, pages_pdf)
    # state-filtered alias: hot only == batch 3's docs
    hot = mi.load(spark, states=["hot"])
    assert hot.n_docs == N // 3


def test_force_merge_crash_recovery(spark, pages_pdf, tmp_path, monkeypatch):
    """Round-5 durability pins: (a) a crash AFTER the merged tmp is
    complete but before the swap leaves a retry that finishes from
    tmp; (b) an incomplete (torn) tmp is discarded and the merge
    redone from intact sources."""
    policy = {
        "default_state": "hot",
        "states": [
            {"name": "hot",
             "actions": [{"rollover": {"min_doc_count": N // 3 + 1}}],
             "transitions": [{"state_name": "warm",
                              "conditions": {"min_index_age": "1d"}}]},
            {"name": "warm", "actions": [{"force_merge": {}}]},
        ],
    }
    root = str(tmp_path / "mi_crash")
    mi = ManagedIndex(root, policy, salt_threshold=500)
    batches = _thirds(spark, pages_pdf)
    mi.append(batches[0], now=0.0)
    mi.append(batches[1], now=1.0)  # seals gen1 with 2 batches
    mi.append(batches[2], now=2.0)
    mi.step(spark, now=2 * 86400.0)  # gen1 -> warm

    # (b) torn tmp: a stale incomplete dir must be discarded
    import os as _os
    tmp = f"{root}/delta/.merge_tmp_000001"
    _os.makedirs(f"{tmp}/postings", exist_ok=True)  # no stats marker

    # (a) crash injection: die right after the completeness marker
    import shutil as _shutil

    real_rmtree = _shutil.rmtree
    calls = {"n": 0}

    def crashing_rmtree(path, *a, **kw):
        if "/delta/batch=" in str(path):
            calls["n"] += 1
            raise RuntimeError("injected crash before source removal")
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(
        "siem_on_amazon_opensearch_service_spark.index.lifecycle."
        "shutil.rmtree", crashing_rmtree)
    with pytest.raises(RuntimeError, match="injected crash"):
        mi.step(spark, now=2 * 86400.0)
    monkeypatch.setattr(
        "siem_on_amazon_opensearch_service_spark.index.lifecycle."
        "shutil.rmtree", real_rmtree)
    # the complete tmp exists, sources intact -> retry finishes
    assert _os.path.exists(f"{tmp}/stats")
    acts = mi.step(spark, now=2 * 86400.0)
    assert {"force_merge": "000001"} in acts
    gens = mi.generations()
    assert gens[0]["merged"] is True and len(gens[0]["batches"]) == 1
    ix = mi.load(spark)
    assert ix.n_docs == N
    _assert_matches_oracle(ix, pages_pdf)


def test_generation_names_stay_monotonic_after_delete(
        spark, pages_pdf, tmp_path):
    """Deleting generations must not re-issue their names (the old
    len(gens)+1 scheme restarted at 000001 after a full retirement)."""
    policy = {
        "default_state": "hot",
        "states": [
            {"name": "hot",
             "actions": [{"rollover": {"min_doc_count": 1}}],
             "transitions": [{"state_name": "kill",
                              "conditions": {"min_index_age": "1s"}}]},
            {"name": "kill", "actions": [{"delete": {}}]},
        ],
    }
    mi = ManagedIndex(str(tmp_path / "mi_names"), policy,
                      salt_threshold=500)
    batches = _thirds(spark, pages_pdf)
    mi.append(batches[0], now=0.0)      # gen 000001 seals immediately
    mi.step(spark, now=10.0)            # -> kill
    mi.step(spark, now=20.0)            # deleted
    assert mi.generations() == []
    mi.append(batches[1], now=30.0)     # must be 000002, not 000001
    assert [g["name"] for g in mi.generations()] == ["000002"]
