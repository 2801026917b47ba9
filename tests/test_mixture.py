"""Temperature mixture sampling: rates law, determinism, and a true
cross-engine check (DuckDB SQL generated with the same driver-side
rates — rates are metadata, the row selection must be identical)."""

import duckdb
import pytest

from siem_on_amazon_opensearch_service_spark.operators.packing import (
    duckdb_hash_sample_sql,
    mixture_rates,
    mixture_sample,
)

DOCS = "/root/testdata/sf0.01/documents.parquet"


def test_mixture_rates_laws():
    counts = {"en": 800, "de": 150, "fr": 50}
    # T=1: proportional -> every source keeps the same fraction
    r1 = mixture_rates(counts, budget=500, temperature=1.0)
    assert r1["en"] == pytest.approx(r1["de"]) == pytest.approx(r1["fr"])
    # T>1 upweights rare sources: fr rate rises, en rate falls
    r2 = mixture_rates(counts, budget=500, temperature=2.0)
    assert r2["fr"] > r1["fr"] and r2["en"] < r1["en"]
    # rates cap at 1 (without-replacement)
    r3 = mixture_rates(counts, budget=10_000, temperature=1.0)
    assert max(r3.values()) == 1.0
    # expected kept size ~= budget when nothing caps
    exp = sum(r1[s] * counts[s] for s in counts)
    assert exp == pytest.approx(500, rel=1e-9)
    with pytest.raises(ValueError):
        mixture_rates(counts, budget=0)
    with pytest.raises(ValueError):
        mixture_rates(counts, budget=5, temperature=0)


def test_mixture_sample_cross_engine(spark):
    docs = spark.read.parquet(DOCS)
    counts = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").count().withColumnRenamed(
                  "count", "n").collect()}
    got = mixture_sample(docs, "lang", "doc_id", budget=200,
                         temperature=2.0)
    got_ids = sorted(int(r["doc_id"]) for r in
                     got.select("doc_id").collect())

    # DuckDB twin with the SAME driver-computed rates (metadata)
    rates = mixture_rates(counts, 200, 2.0)
    arms = " ".join(
        f"WHEN lang = '{s}' THEN {duckdb_hash_sample_sql('doc_id', f, 'mix')}"
        for s, f in rates.items()
    )
    con = duckdb.connect()
    orows = con.execute(
        f"SELECT doc_id FROM '{DOCS}' WHERE CASE {arms} ELSE FALSE END "
        f"ORDER BY doc_id"
    ).fetchall()
    assert got_ids == [int(r[0]) for r in orows]
    # kept size is near the budget (hash sampling is binomial-tight)
    assert abs(len(got_ids) - 200) < 50
    # determinism: second run identical
    again = sorted(int(r["doc_id"]) for r in
                   mixture_sample(docs, "lang", "doc_id", budget=200,
                                  temperature=2.0)
                   .select("doc_id").collect())
    assert again == got_ids


def test_mixture_shifts_proportions_toward_uniform(spark):
    docs = spark.read.parquet(DOCS)
    base = {r["lang"]: r["count"] for r in
            docs.groupBy("lang").count().collect()}
    kept = mixture_sample(docs, "lang", "doc_id", budget=250,
                          temperature=3.0)
    mix = {r["lang"]: r["count"] for r in
           kept.groupBy("lang").count().collect()}
    # high temperature compresses the spread: the max/min source ratio
    # must shrink vs the raw corpus
    raw_ratio = max(base.values()) / min(base.values())
    new_ratio = max(mix.values()) / max(1, min(mix.values()))
    assert new_ratio < raw_ratio
