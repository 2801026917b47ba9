"""Delete/update semantics (Lucene deleted-docs model): tombstone
mask at query time == oracle over the remaining corpus; compaction
physically removes masked docs and preserves results exactly."""

import math
import os

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex,
    build_index,
)
from siem_on_amazon_opensearch_service_spark.index.tombstones import (
    compact,
    delete_by_url,
    live_topk,
    load_tombstones,
)
from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex

QUERY = "w00000 w00012 w00003"
K = 10


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    pdf = corpus.make_pages_pdf(400, seed=23)
    pdf.insert(0, "doc_id", range(len(pdf)))
    sdf = spark.createDataFrame(pdf)
    path = str(tmp_path_factory.mktemp("ix_tomb"))
    build_index(spark, sdf, id_col="doc_id", salt_threshold=50).save(
        spark, path, buckets=4
    )
    return pdf, path


def _oracle_for(pdf, dropped_ids):
    return OracleIndex.build(
        {
            int(r.doc_id): r.text
            for r in pdf.itertuples()
            if int(r.doc_id) not in dropped_ids
        }
    )


def test_delete_masks_results_before_topk(spark, setup):
    pdf, path = setup
    ix = PostingsIndex.load(spark, path)

    # tombstone the current top-3 docs by url -- they must vanish and
    # deeper docs must surface in the top-k (mask BEFORE the cut).
    top_before = live_topk(ix, spark, path, QUERY, k=3).collect()
    victim_ids = [int(r["doc_id"]) for r in top_before]
    victim_urls = list(
        pdf[pdf["doc_id"].isin(victim_ids)]["url"]
    )
    assert delete_by_url(spark, path, victim_urls) == len(victim_ids)

    got = live_topk(ix, spark, path, QUERY, k=K).collect()
    got_ids = [int(r["doc_id"]) for r in got]
    assert not set(got_ids) & set(victim_ids)

    # NOTE: like Lucene, idf/avgdl still reflect pre-delete stats
    # until compaction -- so compare DOC SETS against an oracle that
    # keeps the original stats by masking its own result list.
    full_oracle = _oracle_for(pdf, set())
    masked = [
        (d, s)
        for d, s in full_oracle.search(QUERY, K + len(victim_ids))
        if d not in set(victim_ids)
    ][:K]
    assert got_ids == [d for d, _ in masked]
    for r, (_, s) in zip(got, masked):
        assert math.isclose(r["score"], s, rel_tol=1e-9, abs_tol=1e-9)


def test_compact_drops_masked_docs_and_recomputes_stats(
    spark, setup, tmp_path
):
    pdf, path = setup
    out = str(tmp_path / "compacted")
    cix = compact(spark, path, out, salt_threshold=50)

    # the SOURCE keeps its mask (its postings still hold the deleted
    # docs; stale readers must keep masking); the OUTPUT starts clean.
    assert load_tombstones(spark, path).count() == 3
    assert load_tombstones(spark, out).count() == 0

    # post-compaction the index IS the remaining corpus: scores match
    # an oracle built on the survivors (fresh n_docs/avgdl).
    survivors = set(int(r["doc_id"]) for r in cix.docs.select("doc_id").collect())
    dropped = set(int(d) for d in pdf["doc_id"]) - survivors
    assert len(dropped) == 3
    oracle = _oracle_for(pdf, dropped)
    exp = oracle.search(QUERY, K)

    from siem_on_amazon_opensearch_service_spark.index import bm25_topk

    got = bm25_topk(cix, QUERY, k=K).collect()
    assert [int(r["doc_id"]) for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert math.isclose(r["score"], s, rel_tol=1e-9, abs_tol=1e-9)


def test_compact_in_place_swaps_atomically(spark, tmp_path):
    """out_path == path: compaction must not overwrite parquet dirs
    its own lineage is reading -- the temp-sibling + swap path must
    produce exactly the separate-output result, consume the tombstone
    set, and leave no .compacting residue."""
    pdf = corpus.make_pages_pdf(200, seed=29)
    pdf.insert(0, "doc_id", range(len(pdf)))
    path = str(tmp_path / "ix")
    build_index(
        spark, spark.createDataFrame(pdf), id_col="doc_id",
        salt_threshold=50,
    ).save(spark, path, buckets=4)

    victims = [int(d) for d in pdf["doc_id"][:3]]
    from siem_on_amazon_opensearch_service_spark.index.tombstones import (
        delete_docs,
    )

    delete_docs(spark, path, victims)

    cix = compact(spark, path, path, salt_threshold=50)
    assert not os.path.isdir(path + ".compacting")
    assert load_tombstones(spark, path).count() == 0

    survivors = {int(r["doc_id"]) for r in cix.docs.select("doc_id").collect()}
    assert survivors == set(int(d) for d in pdf["doc_id"]) - set(victims)

    oracle = _oracle_for(pdf, set(victims))
    exp = oracle.search(QUERY, K)
    from siem_on_amazon_opensearch_service_spark.index import bm25_topk

    got = bm25_topk(cix, QUERY, k=K).collect()
    assert [int(r["doc_id"]) for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert math.isclose(r["score"], s, rel_tol=1e-9, abs_tol=1e-9)

    # and a RELOAD from disk (fresh lineage) agrees -- the swap really
    # landed on disk, not just in the returned handle.
    reloaded = PostingsIndex.load(spark, path)
    got2 = bm25_topk(reloaded, QUERY, k=K).collect()
    assert [(r["doc_id"], r["score"]) for r in got2] == [
        (r["doc_id"], r["score"]) for r in got
    ]
