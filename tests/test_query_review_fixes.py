"""Regression pins for the round-4 query-path review findings:
NULL-text avgdl parity, the custom-analyzer seam on explain/batch,
left-join hit retention in function_score / collapse, and rescore's
out-of-window pass-through."""

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex,
    bm25_topk,
    build_index,
)
from siem_on_amazon_opensearch_service_spark.index.query import (
    bm25_explain,
    bm25_scores,
    bm25_topk_batch,
    bm25_topk_df,
    collapse_topk,
    explain_doc,
    function_score,
    rescore_topk,
)


@pytest.fixture(scope="module")
def ix(spark):
    rows = [(i, f"u{i:03d}", "alpha beta " + ("gamma " * (i % 4)))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    return build_index(spark, docs, id_col="doc_id", salt_threshold=50)


def test_bm25_topk_df_matches_index_path_with_null_text(spark):
    rows = [(i, "alpha beta " + ("gamma " * (i % 3))) for i in range(20)]
    rows += [(100, None), (101, None)]  # NULL-text docs skew avgdl if unguarded
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ix = build_index(spark, docs, id_col="doc_id", salt_threshold=50)
    via_ix = [(r["doc_id"], round(r["score"], 9))
              for r in bm25_topk(ix, "gamma beta", k=8).collect()]
    via_df = [(r["doc_id"], round(r["score"], 9))
              for r in bm25_topk_df(docs, "text", "doc_id",
                                    "gamma beta", k=8).collect()]
    assert via_ix == via_df


def test_explain_and_batch_honor_custom_tokenizer(spark):
    from siem_on_amazon_opensearch_service_spark.analysis_ext import (
        cjk_tokens_col, py_cjk_tokens)

    rows = [(0, "データベース検索"), (1, "分散データ処理"), (2, "検索エンジン")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cix = build_index(spark, docs, id_col="doc_id", salt_threshold=50,
                      tokenizer=cjk_tokens_col)
    hits = bm25_topk(cix, "検索", k=3, tokenizer_py=py_cjk_tokens).collect()
    assert hits, "sanity: the CJK index matches the query"
    # explain paths must see the SAME terms the index stores
    exp = bm25_explain(cix, "検索", k=3,
                       tokenizer_py=py_cjk_tokens).collect()
    assert {r["doc_id"] for r in exp} == {r["doc_id"] for r in hits}
    one = explain_doc(cix, "検索", hits[0]["doc_id"],
                      tokenizer_py=py_cjk_tokens)
    assert one["matched"] and one["score"] == pytest.approx(
        hits[0]["score"], abs=1e-9)
    # batch path with the matching Column tokenizer
    qdf = spark.createDataFrame([(1, "検索", 3)], "qid int, query string, k int")
    batch = bm25_topk_batch(cix, qdf, tokenizer=cjk_tokens_col).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in batch] == \
        [(r["doc_id"], round(r["score"], 9)) for r in hits]


def test_function_score_keeps_hits_missing_from_side_table(spark, ix):
    scored = bm25_scores(ix, "gamma")
    n_hits = scored.count()
    sparse = spark.createDataFrame([(1, 10.0)], "doc_id long, pop double")
    out = function_score(scored, sparse, "pop", modifier="none",
                         boost_mode="sum")
    assert out.count() == n_hits  # inner join would drop all but doc 1
    base = {r["doc_id"]: r["score"] for r in scored.collect()}
    got = {r["doc_id"]: r["score"] for r in out.collect()}
    assert got[1] == pytest.approx(base[1] + 10.0)
    other = next(d for d in got if d != 1)
    assert got[other] == pytest.approx(base[other])  # missing factor = 0


def test_collapse_keeps_hits_without_key_row(spark, ix):
    scored = bm25_scores(ix, "gamma")
    # keys table covers only even doc ids
    keys = spark.createDataFrame(
        [(i, f"g{i % 2}") for i in range(0, 40, 2)],
        "doc_id long, grp string")
    out = collapse_topk(scored, keys, "grp", k=10).collect()
    # one best hit per known group PLUS the NULL group's best — odd
    # ids must not silently vanish
    grps = {r["grp"] for r in out}
    assert None in grps
    assert any(r["doc_id"] % 2 == 1 for r in out)


def test_rescore_k_beyond_window_passes_through_primary_order(spark, ix):
    scored = bm25_scores(ix, "gamma")
    top = [r["doc_id"] for r in
           scored.orderBy(F.desc("score"), F.asc("doc_id")).collect()]
    # secondary scorer boosts one doc inside the window
    rs = spark.createDataFrame([(top[1], 100.0)], "doc_id long, score double")
    out = rescore_topk(scored, rs, window_size=4, k=8).collect()
    assert len(out) == 8  # not truncated to the window
    assert out[0]["doc_id"] == top[1]  # boosted doc re-ranked to #1
    # positions past the window: the next hits in primary order
    assert [r["doc_id"] for r in out[4:]] == top[4:8]
