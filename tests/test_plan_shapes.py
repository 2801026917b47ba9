"""Physical-plan regression guards: the optimizations the engine
depends on must stay visible in `.explain` — term pushdown at the
postings scan, broadcast-only dimension joins, TakeOrdered top-k
(never a global sort), single-exchange scoring."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex, bm25_topk, build_index,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def saved_ix(spark, tmp_path_factory):
    pdf = corpus.make_pages_pdf(300, seed=31)
    pdf.insert(0, "doc_id", range(len(pdf)))
    built = build_index(spark, spark.createDataFrame(pdf),
                        id_col="doc_id", salt_threshold=60)
    path = str(tmp_path_factory.mktemp("planix"))
    built.save(spark, path, buckets=4)
    return PostingsIndex.load(spark, path)


def test_topk_plan_is_pushed_broadcast_free_takeordered(saved_ix):
    plan = _plan(bm25_topk(saved_ix, "w00001 w00057", k=10))
    # term filter reaches the parquet scan (row-group pruning)
    assert "PushedFilters" in plan and "In(term" in plan
    # join-free scoring: exactly one exchange, TakeOrdered at the top
    assert "TakeOrderedAndProject" in plan
    # one Exchange NODE (formatted output mentions each node twice:
    # tree + detail section, so count the detail headers)
    assert plan.count(") Exchange") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "Sort " not in plan        # no global sort node


def test_prefix_scan_pushes_startswith(saved_ix):
    from siem_on_amazon_opensearch_service_spark.index.boolquery import (
        multiterm_topk,
    )

    plan = _plan(multiterm_topk(saved_ix, "w000%", k=10))
    assert "StringStartsWith(term,w000)" in plan.replace(" ", "").replace(
        "'", ""
    ) or "StringStartsWith" in plan


def test_bucketed_postings_agg_is_shuffle_free(spark, saved_ix):
    """save_bucketed: per-term aggregation over the term-bucketed
    table must plan with ZERO exchanges (the co-located layout claim —
    Iceberg bucket(term, B) equivalent)."""
    spark.sql("DROP TABLE IF EXISTS _test_postings_bucketed")
    saved_ix.save_bucketed(spark, "_test_postings_bucketed", buckets=4)
    t = spark.table("_test_postings_bucketed")
    plan = _plan(t.groupBy("term").agg(F.sum("doc_count").alias("df")))
    assert plan.count(") Exchange") == 0
    assert "Bucketed: true" in plan
    # and the data round-trips
    df1 = {r["term"]: r["df"] for r in
           t.groupBy("term").agg(F.sum("doc_count").alias("df")).collect()}
    df2 = {r["term"]: r["df"] for r in saved_ix.term_stats.select("term", "df").collect()}
    assert df1 == df2
    spark.sql("DROP TABLE _test_postings_bucketed")


def test_dim_join_broadcasts(spark):
    sf = "/root/testdata/sf0.01"
    o = spark.read.parquet(f"{sf}/orders.parquet")
    c = spark.read.parquet(f"{sf}/customer.parquet")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).groupBy(
        "c_mktsegment"
    ).count()
    plan = _plan(joined)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scan_prunes_columns(spark):
    sf = "/root/testdata/sf0.01"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 30).select("l_orderkey")
    plan = _plan(q)
    # only the needed columns reach the scan; the filter is pushed
    assert "ReadSchema: struct<l_orderkey" in plan
    assert "l_comment" not in plan.split("ReadSchema")[1].split("\n")[0]
    assert "GreaterThan(l_quantity" in plan


def test_multi_match_plan_single_exchange_pushed(spark, tmp_path):
    """multi_match keeps the single-field plan shape: term AND field
    predicates pushed to the postings scan, literal-map scoring with
    no joins, one exchange, TakeOrdered top-k."""
    from siem_on_amazon_opensearch_service_spark.analysis import tokens_col
    from siem_on_amazon_opensearch_service_spark.index.multifield import (
        MultiFieldIndex,
        build_multi_index,
        multi_match_topk,
    )

    pdf = corpus.make_pages_pdf(200, seed=5)
    pdf.insert(0, "doc_id", range(len(pdf)))
    pages = spark.createDataFrame(pdf)
    title = F.array_join(F.slice(tokens_col("text"), 1, 6), " ")
    mix = build_multi_index(
        spark, pages, {"body": "text", "title": title},
        id_col="doc_id", salt_threshold=60,
    )
    path = str(tmp_path / "mix")
    mix.save(spark, path, buckets=2)
    mix = MultiFieldIndex.load(spark, path)

    plan = _plan(
        multi_match_topk(mix, "w00001 w00057", {"body": 1.0, "title": 2.0},
                         k=10)
    )
    flat = plan.replace(" ", "")
    assert "In(term" in flat and "In(field" in flat  # both pushed
    assert "TakeOrderedAndProject" in plan
    assert plan.count(") Exchange") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


# ---------------------------------------------------------------------------
# round-3 continuation operators
# ---------------------------------------------------------------------------


def test_percolate_plan_broadcasts_rules(spark):
    from siem_on_amazon_opensearch_service_spark.operators.percolate import (
        percolate,
    )

    docs = spark.createDataFrame(
        [(0, "error timeout db"), (1, "login ok")], "doc_id long, text string")
    rules = spark.createDataFrame(
        [("r1", "error db", "and", 0)],
        "query_id string, query string, operator string, msm int")
    plan = _plan(percolate(docs, rules))
    # the rule side must be the broadcast build side; the corpus side
    # must never sort-merge against it
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_contamination_plan_broadcasts_benchmark(spark):
    from siem_on_amazon_opensearch_service_spark.operators.contamination \
        import ngram_contamination

    docs = spark.createDataFrame(
        [(i, "a b c d e f g") for i in range(10)], "doc_id long, text string")
    plan = _plan(ngram_contamination(docs, docs.limit(2), n=3))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_range_buckets_single_global_agg(spark):
    from siem_on_amazon_opensearch_service_spark.operators.aggs import (
        range_buckets,
    )

    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    plan = _plan(range_buckets(
        df, F.col("v"), [("a", None, 10.0), ("b", 10.0, None)]))
    # one partial+final global aggregate: a single-row exchange, no
    # join, no per-range scans
    assert plan.count(") Exchange") == 1
    assert "Join" not in plan


def test_sampler_plan_is_take_ordered(spark):
    from siem_on_amazon_opensearch_service_spark.operators.aggs import (
        diversified_sampler_top, sampler_top,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k"),
        (F.col("id") * 37 % 100).alias("v"))
    assert "TakeOrderedAndProject" in _plan(
        sampler_top(df, [F.desc("v"), F.asc("id")], 10))
    dplan = _plan(diversified_sampler_top(
        df, [F.desc("v"), F.asc("id")], "k", 2, 10))
    assert "TakeOrderedAndProject" in dplan
    assert "WindowGroupLimit" in dplan


def test_suggest_scoring_broadcasts_pairs(spark):
    from siem_on_amazon_opensearch_service_spark.index.suggest import (
        build_bigram_model, phrase_suggest,
    )

    sdf = spark.createDataFrame(
        [("the quick brown fox",)] * 5, "text string")
    model = build_bigram_model(sdf)
    plan = _plan(phrase_suggest(model, "the quikc", size=2))
    # candidate-pair table broadcasts against the corpus LM tables —
    # never a shuffle keyed on the corpus-sized bigram table
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_searchbody_terms_prune_never_global_window(saved_ix):
    """Top-level terms-size pruning must plan as TakeOrdered winner
    keys + broadcast LEFT-SEMI back onto the bucket rows -- an
    unpartitioned Window over every bucket would single-task a
    high-cardinality terms field at scale."""
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        run_aggs,
    )

    res = run_aggs(saved_ix.docs, {
        "by_lang": {"terms": {"field": "lang", "size": 3},
                    "aggs": {"avg_len": {"avg": {"field": "doclen"}}}},
    })
    plan = _plan(res["by_lang"])
    assert "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_searchbody_nested_prune_window_partitioned(saved_ix):
    """Nested-level pruning windows stay partitioned by the parent
    prefix -- never a global (unpartitioned) sort of the bucket set."""
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        run_aggs,
    )

    res = run_aggs(saved_ix.docs, {
        "monthly": {"date_histogram": {
            "field": "warc_ts", "calendar_interval": "month"}, "aggs": {
            "by_lang": {"terms": {"field": "lang", "size": 2}},
        }},
    })
    plan = _plan(res["monthly>by_lang"])
    import re as _re
    # the dense_rank prune must plan as WindowGroupLimit (per-parent
    # partial limit BEFORE the shuffle), partitioned by the parent key
    limits = _re.findall(
        r"WindowGroupLimit\nInput[^\n]*\nArguments: \[([^\]]*)\]", plan)
    assert limits, plan
    for part in limits:
        assert "monthly" in part, plan


def test_searchbody_query_plan_single_groupby_no_joins(saved_ix):
    """A multi-clause bool body compiles to the query_string plan
    shape: one posting-decode groupBy, term IN pushdown, TakeOrdered
    top-k, no per-clause joins."""
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_hits,
    )

    body = {"query": {"bool": {
        "must": [{"match": {"text": "w00001 w00057"}}],
        "should": [{"term": {"text": "w00003"}}],
        "must_not": [{"term": {"text": "w00099"}}],
    }}, "size": 10}
    plan = _plan(search_hits(ix=saved_ix, body=body)
                 .select("doc_id", "score"))
    assert "TakeOrderedAndProject" in plan
    assert "In(term" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # must_not is rows through the same groupBy, never an anti-join
    assert "LeftAnti" not in plan


def test_terms_set_is_codegen_predicate_no_join(spark):
    # terms_set must stay a per-row array_intersect predicate -- no
    # join against an exploded terms table, no extra exchange
    from siem_on_amazon_opensearch_service_spark.index.querystring import (
        FieldLeaf, _Compiler,
    )

    df = spark.createDataFrame(
        [(1, ["a", "b"], 2)], "doc_id long, tags array<string>, req int")
    leaf = FieldLeaf("tags", "terms_set", values=("a", "b", "c"),
                     msm_field="req")
    pred = _Compiler(F.lit(None)).field_matched(leaf)
    plan = _plan(df.filter(pred))
    assert "Join" not in plan and ") Exchange" not in plan
    assert "array_intersect" in plan


def test_has_child_single_rollup_no_cartesian(spark, saved_ix):
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_hits,
    )

    ix = saved_ix
    docs2 = (ix.docs
             .withColumn("join_name",
                         F.when(F.col("doc_id") < 50, F.lit("question"))
                         .otherwise(F.lit("answer")))
             .withColumn("join_parent",
                         F.when(F.col("doc_id") >= 50,
                                F.col("doc_id") % 50)))
    ix2 = PostingsIndex(docs=docs2, postings=ix.postings,
                        term_stats=ix.term_stats,
                        n_docs=ix.n_docs, avgdl=ix.avgdl)
    body = {"query": {"has_child": {
        "type": "answer", "query": {"match": {"text": "w00001"}},
        "score_mode": "sum", "min_children": 1}}, "size": 10}
    plan = _plan(search_hits(ix2, body))
    assert "CartesianProduct" not in plan
    # the family rollup is hash aggregation, never a window/sort over
    # children
    assert "HashAggregate" in plan
    assert "Window" not in plan


def test_wildcard_rewrites_to_pushed_term_in(saved_ix, monkeypatch):
    """Leading-wildcard leaves rewrite against the vocabulary table
    (Lucene MultiTermQuery rewrite): the POSTINGS scan must carry a
    pushed literal In(term...) — never a LIKE/RLIKE over every
    postings block — when the dictionary match set fits the cutoff."""
    from siem_on_amazon_opensearch_service_spark.index.querystring import (
        query_string_topk,
    )

    df = query_string_topk(saved_ix, "*0042*", k=5)
    plan = _plan(df)
    assert "In(term" in plan
    # overflow path: force cutoff 0 -> the predicate stays in-scan
    # (Contains/LIKE pushed instead of a literal set) with IDENTICAL
    # results
    import siem_on_amazon_opensearch_service_spark.index.querystring as qs
    rows_pruned = sorted(map(tuple, df.collect()))
    monkeypatch.setattr(qs, "MULTI_TERM_SCAN_CUTOFF", 0)
    fb = query_string_topk(saved_ix, "*0042*", k=5)
    assert "In(term" not in _plan(fb)
    assert sorted(map(tuple, fb.collect())) == rows_pruned


def test_wildcard_empty_vocab_is_jobless(saved_ix):
    from siem_on_amazon_opensearch_service_spark.index.querystring import (
        query_string_topk,
    )

    df = query_string_topk(saved_ix, "*zzzznomatch*", k=5)
    assert df.count() == 0


def test_classifier_scoring_no_corpus_rejoin(spark):
    """nb_score: ONE broadcast join vs the weight table + one groupBy,
    never a corpus-side sort-merge re-join (zero-gram docs ride the
    explode_outer sentinel)."""
    from siem_on_amazon_opensearch_service_spark.operators.classifier \
        import nb_fit, nb_score

    docs = spark.createDataFrame(
        [(0, "good text here", "en"), (1, "zzz qqq", "xx"), (2, "", "en")],
        "doc_id long, text string, lang string")
    model = nb_fit(
        docs.withColumn("label", (F.col("lang") == "en").cast("int")),
        n_buckets=64)
    plan = _plan(nb_score(docs, model))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_combined_fields_plan_pushed_no_cartesian(spark, tmp_path):
    """combined_fields: term+field predicates pushed at the postings
    scan; the norms join is a hash join on doc_id (never cartesian,
    never a global sort); TakeOrdered top-k."""
    from siem_on_amazon_opensearch_service_spark.analysis import tokens_col
    from siem_on_amazon_opensearch_service_spark.index.multifield import (
        MultiFieldIndex,
        build_multi_index,
        combined_fields_topk,
    )

    pdf = corpus.make_pages_pdf(200, seed=5)
    pdf.insert(0, "doc_id", range(len(pdf)))
    pages = spark.createDataFrame(pdf)
    title = F.array_join(F.slice(tokens_col("text"), 1, 6), " ")
    mix = build_multi_index(
        spark, pages, {"body": "text", "title": title},
        id_col="doc_id", salt_threshold=60,
    )
    path = str(tmp_path / "cfx")
    mix.save(spark, path, buckets=2)
    mix = MultiFieldIndex.load(spark, path)

    plan = _plan(
        combined_fields_topk(mix, "w00001 w00057",
                             {"body": 1.0, "title": 2.0}, k=10)
    )
    flat = plan.replace(" ", "")
    assert "In(term" in flat and "In(field" in flat
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "Sort " not in plan  # no global sort node


def test_nested_query_plan_is_scan_only(spark, saved_ix, tmp_path):
    """The nested query is a per-row higher-order filter: the plan
    over a persisted docs table must stay a single scan -- zero
    exchanges, zero joins, no explode/Generate."""
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        _nested_scored,
    )

    docs = spark.createDataFrame(
        [(i, [{"t": "a", "v": float(i)}]) for i in range(10)],
        "doc_id long, ents array<struct<t:string,v:double>>")
    p = str(tmp_path / "nd")
    docs.write.parquet(p)
    ix = PostingsIndex(docs=spark.read.parquet(p),
                       postings=saved_ix.postings,
                       term_stats=saved_ix.term_stats,
                       n_docs=10, avgdl=1.0)
    df = _nested_scored(
        ix, {"path": "ents",
             "query": {"bool": {"must": [
                 {"term": {"ents.t": "a"}},
                 {"range": {"ents.v": {"gte": 2}}}]}},
             "score_mode": "sum"}, "text")
    plan = _plan(df)
    assert plan.count(") Exchange") == 0
    assert ") Generate" not in plan       # no explode
    assert "Join" not in plan


def test_search_body_shares_one_execution_for_hits_and_aggs(saved_ix):
    # hits + aggs + totals must ride ONE executed matched frame: the
    # hits page and the agg frame both read the persisted cache
    # (InMemoryTableScan), never a second postings decode
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_body,
    )

    body = {"query": {"match": {"text": "w00001"}}, "size": 5,
            "aggs": {"l": {"terms": {"field": "doclen", "size": 3}}},
            "track_total_hits": True}
    res = search_body(saved_ix, body)
    hp = _plan(res["hits"])
    ap = _plan(res["aggs"]["l"])
    assert "InMemoryTableScan" in hp, hp
    assert "InMemoryTableScan" in ap, ap
    # and results stay correct through the cache: the page is exactly
    # min(total, size) rows
    assert res["hits"].count() == min(res["total"]["value"], 5)
    # (an aggs-free body with the SAME query also picks the cache up
    # via Spark's logical-plan cache manager — a bonus, not pinned)


def test_search_body_release_frees_the_shared_cache(saved_ix):
    # the response carries an explicit lifecycle handle (mirroring
    # MSearchResponse.release): after release() the persisted matched
    # frame is gone from the cache manager, not just unreferenced
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_body,
    )

    body = {"query": {"match": {"text": "w00001"}}, "size": 5,
            "aggs": {"l": {"terms": {"field": "doclen", "size": 3}}}}
    res = search_body(saved_ix, body)
    assert res.shared is not None
    assert res.shared.storageLevel.useMemory  # persisted right now
    res["hits"].count()  # materialize through the cache
    res.release()
    assert res.shared is None
    # idempotent; plain-dict consumers keep working untouched
    res.release()
    assert set(res) >= {"hits", "aggs"}


def test_search_body_without_aggs_has_no_shared_cache(saved_ix):
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_body,
    )

    res = search_body(saved_ix,
                      {"query": {"match": {"text": "w00001"}}, "size": 5})
    assert res.shared is None
    res.release()  # no-op, must not raise
