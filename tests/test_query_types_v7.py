"""Seventh-batch query-type parity: script_score / distance_feature /
pinned / terms_set / intervals / scripted_metric / weighted_avg /
extended_stats / has_child / has_parent — each vs a pure-Python or
pandas twin computed from the oracle index."""

import math

import pandas as pd
import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py
from siem_on_amazon_opensearch_service_spark.bm25 import score_py
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex,
    build_index,
)
from siem_on_amazon_opensearch_service_spark.index.painless import (
    parse_script,
    to_column,
    to_sql,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    run_aggs,
    search_hits,
)
from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex

K = 15
N = 300
QUERY = "w00034 w00077"


@pytest.fixture(scope="module")
def pages_pdf():
    return corpus.make_pages_pdf(N, seed=23)


@pytest.fixture(scope="module")
def ix(spark, pages_pdf):
    pdf = pages_pdf.copy()
    pdf.insert(0, "doc_id", range(len(pdf)))
    built = build_index(spark, spark.createDataFrame(pdf),
                        id_col="doc_id", salt_threshold=60)
    built.postings = built.postings.persist()
    built.term_stats = built.term_stats.persist()
    built.docs = built.docs.persist()
    return built


@pytest.fixture(scope="module")
def oracle(pages_pdf):
    return OracleIndex.build(
        {i: t for i, t in enumerate(pages_pdf["text"])})


@pytest.fixture(scope="module")
def doclen(oracle):
    return dict(oracle.doclen)


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _assert_rank_identical(got, expected):
    assert expected, "oracle expectation is empty -- bad test query"
    assert len(got) == len(expected), (got, expected)
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gd == ed, (got, expected)
        assert math.isclose(gs, es, rel_tol=1e-9, abs_tol=1e-9)


def _clause_scores(oracle, query):
    scores = {}
    for term in tokenize_py(query):
        plist = oracle.postings.get(term, {})
        dfv = len(plist)
        for d, tf in plist.items():
            scores[d] = scores.get(d, 0.0) + score_py(
                tf, oracle.doclen[d], oracle.avgdl, oracle.n_docs, dfv)
    return scores


def _topk(scores, k=K):
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


# ---------------------------------------------------------------------------
# painless expression compiler
# ---------------------------------------------------------------------------


def test_painless_parse_and_sql_roundtrip():
    src = ("_score * 2 + Math.log(doc['doclen'].value + 1) "
           "- saturation(doc['doclen'].value, 10)")
    ast = parse_script(src)
    # the SQL backend agrees with a hand computation via DuckDB
    import duckdb
    sql = to_sql(ast, {"_score": "3.0"})
    got = duckdb.sql(
        f"SELECT {sql} AS v FROM (SELECT 40 AS doclen)").fetchone()[0]
    want = 3.0 * 2 + math.log(41) - 40 / (40 + 10)
    assert math.isclose(got, want, rel_tol=1e-12)


@pytest.mark.parametrize("bad", [
    "for (x in y) { }",
    "state.t = 1; state.t",
    "doc['f'].values",
    "Math.tanh(2)",
    "_score +",
])
def test_painless_rejects_out_of_subset(bad):
    with pytest.raises(ValueError):
        parse_script(bad)


def test_painless_rejects_unbound_params():
    # params.<var> parses (bucket_script binds it) but an unbound
    # reference must fail at compile, both backends
    ast = parse_script("params.factor * 2")
    with pytest.raises(ValueError):
        to_column(ast)
    with pytest.raises(ValueError):
        to_sql(ast)


# ---------------------------------------------------------------------------
# script_score
# ---------------------------------------------------------------------------


def test_script_score_matches_python(ix, oracle, doclen):
    body = {
        "query": {"script_score": {
            "query": {"match": {"text": QUERY}},
            "script": {"source":
                       "_score * 1.5 + doc['doclen'].value / 100"},
        }},
        "size": K,
    }
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    base = _clause_scores(oracle, QUERY)
    rescored = {d: s * 1.5 + doclen[d] / 100 for d, s in base.items()}
    _assert_rank_identical(got, _topk(rescored))


def test_script_score_min_score_gates(ix, oracle, doclen):
    base = _clause_scores(oracle, QUERY)
    rescored = {d: s * 2 for d, s in base.items()}
    cut = sorted(rescored.values())[len(rescored) // 2]
    body = {
        "query": {"script_score": {
            "query": {"match": {"text": QUERY}},
            "script": {"source": "_score * 2"},
            "min_score": cut,
        }},
        "size": 1000,
    }
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    keep = {d: s for d, s in rescored.items() if s >= cut}
    _assert_rank_identical(got, _topk(keep, k=1000))


def test_script_score_rejects_bad_script_at_compile(ix):
    body = {"query": {"script_score": {
        "query": {"match_all": {}},
        "script": {"source": "params.x * 2"},
    }}}
    with pytest.raises(ValueError):
        search_hits(ix, body)


# ---------------------------------------------------------------------------
# distance_feature
# ---------------------------------------------------------------------------


def test_distance_feature_numeric(ix, oracle, doclen):
    origin, pivot, boost = 40.0, 10.0, 2.5
    body = {
        "query": {"bool": {
            "must": [{"match": {"text": QUERY}}],
            "should": [{"distance_feature": {
                "field": "doclen", "origin": origin, "pivot": pivot,
                "boost": boost}}],
        }},
        "size": K,
    }
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    base = _clause_scores(oracle, QUERY)
    want = {
        d: s + boost * pivot / (pivot + abs(doclen[d] - origin))
        for d, s in base.items()
    }
    _assert_rank_identical(got, _topk(want))


def test_distance_feature_date(ix, pages_pdf, oracle):
    # recency boost over warc_ts: the flagship "fresher pages first"
    origin = "2024-06-01 00:00:00"
    body = {
        "query": {"distance_feature": {
            "field": "warc_ts", "origin": origin, "pivot": "7d"}},
        "size": 25,
    }
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    ts = pages_pdf["warc_ts"]
    o = pd.Timestamp(origin, tz=getattr(ts.dt, "tz", None))
    pv = 7 * 86400.0
    want = {
        i: pv / (pv + abs((ts[i] - o).total_seconds()))
        for i in range(N)
    }
    _assert_rank_identical(got, _topk(want, k=25))


# ---------------------------------------------------------------------------
# pinned
# ---------------------------------------------------------------------------


def test_pinned_ids_rank_first_in_order(ix, oracle):
    organic = _topk(_clause_scores(oracle, QUERY), k=K)
    organic_ids = [d for d, _ in organic]
    # pin two docs that are NOT organic top hits, plus one that is
    pins = [organic_ids[-1] + 101, organic_ids[-1] + 57, organic_ids[0]]
    pins = [p % N for p in pins]
    body = {
        "query": {"pinned": {
            "ids": [str(p) for p in pins],
            "organic": {"match": {"text": QUERY}},
        }},
        "size": K,
    }
    got = [d for d, _ in
           _rows(search_hits(ix, body).select("doc_id", "score"))]
    assert got[:3] == pins
    # organic tail keeps BM25 order, minus any pinned dup
    tail = [d for d in organic_ids if d not in pins]
    assert got[3:] == tail[:K - 3]


# ---------------------------------------------------------------------------
# terms_set
# ---------------------------------------------------------------------------


def test_terms_set_msm_field(spark, pages_pdf):
    pdf = pages_pdf.copy()
    pdf.insert(0, "doc_id", range(len(pdf)))
    tag_pool = ["net", "auth", "db", "web", "dns"]
    pdf["tags"] = [
        [tag_pool[(i + j) % len(tag_pool)] for j in range(i % 4)]
        for i in range(len(pdf))
    ]
    pdf["required_matches"] = [(i % 3) for i in range(len(pdf))]
    built = build_index(spark, spark.createDataFrame(pdf),
                        id_col="doc_id", salt_threshold=60,
                        keep_cols=["tags", "required_matches"])
    body = {"query": {"terms_set": {"tags": {
        "terms": ["net", "db", "dns"],
        "minimum_should_match_field": "required_matches",
    }}}, "size": N}
    got = sorted(
        r["doc_id"]
        for r in search_hits(built, body).select("doc_id").collect())
    want = sorted(
        int(r.doc_id) for _, r in pdf.iterrows()
        if r.required_matches >= 1
        and len(set(r.tags) & {"net", "db", "dns"}) >= r.required_matches
    )
    assert want, "vacuous terms_set expectation"
    assert got == want


def test_terms_set_constant_msm(spark, pages_pdf):
    pdf = pages_pdf.head(60).copy()
    pdf.insert(0, "doc_id", range(len(pdf)))
    pdf["tags"] = [["a", "b"] if i % 2 else ["a"] for i in range(60)]
    built = build_index(spark, spark.createDataFrame(pdf),
                        id_col="doc_id", salt_threshold=60,
                        keep_cols=["tags"])
    body = {"query": {"terms_set": {"tags": {
        "terms": ["a", "b"], "minimum_should_match": 2}}}, "size": 60}
    got = sorted(r["doc_id"]
                 for r in search_hits(built, body).collect())
    assert got == [i for i in range(60) if i % 2]


# ---------------------------------------------------------------------------
# intervals
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pos_ix(spark, pages_pdf):
    from siem_on_amazon_opensearch_service_spark.index.positional import (
        build_positional_index,
    )
    pdf = pages_pdf.copy()
    pdf.insert(0, "doc_id", range(len(pdf)))
    pix = build_positional_index(spark, spark.createDataFrame(pdf),
                                 id_col="doc_id", salt_threshold=60)
    pix.postings = pix.postings.persist()
    pix.term_stats = pix.term_stats.persist()
    return pix


def test_intervals_match_equals_span_near(ix, pos_ix):
    iv_body = {"query": {"intervals": {"text": {"match": {
        "query": QUERY, "max_gaps": 3, "ordered": True}}}}, "size": K}
    sp_body = {"query": {"span_near": {
        "clauses": [{"span_term": {"text": t}}
                    for t in tokenize_py(QUERY)],
        "slop": 3, "in_order": True}}, "size": K}
    got = _rows(search_hits(ix, iv_body, positional_ix=pos_ix)
                .select("doc_id", "score"))
    want = _rows(search_hits(ix, sp_body, positional_ix=pos_ix)
                 .select("doc_id", "score"))
    assert want, "span expectation empty -- bad test terms"
    _assert_rank_identical(got, want)


def test_intervals_any_of_prefix_expansion(ix, pos_ix, oracle):
    # prefix w0003 expands over the vocabulary; any_of unions it with
    # a single-term match
    iv_body = {"query": {"intervals": {"text": {"any_of": {
        "intervals": [{"prefix": {"prefix": "w0003"}},
                      {"match": {"query": "w00077"}}],
    }}}}, "size": 2 * N}
    got = {d for d, _ in
           _rows(search_hits(ix, iv_body, positional_ix=pos_ix)
                 .select("doc_id", "score"))}
    vocab = [t for t in oracle.postings if t.startswith("w0003")]
    assert vocab, "prefix expands to nothing -- bad test prefix"
    want = set()
    for t in vocab + ["w00077"]:
        want |= set(oracle.postings.get(t, {}))
    assert got == want


def test_intervals_unmatched_prefix_is_match_none(ix, pos_ix):
    iv_body = {"query": {"intervals": {"text": {"prefix": {
        "prefix": "zzzzzz"}}}}, "size": 10}
    assert search_hits(ix, iv_body, positional_ix=pos_ix).count() == 0


# ---------------------------------------------------------------------------
# scripted_metric / weighted_avg / extended_stats
# ---------------------------------------------------------------------------


def test_scripted_metric_painless_shard_sum(ix, pages_pdf, doclen):
    aggs = {"total": {"scripted_metric": {
        "init_script": "state.t = 0",
        "map_script": "state.t += doc['doclen'].value * 2",
        "combine_script": "return state.t",
    }}}
    out = run_aggs(ix.docs, aggs)["_metrics"].collect()[0]
    want = sum(doclen[i] * 2 for i in range(N))
    assert math.isclose(out["total"], want, rel_tol=1e-9)


def test_scripted_metric_declarative_avg(ix, doclen):
    aggs = {"m": {"scripted_metric": {
        "map_expr": "doclen * doclen", "reduce": "avg"}}}
    out = run_aggs(ix.docs, aggs)["_metrics"].collect()[0]
    want = sum(v * v for v in doclen.values()) / N
    assert math.isclose(out["m"], want, rel_tol=1e-9)


def test_scripted_metric_rejects_general_painless(ix):
    aggs = {"m": {"scripted_metric": {
        "map_script": "state.t.add(doc['doclen'].value)",
    }}}
    with pytest.raises(ValueError):
        run_aggs(ix.docs, aggs)


def test_weighted_avg_and_extended_stats(ix, pages_pdf, doclen):
    # weight doclen by itself under a lang bucket; pandas twin
    aggs = {"langs": {"terms": {"field": "lang", "size": 10},
                      "aggs": {
        "w": {"weighted_avg": {"value": {"field": "doclen"},
                               "weight": {"field": "doclen"}}},
        "es": {"extended_stats": {"field": "doclen"}},
    }}}
    got = {r["langs"]: r for r in run_aggs(ix.docs, aggs)["langs"]
           .collect()}
    pdf = pages_pdf.copy()
    pdf["doclen"] = [doclen[i] for i in range(N)]
    for lang, grp in pdf.groupby("lang"):
        dl = grp["doclen"]
        assert math.isclose(got[lang]["w"],
                            (dl * dl).sum() / dl.sum(), rel_tol=1e-9)
        assert math.isclose(got[lang]["es_variance"],
                            dl.var(ddof=0), rel_tol=1e-9)
        assert math.isclose(got[lang]["es_sum_of_squares"],
                            (dl * dl).sum(), rel_tol=1e-9)


# ---------------------------------------------------------------------------
# has_child / has_parent
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def family_ix(spark, pages_pdf):
    """Join-field layout: first 60 docs are 'question' roots; the rest
    are 'answer' children attached round-robin."""
    pdf = pages_pdf.copy()
    pdf.insert(0, "doc_id", range(len(pdf)))
    n_parents = 60
    pdf["join_name"] = ["question" if i < n_parents else "answer"
                        for i in range(len(pdf))]
    pdf["join_parent"] = [
        None if i < n_parents else (i % n_parents)
        for i in range(len(pdf))
    ]
    built = build_index(spark, spark.createDataFrame(pdf),
                        id_col="doc_id", salt_threshold=60,
                        keep_cols=["join_name", "join_parent"])
    built.docs = built.docs.persist()
    return built


def test_has_child_sum_min_children(family_ix, oracle):
    body = {"query": {"has_child": {
        "type": "answer", "query": {"match": {"text": QUERY}},
        "score_mode": "sum", "min_children": 2}}, "size": 100}
    got = _rows(search_hits(family_ix, body)
                .select("doc_id", "score")
                .orderBy("doc_id"))
    base = _clause_scores(oracle, QUERY)
    fam = {}
    for d, s in base.items():
        if d >= 60:
            fam.setdefault(d % 60, []).append(s)
    want = sorted((p, sum(ss)) for p, ss in fam.items() if len(ss) >= 2)
    _assert_rank_identical(got, want)


def test_has_child_none_is_constant(family_ix, oracle):
    body = {"query": {"has_child": {
        "type": "answer", "query": {"match": {"text": QUERY}},
        "score_mode": "none"}}, "size": 100}
    rows = _rows(search_hits(family_ix, body)
                 .select("doc_id", "score"))
    base = _clause_scores(oracle, QUERY)
    want_ids = sorted({d % 60 for d in base if d >= 60})
    assert sorted(d for d, _ in rows) == want_ids
    assert all(s == 1.0 for _, s in rows)


def test_has_parent_propagates_score(family_ix, oracle):
    body = {"query": {"has_parent": {
        "parent_type": "question", "query": {"match": {"text": QUERY}},
        "score": True}}, "size": 1000}
    got = dict(_rows(search_hits(family_ix, body)
                     .select("doc_id", "score")))
    base = _clause_scores(oracle, QUERY)
    parents = {d: s for d, s in base.items() if d < 60}
    assert parents, "no parent matches -- bad test query"
    want = {c: parents[c % 60] for c in range(60, N)
            if (c % 60) in parents}
    assert set(got) == set(want)
    for c, s in want.items():
        assert math.isclose(got[c], s, rel_tol=1e-9)


# ---------------------------------------------------------------------------
# script query / wrapper / script_fields / _script sort
# ---------------------------------------------------------------------------


def test_painless_boolean_operators():
    ast = parse_script("doclen >= 40 && !(doclen > 100) || doclen == 7")
    import duckdb
    sql = to_sql(ast)
    for v, want in ((50, True), (150, False), (7, True), (10, False)):
        got = duckdb.sql(
            f"SELECT {sql} FROM (SELECT {v}::DOUBLE AS doclen)"
        ).fetchone()[0]
        assert got is want, (v, got)


def test_script_query_filter_context(ix, oracle, doclen):
    body = {"query": {"bool": {
        "must": [{"match": {"text": QUERY}}],
        "filter": [{"script": {"script": {
            "source": "doc['doclen'].value % 2 == 0 && "
                      "doc['doclen'].value >= 30"}}}],
    }}, "size": 1000}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    base = _clause_scores(oracle, QUERY)
    keep = {d: s for d, s in base.items()
            if doclen[d] % 2 == 0 and doclen[d] >= 30}
    _assert_rank_identical(got, _topk(keep, k=1000))


def test_wrapper_query_decodes(ix, oracle):
    import base64
    import json
    inner = {"match": {"text": QUERY}}
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    body = {"query": {"wrapper": {"query": b64}}, "size": K}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    _assert_rank_identical(got, _topk(_clause_scores(oracle, QUERY)))


def test_script_fields_and_script_sort(ix, oracle, doclen):
    body = {
        "query": {"match": {"text": QUERY}},
        "sort": [{"_script": {
            "type": "number",
            "script": {"source": "doc['doclen'].value % 10"},
            "order": "asc"}}],
        "script_fields": {"dl2": {"script": {
            "source": "doc['doclen'].value * 2 + _score"}}},
        "size": K,
    }
    rows = search_hits(ix, body).select("doc_id", "score", "dl2") \
        .collect()
    base = _clause_scores(oracle, QUERY)
    want_order = sorted(base, key=lambda d: (doclen[d] % 10, d))[:K]
    assert [r["doc_id"] for r in rows] == want_order
    for r in rows:
        assert math.isclose(
            r["dl2"], doclen[r["doc_id"]] * 2 + base[r["doc_id"]],
            rel_tol=1e-9)


# ---------------------------------------------------------------------------
# pipeline aggs in the body dispatcher
# ---------------------------------------------------------------------------


def test_body_pipeline_aggs_nested(ix, pages_pdf, doclen):
    aggs = {"by_lang": {"terms": {"field": "lang", "size": 10}, "aggs": {
        "hist": {"histogram": {"field": "doclen", "interval": 100},
                 "aggs": {
            "sales": {"sum": {"field": "doclen"}},
            "cs": {"cumulative_sum": {"buckets_path": "sales"}},
            "d": {"derivative": {"buckets_path": "sales"}},
            "mv": {"moving_fn": {
                "buckets_path": "sales", "window": 2,
                "script": "MovingFunctions.max(values)"}},
            "sd": {"serial_diff": {"buckets_path": "sales", "lag": 2}},
            "ratio": {"bucket_script": {
                "buckets_path": {"s": "sales", "c": "_count"},
                "script": "params.s / params.c"}},
        }},
        "avg_sales": {"avg_bucket": {"buckets_path": "hist>sales"}},
        "st": {"stats_bucket": {"buckets_path": "hist>_count"}},
    }}}
    res = run_aggs(ix.docs, aggs)
    got = {(r["by_lang"], r["hist"]): r
           for r in res["by_lang>hist"].collect()}
    sib = {r["by_lang"]: r["avg_sales"]
           for r in res["by_lang>avg_sales"].collect()}
    stt = {r["by_lang"]: r for r in res["by_lang>st"].collect()}

    pdf = pages_pdf.copy()
    pdf["doclen"] = [doclen[i] for i in range(N)]
    pdf["bucket"] = (pdf["doclen"] // 100) * 100
    grp = (pdf.groupby(["lang", "bucket"])
           .agg(n=("doclen", "size"), sales=("doclen", "sum"))
           .reset_index())
    assert got, "no buckets -- vacuous"
    for lang, sub in grp.groupby("lang"):
        sub = sub.sort_values("bucket").reset_index(drop=True)
        cs = d = None
        vals = list(sub["sales"].astype(float))
        for i, row in sub.iterrows():
            r = got[(lang, float(row["bucket"]))]
            assert r["doc_count"] == row["n"]
            assert math.isclose(r["sales"], row["sales"], rel_tol=1e-9)
            assert math.isclose(r["cs"], sum(vals[:i + 1]), rel_tol=1e-9)
            if i == 0:
                assert r["d"] is None
            else:
                assert math.isclose(r["d"], vals[i] - vals[i - 1],
                                    rel_tol=1e-9)
            assert math.isclose(r["mv"], max(vals[max(0, i - 1):i + 1]),
                                rel_tol=1e-9)
            if i < 2:
                assert r["sd"] is None
            else:
                assert math.isclose(r["sd"], vals[i] - vals[i - 2],
                                    rel_tol=1e-9)
            assert math.isclose(r["ratio"], vals[i] / row["n"],
                                rel_tol=1e-9)
        assert math.isclose(sib[lang], sum(vals) / len(vals),
                            rel_tol=1e-9)
        assert stt[lang]["st_sum"] == sub["n"].sum()
        assert stt[lang]["st_max"] == sub["n"].max()


def test_body_bucket_selector_and_sort(ix, pages_pdf, doclen):
    aggs = {"hist": {"histogram": {"field": "doclen", "interval": 50},
                     "aggs": {
        "sales": {"sum": {"field": "doclen"}},
        "keep": {"bucket_selector": {
            "buckets_path": {"c": "_count"},
            "script": "params.c >= 10"}},
        "top": {"bucket_sort": {
            "sort": [{"sales": {"order": "desc"}}], "size": 3}},
    }}}
    rows = run_aggs(ix.docs, aggs)["hist"].collect()
    pdf = pages_pdf.copy()
    pdf["doclen"] = [doclen[i] for i in range(N)]
    pdf["bucket"] = (pdf["doclen"] // 50) * 50
    grp = (pdf.groupby("bucket")
           .agg(n=("doclen", "size"), sales=("doclen", "sum"))
           .reset_index())
    grp = grp[grp["n"] >= 10].sort_values("sales", ascending=False)
    want = list(grp.head(3)["bucket"].astype(float))
    assert want, "selector filtered everything -- vacuous"
    assert sorted(r["hist"] for r in rows) == sorted(want)


def test_body_moving_percentiles(ix, pages_pdf, doclen):
    import numpy as np

    aggs = {"hist": {"histogram": {"field": "doclen", "interval": 50},
                     "aggs": {
        "pct": {"percentiles": {"field": "doclen",
                                "percents": [50, 90]}},
        "mp": {"moving_percentiles": {"buckets_path": "pct",
                                      "window": 3}},
    }}}
    rows = sorted(run_aggs(ix.docs, aggs)["hist"].collect(),
                  key=lambda r: r["hist"])
    pdf = pages_pdf.copy()
    pdf["doclen"] = [doclen[i] for i in range(N)]
    pdf["bucket"] = (pdf["doclen"] // 50) * 50
    by_bucket = {float(b): list(g["doclen"].astype(float))
                 for b, g in pdf.groupby("bucket")}
    keys = sorted(by_bucket)
    assert len(keys) >= 4, "too few buckets -- vacuous"
    assert [r["hist"] for r in rows] == keys
    for i, r in enumerate(rows):
        merged = sum((by_bucket[k]
                      for k in keys[max(0, i - 2):i + 1]), [])
        # hidden state columns never reach the response frame
        assert not [c for c in rows[0].asDict()
                    if c.startswith(("_vals_", "_mw_"))]
        for p, lbl in ((50, "mp_p50"), (90, "mp_p90")):
            want = float(np.percentile(merged, p))
            assert math.isclose(r[lbl], want, rel_tol=1e-9), (
                i, lbl, r[lbl], want)
    # omitted percents: the pipeline inherits the SIBLING's default
    # (p50 only), never emitting percents its buckets_path never
    # computed
    dflt = run_aggs(ix.docs, {"hist": {
        "histogram": {"field": "doclen", "interval": 50},
        "aggs": {"pct": {"percentiles": {"field": "doclen"}},
                 "mp": {"moving_percentiles":
                        {"buckets_path": "pct", "window": 3}}}}})
    cols = dflt["hist"].columns
    assert "mp_p50" in cols
    assert not [c for c in cols
                if c.startswith("mp_") and c != "mp_p50"]
    # bad buckets_path: must name a sibling percentiles agg
    with pytest.raises(ValueError, match="moving_percentiles"):
        run_aggs(ix.docs, {"hist": {
            "histogram": {"field": "doclen", "interval": 50},
            "aggs": {"s": {"sum": {"field": "doclen"}},
                     "mp": {"moving_percentiles":
                            {"buckets_path": "s"}}}}})


def test_percentile_ranks_and_string_stats(ix, pages_pdf, doclen):
    aggs = {"langs": {"terms": {"field": "lang", "size": 10},
                      "aggs": {
        "pr": {"percentile_ranks": {"field": "doclen",
                                    "values": [40, 60.5]}},
        "ss": {"string_stats": {"field": "url"}},
    }}}
    got = {r["langs"]: r for r in run_aggs(ix.docs, aggs)["langs"]
           .collect()}
    pdf = pages_pdf.copy()
    pdf["doclen"] = [doclen[i] for i in range(N)]
    for lang, grp in pdf.groupby("lang"):
        dl = grp["doclen"]
        assert math.isclose(got[lang]["pr_r40"],
                            100.0 * (dl <= 40).sum() / len(dl),
                            rel_tol=1e-9)
        assert math.isclose(got[lang]["pr_r60_5"],
                            100.0 * (dl <= 60.5).sum() / len(dl),
                            rel_tol=1e-9)
        ln = grp["url"].str.len()
        assert got[lang]["ss_count"] == len(grp)
        assert got[lang]["ss_min_length"] == ln.min()
        assert got[lang]["ss_max_length"] == ln.max()
        assert math.isclose(got[lang]["ss_avg_length"], ln.mean(),
                            rel_tol=1e-9)


def test_body_normalize_and_bucket_stats_pipelines(ix, pages_pdf, doclen):
    """normalize (parent) + percentiles_bucket / extended_stats_bucket
    (sibling) vs a pandas twin over the same bucket frame."""
    aggs = {"hist": {"histogram": {"field": "doclen", "interval": 100},
                     "aggs": {
        "sales": {"sum": {"field": "doclen"}},
        "pct": {"normalize": {"buckets_path": "sales",
                              "method": "percent_of_sum"}},
        "r01": {"normalize": {"buckets_path": "sales",
                              "method": "rescale_0_1"}},
        "z": {"normalize": {"buckets_path": "sales",
                            "method": "z-score"}},
        "sm": {"normalize": {"buckets_path": "_count",
                             "method": "softmax"}},
    }},
        "pb": {"percentiles_bucket": {"buckets_path": "hist>sales",
                                      "percents": [25, 50, 99.9]}},
        "es": {"extended_stats_bucket": {"buckets_path": "hist>sales"}},
    }
    res = run_aggs(ix.docs, aggs)
    got = {r["hist"]: r for r in res["hist"].collect()}

    pdf = pages_pdf.copy()
    pdf["doclen"] = [doclen[i] for i in range(N)]
    pdf["bucket"] = (pdf["doclen"] // 100) * 100
    grp = (pdf.groupby("bucket").agg(sales=("doclen", "sum"))
           .reset_index().sort_values("bucket"))
    vals = grp["sales"].astype(float)
    assert len(grp) > 2, "too few buckets -- vacuous"
    import numpy as np
    lo, hi, tot = vals.min(), vals.max(), vals.sum()
    mean, std = vals.mean(), vals.std(ddof=0)
    counts = pdf.groupby("bucket")["doclen"].size().reindex(
        grp["bucket"]).astype(float)
    sm_den = float(np.exp(counts).sum())
    for b, v, c in zip(grp["bucket"], vals, counts):
        r = got[float(b)]
        assert math.isclose(r["pct"], v / tot, rel_tol=1e-9)
        assert math.isclose(r["r01"], (v - lo) / (hi - lo), rel_tol=1e-9)
        assert math.isclose(r["z"], (v - mean) / std, rel_tol=1e-9)
        assert math.isclose(r["sm"], math.exp(c) / sm_den, rel_tol=1e-9)

    pb = res["pb"].collect()[0]
    assert math.isclose(pb["pb_p25"], float(np.percentile(vals, 25)),
                        rel_tol=1e-9)
    assert math.isclose(pb["pb_p50"], float(np.percentile(vals, 50)),
                        rel_tol=1e-9)
    assert math.isclose(pb["pb_p99_9"], float(np.percentile(vals, 99.9)),
                        rel_tol=1e-9)
    es = res["es"].collect()[0]
    assert es["es_count"] == len(vals)
    assert math.isclose(es["es_sum_of_squares"], float((vals ** 2).sum()),
                        rel_tol=1e-9)
    assert math.isclose(es["es_variance"], float(vals.var(ddof=0)),
                        rel_tol=1e-9)
    assert math.isclose(es["es_std_deviation"], std, rel_tol=1e-9)


def test_unsupported_normalize_method_raises(ix):
    aggs = {"hist": {"histogram": {"field": "doclen", "interval": 100},
                     "aggs": {"bad": {"normalize": {
                         "buckets_path": "_count",
                         "method": "rescale_minus_1_1"}}}}}
    with pytest.raises(ValueError, match="normalize method"):
        run_aggs(ix.docs, aggs)["hist"].collect()


def test_has_child_inner_hits(family_ix, oracle):
    """inner_hits on has_child: each parent carries its ranked top-k
    matching children; score_mode still aggregates ALL children."""
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_hits as _sh,
    )

    body = {"query": {"has_child": {
        "type": "answer", "query": {"match": {"text": QUERY}},
        "score_mode": "sum", "min_children": 2,
        "inner_hits": {"size": 2}}}, "size": 100}
    rows = _sh(family_ix, body).select(
        "doc_id", "score", "inner_hits").collect()
    base = _clause_scores(oracle, QUERY)
    fam = {}
    for d, s in base.items():
        if d >= 60:
            fam.setdefault(d % 60, []).append((d, s))
    assert rows, "no parents -- vacuous"
    for r in rows:
        kids = fam[r["doc_id"]]
        assert len(kids) >= 2
        assert math.isclose(r["score"], sum(s for _, s in kids),
                            rel_tol=1e-9)
        want = sorted(kids, key=lambda ds: (-ds[1], ds[0]))[:2]
        got = [(ih["doc_id"], ih["score"]) for ih in r["inner_hits"]]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (gd, gs), (ed, es) in zip(got, want):
            assert math.isclose(gs, es, rel_tol=1e-9)


def test_has_parent_inner_hits(family_ix, oracle):
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_hits as _sh,
    )

    body = {"query": {"has_parent": {
        "parent_type": "question", "query": {"match": {"text": QUERY}},
        "score": True, "inner_hits": {"name": "parent"}}},
        "size": 1000}
    rows = _sh(family_ix, body).select(
        "doc_id", "score", "parent").collect()
    base = _clause_scores(oracle, QUERY)
    assert rows, "no children -- vacuous"
    for r in rows:
        assert len(r["parent"]) == 1
        p = r["parent"][0]
        assert p["doc_id"] == r["doc_id"] % 60
        assert math.isclose(p["score"], base[p["doc_id"]], rel_tol=1e-9)
