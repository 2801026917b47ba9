"""OpenSearch _search body compiler: every DSL node type must
reproduce the corresponding engine primitive / pure-Python oracle
exactly (same docs, scores to 1e-9), and the aggregations dispatcher
must match pandas-computed buckets."""

import math

import pandas as pd
import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py
from siem_on_amazon_opensearch_service_spark.bm25 import score_py
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex,
    bm25_topk,
    build_index,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    compile_query,
    run_aggs,
    search_body,
    search_hits,
)
from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex

K = 15
N = 400


@pytest.fixture(scope="module")
def pages_pdf():
    return corpus.make_pages_pdf(N, seed=17)


@pytest.fixture(scope="module")
def ix(spark, pages_pdf, tmp_path_factory):
    pdf = pages_pdf.copy()
    pdf.insert(0, "doc_id", range(len(pdf)))
    built = build_index(spark, spark.createDataFrame(pdf),
                        id_col="doc_id", salt_threshold=60)
    path = str(tmp_path_factory.mktemp("sb_ix"))
    built.save(spark, path, buckets=4)
    return PostingsIndex.load(spark, path)


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


@pytest.fixture(scope="module")
def oracle(pages_pdf):
    return OracleIndex.build(
        {i: t for i, t in enumerate(pages_pdf["text"])})


@pytest.fixture(scope="module")
def meta(pages_pdf, oracle):
    """doc_id -> (lang, doclen) metadata for oracle-side filtering."""
    return {
        i: (pages_pdf["lang"][i], oracle.doclen[i]) for i in range(N)
    }


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _assert_rank_identical(got, expected):
    # guard against vacuous green: every comparison in this suite is
    # built over terms that DO occur in the corpus
    assert expected, "oracle expectation is empty -- bad test query"
    assert len(got) == len(expected), (got, expected)
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gd == ed, (got, expected)
        assert math.isclose(gs, es, rel_tol=1e-9, abs_tol=1e-9)


def _clause_scores(oracle, query):
    """oracle per-doc OR-sum BM25 for a match clause."""
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


QUERY = "w00034 w00077"


def test_match_equals_bm25(ix, oracle):
    body = {"query": {"match": {"text": QUERY}}, "size": K}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    _assert_rank_identical(got, oracle.search(QUERY, k=K))
    # and the engine's own top-k path agrees
    eng = _rows(bm25_topk(ix, QUERY, k=K))
    _assert_rank_identical(got, eng)


def test_match_operator_and(ix, oracle):
    body = {"query": {"match": {
        "text": {"query": QUERY, "operator": "and"}}}, "size": K}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    scores = _clause_scores(oracle, QUERY)
    terms = tokenize_py(QUERY)
    both = {d: s for d, s in scores.items()
            if all(d in oracle.postings.get(t, {}) for t in terms)}
    _assert_rank_identical(got, _topk(both))


def test_bool_must_filter_must_not(ix, oracle, meta):
    body = {
        "query": {"bool": {
            "must": [{"match": {"text": QUERY}}],
            "filter": [{"range": {"doclen": {"gte": 40}}}],
            "must_not": [{"term": {"lang": "de"}}],
        }},
        "size": K,
    }
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    scores = {
        d: s for d, s in _clause_scores(oracle, QUERY).items()
        if meta[d][1] >= 40 and meta[d][0] != "de"
    }
    _assert_rank_identical(got, _topk(scores))


def test_minimum_should_match(ix, oracle):
    q3 = "w00034 w00077 w00150"
    body = {"query": {"bool": {
        "should": [{"term": {"text": t}} for t in tokenize_py(q3)],
        "minimum_should_match": 2,
    }}, "size": K}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    scores = _clause_scores(oracle, q3)
    keep = {
        d: s for d, s in scores.items()
        if sum(d in oracle.postings.get(t, {})
               for t in tokenize_py(q3)) >= 2
    }
    _assert_rank_identical(got, _topk(keep))


def test_dis_max_tie_breaker(ix, oracle):
    qa, qb = "w00034", "w00077"
    body = {"query": {"dis_max": {
        "queries": [{"match": {"text": qa}}, {"match": {"text": qb}}],
        "tie_breaker": 0.3,
    }}, "size": K}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    sa, sb = _clause_scores(oracle, qa), _clause_scores(oracle, qb)
    exp = {}
    for d in set(sa) | set(sb):
        xs = [sa.get(d, 0.0), sb.get(d, 0.0)]
        exp[d] = max(xs) + 0.3 * (sum(xs) - max(xs))
    _assert_rank_identical(got, _topk(exp))


def test_constant_score_terms(ix, meta):
    body = {"query": {"constant_score": {
        "filter": {"terms": {"lang": ["de", "ja"]}},
        "boost": 2.5,
    }}, "size": N}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    exp_ids = sorted(d for d, (lang, _) in meta.items()
                     if lang in ("de", "ja"))
    assert [d for d, _ in got] == exp_ids
    assert all(math.isclose(s, 2.5) for _, s in got)


def test_boosting_query(ix, oracle, meta):
    body = {"query": {"boosting": {
        "positive": {"match": {"text": QUERY}},
        "negative": {"term": {"lang": "de"}},
        "negative_boost": 0.2,
    }}, "size": K}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    scores = {
        d: s * (0.2 if meta[d][0] == "de" else 1.0)
        for d, s in _clause_scores(oracle, QUERY).items()
    }
    _assert_rank_identical(got, _topk(scores))


def test_ids_and_match_none(ix):
    got = _rows(search_hits(
        ix, {"query": {"ids": {"values": [3, 7, 11]}}, "size": 10}
    ).select("doc_id", "score"))
    assert [d for d, _ in got] == [3, 7, 11]
    assert search_hits(ix, {"query": {"match_none": {}}}).count() == 0


def test_match_phrase_body(ix, pos_ix, oracle, pages_pdf):
    from siem_on_amazon_opensearch_service_spark.index.positional import (
        phrase_topk,
    )

    phrase = "w00000 w00001"
    body = {"query": {"match_phrase": {"text": phrase}}, "size": K}
    got = _rows(search_hits(ix, body, positional_ix=pos_ix)
                .select("doc_id", "score"))
    exp = [(r["doc_id"], r["score"])
           for r in phrase_topk(pos_ix, phrase, k=K).collect()]
    _assert_rank_identical(got, exp)


def test_from_size_paging(ix, oracle):
    full = oracle.search(QUERY, k=20)
    body = {"query": {"match": {"text": QUERY}}, "from": 5, "size": 5}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    _assert_rank_identical(got, full[5:10])


def test_sort_and_source(ix, pages_pdf):
    body = {
        "query": {"term": {"lang": "en"}},
        "sort": [{"doclen": {"order": "desc"}}],
        "size": 8,
        "_source": ["url", "doclen"],
    }
    out = search_hits(ix, body)
    assert set(out.columns) == {"doc_id", "url", "doclen", "score"}
    rows = out.collect()
    lens = [r["doclen"] for r in rows]
    assert lens == sorted(lens, reverse=True)
    en = pages_pdf[pages_pdf["lang"] == "en"]
    assert len(rows) == min(8, len(en))


def test_query_string_inside_body(ix, oracle, meta):
    body = {"query": {"query_string": {
        "query": "w00034 AND lang:en"}}, "size": K}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    scores = {d: s for d, s in _clause_scores(oracle, "w00034").items()
              if meta[d][0] == "en"}
    _assert_rank_identical(got, _topk(scores))


# ---------------------------------------------------------------------------
# aggregations
# ---------------------------------------------------------------------------


def _docs_pdf(ix):
    return ix.docs.toPandas()


def test_terms_agg_with_metrics(ix):
    res = run_aggs(ix.docs, {
        "by_lang": {"terms": {"field": "lang", "size": 3},
                    "aggs": {"avg_len": {"avg": {"field": "doclen"}},
                             "max_len": {"max": {"field": "doclen"}}}},
    })
    got = res["by_lang"].toPandas().set_index("by_lang").sort_index()
    pdf = _docs_pdf(ix)
    grp = pdf.groupby("lang").agg(
        doc_count=("doclen", "size"), avg_len=("doclen", "mean"),
        max_len=("doclen", "max"))
    exp = grp.sort_values(
        ["doc_count"], ascending=False,
        kind="mergesort").head(3).sort_index()
    assert list(got.index) == list(exp.index)
    assert (got["doc_count"] == exp["doc_count"]).all()
    assert (abs(got["avg_len"] - exp["avg_len"]) < 1e-9).all()


def test_nested_terms_date_histogram(ix):
    res = run_aggs(ix.docs, {
        "by_lang": {"terms": {"field": "lang", "size": 2}, "aggs": {
            "monthly": {"date_histogram": {"field": "warc_ts",
                                           "calendar_interval": "month"},
                        "aggs": {"sum_len": {"sum": {"field": "doclen"}}}},
        }},
    })
    got = res["by_lang>monthly"].toPandas()
    assert set(got.columns) == {"by_lang", "monthly", "doc_count",
                                "sum_len"}
    pdf = _docs_pdf(ix)
    top2 = pdf.groupby("lang").size().sort_values(
        ascending=False, kind="mergesort")
    top2 = sorted(top2.index[:2])
    # terms pruning keeps exactly the two biggest langs
    assert sorted(got["by_lang"].unique()) == top2
    sub = pdf[pdf["lang"].isin(top2)].copy()
    sub["monthly"] = pd.to_datetime(
        sub["warc_ts"]).dt.to_period("M").dt.start_time
    exp = (sub.groupby(["lang", "monthly"])
           .agg(doc_count=("doclen", "size"), sum_len=("doclen", "sum"))
           .reset_index())
    merged = got.merge(exp, left_on=["by_lang", "monthly"],
                       right_on=["lang", "monthly"], how="outer")
    assert not merged.isna().any().any()
    assert (merged["doc_count_x"] == merged["doc_count_y"]).all()
    assert (abs(merged["sum_len_x"] - merged["sum_len_y"]) < 1e-9).all()


def test_range_and_filters_aggs(ix):
    res = run_aggs(ix.docs, {
        "len_bands": {"range": {"field": "doclen", "ranges": [
            {"key": "short", "to": 50},
            {"key": "mid", "from": 30, "to": 80},   # overlaps 'short'
            {"key": "long", "from": 80},
        ]}},
        "kinds": {"filters": {"filters": {
            "english": {"term": {"lang": "en"}},
            "big": {"range": {"doclen": {"gte": 60}}},
        }}},
        # string arms: the dashboards' stored-query form
        # (guardduty.ndjson visState filters)
        "kinds_qs": {"filters": {"filters": {
            "english": "lang:en",
            "big": "doclen:>=60",
        }}},
    })
    pdf = _docs_pdf(ix)
    bands = dict(res["len_bands"].toPandas()[
        ["len_bands", "doc_count"]].values)
    assert bands["short"] == int((pdf["doclen"] < 50).sum())
    assert bands["mid"] == int(
        ((pdf["doclen"] >= 30) & (pdf["doclen"] < 80)).sum())
    assert bands["long"] == int((pdf["doclen"] >= 80).sum())
    kinds = dict(res["kinds"].toPandas()[["kinds", "doc_count"]].values)
    assert kinds["english"] == int((pdf["lang"] == "en").sum())
    assert kinds["big"] == int((pdf["doclen"] >= 60).sum())
    qs = dict(res["kinds_qs"].toPandas()[["kinds_qs", "doc_count"]].values)
    assert qs == kinds


def test_root_metrics_and_cardinality(ix):
    res = run_aggs(ix.docs, {
        "n_langs": {"cardinality": {"field": "lang"}},
        "len_stats": {"stats": {"field": "doclen"}},
        "p50": {"percentiles": {"field": "doclen", "percents": [50]}},
    })
    row = res["_metrics"].collect()[0]
    pdf = _docs_pdf(ix)
    assert row["n_langs"] == pdf["lang"].nunique()
    assert row["len_stats_count"] == len(pdf)
    assert math.isclose(row["len_stats_avg"], pdf["doclen"].mean())
    assert math.isclose(row["p50_p50"],
                        pdf["doclen"].quantile(0.5, "linear"))
    assert row["doc_count"] == len(pdf)


def test_search_body_query_scoped_aggs(ix, oracle, meta):
    """aggs run over the matched set, not the hits page."""
    body = {
        "query": {"bool": {"filter": [
            {"range": {"doclen": {"gte": 40}}}]}},
        "size": 3,
        "aggs": {"by_lang": {"terms": {"field": "lang", "size": 100}}},
    }
    res = search_body(ix, body)
    assert res["hits"].count() == 3
    got = dict(res["aggs"]["by_lang"].toPandas()[
        ["by_lang", "doc_count"]].values)
    pdf = _docs_pdf(ix)
    exp = pdf[pdf["doclen"] >= 40]["lang"].value_counts().to_dict()
    assert got == exp


# ---------------------------------------------------------------------------
# knn / hybrid bodies
# ---------------------------------------------------------------------------

DIM = 8


@pytest.fixture(scope="module")
def vecs_pdf():
    import numpy as np

    rng = np.random.default_rng(7)
    m = rng.normal(size=(N, DIM)).astype("float32")
    return pd.DataFrame({
        "vec_id": range(N),
        "embedding": [row.tolist() for row in m],
    })


@pytest.fixture(scope="module")
def vecs(spark, vecs_pdf):
    return spark.createDataFrame(vecs_pdf).persist()


def _np_cosine(vecs_pdf, q):
    import numpy as np

    m = pd.DataFrame(vecs_pdf["embedding"].tolist()).values
    q = np.asarray(q)
    sims = (m @ q) / (
        (m * m).sum(axis=1) ** 0.5 * (q @ q) ** 0.5)
    return {i: float(s) for i, s in zip(vecs_pdf["vec_id"], sims)}


def test_knn_body(ix, vecs, vecs_pdf):
    q = vecs_pdf["embedding"][0]
    body = {"query": {"knn": {"embedding": {"vector": q, "k": 7}}}}
    got = [r["doc_id"] for r in
           search_hits(ix, body, vecs=vecs).collect()]
    sims = _np_cosine(vecs_pdf, q)
    exp = [d for d, _ in sorted(
        sims.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))][:7]
    assert got == exp


def test_knn_body_prefiltered(ix, vecs, vecs_pdf, meta):
    q = vecs_pdf["embedding"][1]
    body = {"query": {"knn": {"embedding": {
        "vector": q, "k": 5, "filter": {"term": {"lang": "en"}}}}}}
    got = [r["doc_id"] for r in
           search_hits(ix, body, vecs=vecs).collect()]
    sims = {d: s for d, s in _np_cosine(vecs_pdf, q).items()
            if meta[d][0] == "en"}
    exp = [d for d, _ in sorted(
        sims.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))][:5]
    assert got == exp


def test_hybrid_body_matches_hybrid_topk(ix, vecs, vecs_pdf):
    from siem_on_amazon_opensearch_service_spark.operators.hybrid import (
        hybrid_topk,
    )

    q = vecs_pdf["embedding"][2]
    body = {"query": {"hybrid": {
        "queries": [{"match": {"text": QUERY}},
                    {"knn": {"embedding": {"vector": q, "k": 50}}}],
        "pagination_depth": 50,
    }}, "size": 10}
    got = [(r["doc_id"], round(r["score"], 9)) for r in
           search_hits(ix, body, vecs=vecs)
           .select("doc_id", "score").collect()]
    exp = [(r["doc_id"], round(r["rrf_score"], 9)) for r in
           hybrid_topk(ix, vecs, QUERY, list(q), k=10,
                       depth=50).collect()]
    assert got == exp


def test_post_filter_hits_only(ix):
    body = {
        "query": {"bool": {"filter": [
            {"range": {"doclen": {"gte": 40}}}]}},
        "post_filter": {"term": {"lang": "de"}},
        "size": 500,
        "aggs": {"by_lang": {"terms": {"field": "lang", "size": 100}}},
    }
    res = search_body(ix, body)
    hits = res["hits"].collect()
    pdf = _docs_pdf(ix)
    exp_hits = int(((pdf["doclen"] >= 40) & (pdf["lang"] == "de")).sum())
    assert len(hits) == exp_hits
    assert all(r["lang"] == "de" for r in hits)
    # aggs are NOT post-filtered: every lang still present
    langs = set(res["aggs"]["by_lang"].toPandas()["by_lang"])
    assert langs == set(pdf[pdf["doclen"] >= 40]["lang"].unique())


def test_highlight_fragment(ix, spark, pages_pdf):
    src = spark.createDataFrame(
        pages_pdf.assign(doc_id=range(N))[["doc_id", "text"]])
    body = {
        "query": {"match": {"text": QUERY}},
        "size": 5,
        "highlight": {"fields": {"text": {"fragment_size": 80}}},
    }
    rows = search_hits(ix, body, source_docs=src).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["highlight"] is not None
        assert "<em>" in r["highlight"] and "</em>" in r["highlight"]
        inner = r["highlight"].split("<em>")[1].split("</em>")[0].lower()
        assert inner in tokenize_py(QUERY)


def test_top_hits_subagg(ix):
    res = run_aggs(ix.docs.withColumn("score", F_lit0()), {
        "by_lang": {"terms": {"field": "lang", "size": 2}, "aggs": {
            "longest": {"top_hits": {
                "size": 2, "sort": [{"doclen": {"order": "desc"}}]}},
        }},
    })
    got = res["by_lang>longest"].toPandas()
    pdf = _docs_pdf(ix)
    top2 = pdf.groupby("lang").size().sort_values(
        ascending=False, kind="mergesort")
    top2 = sorted(top2.index[:2])
    assert sorted(got["by_lang"].unique()) == top2
    for lang in top2:
        sub = pdf[pdf["lang"] == lang].sort_values(
            ["doclen", "doc_id"], ascending=[False, True])
        exp_ids = list(sub["doc_id"][:2])
        got_ids = list(got[got["by_lang"] == lang]
                       .sort_values("_rn")["doc_id"])
        assert got_ids == exp_ids, (lang, got_ids, exp_ids)


def F_lit0():
    from pyspark.sql import functions as F

    return F.lit(0.0)


def test_significant_terms_body(ix):
    body = {
        "query": {"match": {"text": "w00077"}},
        "size": 1,
        "aggs": {"sig_lang": {"significant_terms": {
            "field": "lang", "size": 5}}},
    }
    res = search_body(ix, body)
    got = res["aggs"]["sig_lang"].toPandas()
    pdf = _docs_pdf(ix)
    # recompute JLH in pandas
    import numpy as np

    matched = set(
        r["doc_id"] for r in search_hits(
            ix, {"query": {"match": {"text": "w00077"}}, "size": N}
        ).collect())
    fg = pdf[pdf["doc_id"].isin(matched)]
    fg_total, bg_total = len(fg), len(pdf)
    rows = []
    for lang, bg_count in pdf["lang"].value_counts().items():
        fg_count = int((fg["lang"] == lang).sum())
        fgp, bgp = fg_count / fg_total, bg_count / bg_total
        if fg_count >= 1 and fgp > bgp:
            rows.append((lang, (fgp - bgp) * (fgp / bgp)))
    rows.sort(key=lambda kv: (-kv[1], kv[0]))
    assert list(got["key"]) == [k for k, _ in rows[:5]]
    for (k, s), gs in zip(rows[:5], got["score"]):
        assert math.isclose(s, gs, rel_tol=1e-9)


def test_terms_order_and_missing(ix, spark):
    pdf = _docs_pdf(ix)
    docs = ix.docs
    # order by _key desc
    res = run_aggs(docs, {
        "by_lang": {"terms": {"field": "lang", "size": 2,
                              "order": {"_key": "desc"}}},
    })
    got = sorted(res["by_lang"].toPandas()["by_lang"])
    exp = sorted(sorted(pdf["lang"].unique(), reverse=True)[:2])
    assert got == exp
    # order by a metric at the deepest level (visState orderBy shape)
    res = run_aggs(docs, {
        "by_lang": {"terms": {"field": "lang", "size": 2,
                              "order": {"avg_len": "desc"}},
                    "aggs": {"avg_len": {"avg": {"field": "doclen"}}}},
    })
    got = set(res["by_lang"].toPandas()["by_lang"])
    exp = set(pdf.groupby("lang")["doclen"].mean()
              .sort_values(ascending=False, kind="mergesort").index[:2])
    assert got == exp
    # missing: null keys land in a named bucket
    import pandas as _pd

    pdf2 = pdf.copy()
    pdf2.loc[pdf2.index[:25], "lang"] = None
    docs2 = spark.createDataFrame(pdf2)
    res = run_aggs(docs2, {
        "by_lang": {"terms": {"field": "lang", "size": 10,
                              "missing": "N/A"}},
    })
    counts = dict(res["by_lang"].toPandas()[
        ["by_lang", "doc_count"]].values)
    assert counts["N/A"] == 25


def test_composite_pagination_with_metrics(ix):
    pdf = _docs_pdf(ix)
    spec = {"comp": {"composite": {
        "size": 4,
        "sources": [{"lang": {"terms": {"field": "lang"}}},
                    {"day": {"date_histogram": {
                        "field": "warc_ts",
                        "calendar_interval": "hour"}}}],
    }, "aggs": {"max_len": {"max": {"field": "doclen"}}}}}
    page1 = run_aggs(ix.docs, spec)["comp"].toPandas()
    assert len(page1) == 4
    # exact expectation from pandas
    grp = (pdf.assign(day=pd.to_datetime(pdf["warc_ts"], utc=True)
                      .dt.floor("h"))
           .groupby(["lang", "day"])
           .agg(doc_count=("doclen", "size"), max_len=("doclen", "max"))
           .reset_index().sort_values(["lang", "day"]))
    exp1 = grp.head(4).reset_index(drop=True)
    assert list(page1.sort_values(["lang", "day"])["lang"]) == \
        list(exp1["lang"])
    assert list(page1.sort_values(["lang", "day"])["max_len"]) == \
        list(exp1["max_len"])
    # page 2 via after cursor
    last = page1.sort_values(["lang", "day"]).iloc[-1]
    spec2 = {"comp": {"composite": {
        "size": 4, "after": {"lang": last["lang"],
                             "day": str(last["day"])},
        "sources": [{"lang": {"terms": {"field": "lang"}}},
                    {"day": {"date_histogram": {
                        "field": "warc_ts",
                        "calendar_interval": "hour"}}}],
    }, "aggs": {"max_len": {"max": {"field": "doclen"}}}}}
    page2 = run_aggs(ix.docs, spec2)["comp"].toPandas()
    exp2 = grp.iloc[4:8].reset_index(drop=True)
    assert list(page2.sort_values(["lang", "day"])["doc_count"]) == \
        list(exp2["doc_count"])


def test_auto_date_histogram_body(ix):
    res = run_aggs(ix.docs, {
        "auto": {"auto_date_histogram": {"field": "warc_ts",
                                         "buckets": 8}},
    })
    got = res["auto"].toPandas()
    # the corpus spans ~4h => the rung keeping <=8 buckets is 1h
    assert 2 <= len(got) <= 8
    assert int(got["doc_count"].sum()) == N


def test_search_after_cursor(ix, oracle):
    full = oracle.search(QUERY, k=12)
    page1 = {"query": {"match": {"text": QUERY}}, "size": 4}
    r1 = _rows(search_hits(ix, page1).select("doc_id", "score"))
    _assert_rank_identical(r1, full[:4])
    cursor = [r1[-1][1], r1[-1][0]]  # (_score, doc_id)
    page2 = dict(page1, search_after=cursor)
    r2 = _rows(search_hits(ix, page2).select("doc_id", "score"))
    _assert_rank_identical(r2, full[4:8])
    # field-sorted cursor too
    body = {"query": {"term": {"lang": "en"}},
            "sort": [{"doclen": {"order": "desc"}}], "size": 5}
    p1 = search_hits(ix, body).collect()
    cur = [p1[-1]["doclen"], p1[-1]["doc_id"]]
    p2 = search_hits(ix, dict(body, search_after=cur)).collect()
    seen = {r["doc_id"] for r in p1}
    assert all(r["doc_id"] not in seen for r in p2)
    assert all(
        (r2_["doclen"], -r2_["doc_id"]) <= (p1[-1]["doclen"], -p1[-1]["doc_id"])
        for r2_ in p2
    )


def test_range_on_timestamp_field(ix, pages_pdf):
    lo, hi = "2024-01-01 01:00", "2024-01-01 03:00"
    body = {"query": {"bool": {"filter": [
        {"range": {"warc_ts": {"gte": lo, "lt": hi}}}]}}, "size": N}
    got = sorted(r["doc_id"] for r in search_hits(ix, body).collect())
    ts = pd.to_datetime(pages_pdf["warc_ts"], utc=True)
    mask = ((ts >= pd.Timestamp(lo, tz="UTC"))
            & (ts < pd.Timestamp(hi, tz="UTC")))
    exp = sorted(i for i in range(N) if mask[i])
    assert got == exp and got, (len(got), len(exp))


def test_compile_rejects_unknown():
    with pytest.raises(ValueError):
        compile_query({"knn": {"field": "emb"}})
    with pytest.raises(ValueError):
        run_aggs(None, {"x": {"nope": {}}})


# ---------------------------------------------------------------------------
# function_score / collapse / rescore
# ---------------------------------------------------------------------------


def test_function_score_fvf_weight_filter(ix, oracle, meta):
    """field_value_factor + filtered weight, score_mode=sum,
    boost_mode=multiply -- recomputed in pure Python."""
    body = {"query": {"function_score": {
        "query": {"match": {"text": QUERY}},
        "functions": [
            {"field_value_factor": {
                "field": "doclen", "factor": 0.1, "modifier": "ln1p"}},
            {"filter": {"term": {"lang": "en"}}, "weight": 3.0},
        ],
        "score_mode": "sum",
        "boost_mode": "multiply",
    }}, "size": K}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    exp = {}
    for d, s in _clause_scores(oracle, QUERY).items():
        lang, dl = meta[d]
        vals = [math.log(1.0 + 0.1 * dl)]
        if lang == "en":
            vals.append(3.0)
        exp[d] = s * sum(vals)
    _assert_rank_identical(got, _topk(exp))


def test_function_score_gauss_replace_over_match_all(ix, meta):
    """gauss decay on doclen over match_all (a LEAFLESS tree that
    must still execute), boost_mode=replace."""
    origin, scale, decay = 50.0, 20.0, 0.5
    body = {"query": {"function_score": {
        "functions": [{"gauss": {"doclen": {
            "origin": origin, "scale": scale, "decay": decay}}}],
        "boost_mode": "replace",
    }}, "size": N}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    assert len(got) == N
    sigma2 = -(scale ** 2) / (2.0 * math.log(decay))
    exp = {d: math.exp(-((abs(dl - origin)) ** 2) / (2.0 * sigma2))
           for d, (_, dl) in meta.items()}
    for d, s in got:
        assert math.isclose(s, exp[d], rel_tol=1e-9), d


def test_function_score_modes_and_max_boost(ix, oracle, meta):
    """score_mode=max over two weight functions + max_boost cap +
    boost_mode=sum; a doc matching no function keeps factor 1."""
    body = {"query": {"function_score": {
        "query": {"match": {"text": QUERY}},
        "functions": [
            {"filter": {"term": {"lang": "en"}}, "weight": 9.0},
            {"filter": {"range": {"doclen": {"gte": 60}}}, "weight": 2.0},
        ],
        "score_mode": "max",
        "boost_mode": "sum",
        "max_boost": 5.0,
    }}, "size": K}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    exp = {}
    for d, s in _clause_scores(oracle, QUERY).items():
        lang, dl = meta[d]
        vals = []
        if lang == "en":
            vals.append(9.0)
        if dl >= 60:
            vals.append(2.0)
        factor = min(max(vals), 5.0) if vals else 1.0
        exp[d] = s + factor
    _assert_rank_identical(got, _topk(exp))


def test_function_score_min_score(ix, oracle, meta):
    base = _clause_scores(oracle, QUERY)
    cut = sorted(base.values())[len(base) // 2]
    body = {"query": {"function_score": {
        "query": {"match": {"text": QUERY}},
        "min_score": cut,
    }}, "size": N}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    exp = {d: s for d, s in base.items() if s >= cut}
    assert exp, "bad cut"
    _assert_rank_identical(got, _topk(exp, k=N))


def test_collapse_best_per_lang(ix, oracle, meta):
    body = {"query": {"match": {"text": QUERY}}, "size": 10,
            "collapse": {"field": "lang"}}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    best = {}
    for d, s in sorted(_clause_scores(oracle, QUERY).items(),
                       key=lambda kv: (-kv[1], kv[0])):
        best.setdefault(meta[d][0], (d, s))
    exp = sorted(best.values(), key=lambda ds: (-ds[1], ds[0]))
    _assert_rank_identical(got, exp)


def test_rescore_phrase_window(ix, pos_ix, oracle, pages_pdf):
    """rescore the top-20 match window with a phrase query:
    qw*base + rw*phrase for window docs containing the phrase."""
    texts = {i: t for i, t in enumerate(pages_pdf["text"])}
    # build the phrase from the top-ranked QUERY doc, so the rescore
    # window is guaranteed to contain at least one phrase match
    top_doc = max(_clause_scores(oracle, QUERY).items(),
                  key=lambda kv: (kv[1], -kv[0]))[0]
    toks = tokenize_py(texts[top_doc])
    phrase = " ".join(toks[3:5])
    body = {
        "query": {"match": {"text": QUERY + " " + phrase}},
        "size": 10,
        "rescore": {
            "window_size": 20,
            "query": {
                "rescore_query": {"match_phrase": {"text": phrase}},
                "query_weight": 0.7,
                "rescore_query_weight": 1.2,
            },
        },
    }
    got = _rows(search_hits(ix, body, positional_ix=pos_ix)
                .select("doc_id", "score"))

    base = _clause_scores(oracle, QUERY + " " + phrase)
    window = sorted(base.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    # phrase scores: the engine's own positional path (itself pinned
    # against a pure-Python recompute in test_phrase_bool.py)
    exp = {}
    from siem_on_amazon_opensearch_service_spark.index.positional import (
        phrase_scores,
    )
    ph = {r["doc_id"]: r["score"]
          for r in phrase_scores(pos_ix, phrase).collect()}
    for d, s in window:
        exp[d] = 0.7 * s + (1.2 * ph[d] if d in ph else 0.0)
    assert any(d in ph for d, _ in window), "phrase absent from window"
    _assert_rank_identical(got, _topk(exp, k=10))


def test_rescore_window_too_small_raises(ix):
    body = {"query": {"match": {"text": QUERY}}, "size": 30,
            "rescore": {"window_size": 20,
                        "query": {"rescore_query": {
                            "term": {"text": "w00001"}}}}}
    with pytest.raises(ValueError):
        search_hits(ix, body)


# ---------------------------------------------------------------------------
# rank_feature
# ---------------------------------------------------------------------------


def test_rank_feature_saturation(ix, oracle):
    """rank_feature alone: score = boost * x/(x+pivot) over the
    feature column (doclen), matching only positive values."""
    body = {"query": {"rank_feature": {
        "field": "doclen", "saturation": {"pivot": 40}, "boost": 2.5}},
        "size": K}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    want = _topk({
        d: 2.5 * (dl / (dl + 40.0))
        for d, dl in oracle.doclen.items() if dl > 0
    })
    _assert_rank_identical(got, want)


def test_rank_feature_log_and_sigmoid(ix, oracle):
    body = {"query": {"rank_feature": {
        "field": "doclen", "log": {"scaling_factor": 3}}}, "size": K}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    want = _topk({d: math.log(3.0 + dl)
                  for d, dl in oracle.doclen.items() if dl > 0})
    _assert_rank_identical(got, want)

    body = {"query": {"rank_feature": {
        "field": "doclen",
        "sigmoid": {"pivot": 50, "exponent": 0.6}}}, "size": K}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    want = _topk({
        d: (dl ** 0.6) / (dl ** 0.6 + 50.0 ** 0.6)
        for d, dl in oracle.doclen.items() if dl > 0
    })
    _assert_rank_identical(got, want)


def test_rank_feature_in_bool_should(ix, oracle):
    """The canonical use: BM25 relevance + a static quality signal as
    an additive should clause."""
    body = {"query": {"bool": {
        "must": [{"match": {"text": QUERY}}],
        "should": [{"rank_feature": {
            "field": "doclen", "saturation": {"pivot": 40},
            "boost": 0.8}}],
    }}, "size": K}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    base = _clause_scores(oracle, QUERY)
    want = _topk({
        d: s + (0.8 * (oracle.doclen[d] / (oracle.doclen[d] + 40.0))
                if oracle.doclen[d] > 0 else 0.0)
        for d, s in base.items()
    })
    _assert_rank_identical(got, want)


def test_rank_feature_requires_function():
    with pytest.raises(ValueError, match="rank_feature needs"):
        compile_query({"rank_feature": {"field": "doclen"}})


def test_terms_lookup_query(spark):
    from siem_on_amazon_opensearch_service_spark import corpus
    from siem_on_amazon_opensearch_service_spark.index import build_index
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_hits,
    )

    pdf = corpus.make_pages_pdf(80, seed=9)
    pdf.insert(0, "doc_id", range(len(pdf)))
    # lookup doc 3 carries the allow-list in an array column
    pdf["allowed"] = [["en", "de"] if i == 3 else None
                      for i in range(len(pdf))]
    ix = build_index(spark, spark.createDataFrame(pdf), id_col="doc_id",
                     keep_cols=["allowed"])
    looked = search_hits(ix, {"query": {"terms": {
        "lang": {"id": 3, "path": "allowed"}}}, "size": 100})
    literal = search_hits(ix, {"query": {"terms": {
        "lang": ["en", "de"]}}, "size": 100})
    got = sorted(r["doc_id"] for r in looked.collect())
    want = sorted(r["doc_id"] for r in literal.collect())
    assert got == want and want, "vacuous terms-lookup test"
    # missing lookup doc -> matches nothing
    assert search_hits(ix, {"query": {"terms": {
        "lang": {"id": 99999, "path": "allowed"}}}, "size": 10}
    ).count() == 0


def test_collapse_inner_hits(ix, oracle, meta):
    """collapse + inner_hits: each collapsed hit carries its group's
    ranked top-k (doc_id, score) array, matching the python twin."""
    body = {"query": {"match": {"text": QUERY}}, "size": 10,
            "collapse": {"field": "lang",
                         "inner_hits": {"name": "grp", "size": 3}}}
    rows = search_hits(ix, body).select("doc_id", "lang", "grp").collect()
    base = _clause_scores(oracle, QUERY)
    groups = {}
    for d, s in sorted(base.items(), key=lambda kv: (-kv[1], kv[0])):
        groups.setdefault(meta[d][0], []).append((d, s))
    assert rows, "no collapsed hits -- vacuous"
    for r in rows:
        want = groups[r["lang"]][:3]
        got = [(ih["doc_id"], ih["score"]) for ih in r["grp"]]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (gd, gs), (ed, es) in zip(got, want):
            assert math.isclose(gs, es, rel_tol=1e-9)
        assert [ih["rank"] for ih in r["grp"]] == list(
            range(1, len(want) + 1))


def test_highlight_multi_fragment_and_fields(ix, spark, pages_pdf):
    """number_of_fragments -> array of tagged context windows; a
    second field with no term hit falls back via no_match_size."""
    src = spark.createDataFrame(
        pages_pdf.assign(doc_id=range(N))[["doc_id", "text", "lang"]])
    body = {
        "query": {"match": {"text": QUERY}},
        "size": 5,
        "highlight": {"fields": {
            "text": {"number_of_fragments": 3, "fragment_size": 60},
            "lang": {"number_of_fragments": 2, "no_match_size": 2},
        }},
    }
    rows = search_hits(ix, body, source_docs=src).collect()
    assert len(rows) == 5
    qterms = set(tokenize_py(QUERY))
    for r in rows:
        frags = r["highlight_text"]
        assert frags and 1 <= len(frags) <= 3
        for f in frags:
            assert "<em>" in f and "</em>" in f
            inner = f.split("<em>")[1].split("</em>")[0].lower()
            assert inner in qterms
        # lang never contains the query terms -> head fallback
        assert r["highlight_lang"] == [r["lang"][:2]]


def test_highlight_legacy_shape_unchanged(ix, spark, pages_pdf):
    """single text-field highlight without number_of_fragments keeps
    the original scalar `highlight` column."""
    src = spark.createDataFrame(
        pages_pdf.assign(doc_id=range(N))[["doc_id", "text"]])
    body = {"query": {"match": {"text": QUERY}}, "size": 3,
            "highlight": {"fields": {"text": {}}}}
    rows = search_hits(ix, body, source_docs=src).collect()
    assert all(isinstance(r["highlight"], str) for r in rows)


def test_date_histogram_time_zone_and_offset(spark, ix):
    """time_zone shifts bucket boundaries to local midnight (keys
    back in UTC); offset slides them by a fixed duration — both vs a
    zoneinfo-computed python twin."""
    import datetime as dt
    from zoneinfo import ZoneInfo

    rows = [(i, dt.datetime(2024, 3, 9, h, 30, tzinfo=dt.timezone.utc))
            for i, h in enumerate([0, 5, 11, 17, 23, 23])]
    rows += [(10 + i, dt.datetime(2024, 3, 10, h, 30,
                                  tzinfo=dt.timezone.utc))
             for i, h in enumerate([2, 9, 10, 22])]  # DST jump in NY
    docs = spark.createDataFrame(
        [(d, t.replace(tzinfo=None)) for d, t in rows],
        "doc_id long, ts timestamp")

    def twin(tz_name, off_secs=0):
        tz = ZoneInfo(tz_name)
        out = {}
        for _, t in rows:
            loc = t.astimezone(tz) - dt.timedelta(seconds=off_secs)
            day = loc.replace(hour=0, minute=0, second=0, microsecond=0)
            key = (day + dt.timedelta(seconds=off_secs)).astimezone(
                dt.timezone.utc).replace(tzinfo=None)
            out[key] = out.get(key, 0) + 1
        return out

    for tz_name, off in [("America/New_York", None),
                         ("Asia/Tokyo", None),
                         ("America/New_York", "+6h"),
                         (None, "-2h")]:
        spec = {"field": "ts", "calendar_interval": "day"}
        if tz_name:
            spec["time_zone"] = tz_name
        if off:
            spec["offset"] = off
        got = {r["d"]: r["doc_count"]
               for r in run_aggs(docs, {"d": {"date_histogram": spec}})
               ["d"].collect()}
        off_secs = {"+6h": 21600, "-2h": -7200}.get(off, 0)
        if tz_name:
            want = twin(tz_name, off_secs)
        else:
            want = twin("UTC", off_secs)
        assert got == want, (tz_name, off, got, want)


def test_duration_parse_rejects_unknown_unit():
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        _dur_secs,
    )

    assert _dur_secs("+6h") == 21600
    assert _dur_secs("-30m") == -1800
    with pytest.raises(ValueError):
        _dur_secs("10x")


def test_min_doc_count_zero_fills_ladder(spark):
    """date_histogram/histogram min_doc_count:0 emit the FULL bucket
    ladder: gaps get doc_count 0, sum metrics 0, avg metrics null;
    extended_bounds widen the range beyond the data."""
    import datetime as dt

    docs = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10), 4.0),
         (2, dt.datetime(2024, 1, 1, 11), 6.0),
         (3, dt.datetime(2024, 1, 4, 3), 10.0)],
        "doc_id long, ts timestamp, v double")

    res = run_aggs(docs, {"d": {
        "date_histogram": {"field": "ts", "calendar_interval": "day",
                           "min_doc_count": 0},
        "aggs": {"s": {"sum": {"field": "v"}},
                 "a": {"avg": {"field": "v"}}}}})["d"].collect()
    got = {r["d"].date().isoformat(): (r["doc_count"], r["s"], r["a"])
           for r in res}
    assert got == {
        "2024-01-01": (2, 10.0, 5.0),
        "2024-01-02": (0, 0.0, None),
        "2024-01-03": (0, 0.0, None),
        "2024-01-04": (1, 10.0, 10.0),
    }
    # ordered by key (response contract holds over filled rungs)
    assert [r["d"].day for r in res] == [1, 2, 3, 4]

    # extended_bounds stretch past the data on both sides
    res2 = run_aggs(docs, {"d": {"date_histogram": {
        "field": "ts", "calendar_interval": "day", "min_doc_count": 0,
        "extended_bounds": {"min": "2023-12-30", "max": "2024-01-05"},
    }}})["d"].collect()
    assert [r["d"].date().isoformat() for r in res2] == [
        "2023-12-30", "2023-12-31", "2024-01-01", "2024-01-02",
        "2024-01-03", "2024-01-04", "2024-01-05"]
    assert sum(r["doc_count"] for r in res2) == 3

    # numeric histogram
    nres = run_aggs(docs, {"h": {"histogram": {
        "field": "v", "interval": 2.0, "min_doc_count": 0}}})["h"] \
        .collect()
    assert [(r["h"], r["doc_count"]) for r in nres] == [
        (4.0, 1), (6.0, 1), (8.0, 0), (10.0, 1)]


def test_min_doc_count_zero_ladder_cap(spark):
    import datetime as dt

    docs = spark.createDataFrame(
        [(1, dt.datetime(2020, 1, 1)), (2, dt.datetime(2024, 1, 1))],
        "doc_id long, ts timestamp")
    with pytest.raises(ValueError, match="widen the interval"):
        run_aggs(docs, {"d": {"date_histogram": {
            "field": "ts", "fixed_interval": "30m",
            "min_doc_count": 0}}})["d"].collect()


def test_min_doc_count_threshold(spark):
    docs = spark.createDataFrame(
        [(i, "a" if i < 5 else ("b" if i < 7 else "c"))
         for i in range(8)], "doc_id long, k string")
    got = {r["t"]: r["doc_count"] for r in run_aggs(docs, {"t": {
        "terms": {"field": "k", "size": 10, "min_doc_count": 2}}})["t"]
        .collect()}
    assert got == {"a": 5, "b": 2}


@pytest.mark.parametrize("interval,kind,keys", [
    ("week", "calendar_interval",
     ["2024-01-01", "2024-01-08", "2024-01-15"]),
    ("month", "calendar_interval",
     ["2024-01-01", "2024-02-01", "2024-03-01"]),
    ("12h", "fixed_interval",
     ["2024-01-01 00:00", "2024-01-01 12:00", "2024-01-02 00:00",
      "2024-01-02 12:00"]),
])
def test_ladder_fill_interval_units(spark, interval, kind, keys):
    import datetime as dt

    lo = dt.datetime(2024, 1, 1, 3)
    hi = {"week": dt.datetime(2024, 1, 16),
          "month": dt.datetime(2024, 3, 2),
          "12h": dt.datetime(2024, 1, 2, 13)}[interval]
    docs = spark.createDataFrame([(1, lo), (2, hi)],
                                 "doc_id long, ts timestamp")
    res = run_aggs(docs, {"d": {"date_histogram": {
        "field": "ts", kind: interval, "min_doc_count": 0}}})["d"] \
        .collect()
    got = [r["d"].strftime("%Y-%m-%d %H:%M") for r in res]
    want = [k if " " in k else f"{k} 00:00" for k in keys]
    assert got == want, (interval, got)
    assert [r["doc_count"] for r in res] == \
        [1] + [0] * (len(keys) - 2) + [1]


def test_function_score_random_score_seeded(ix):
    """random_score function: seeded deterministic uniform [0,1) --
    same seed reproduces the ranking exactly, a different seed
    permutes it (the upstream seeded-mode contract; exact values are
    hash-implementation-defined there too)."""
    def run(seed):
        body = {"query": {"function_score": {
            "functions": [{"random_score": {
                "seed": seed, "field": "doc_id"}}],
            "boost_mode": "replace",
        }}, "size": N}
        return _rows(search_hits(ix, body).select("doc_id", "score"))

    got = run(7)
    assert len(got) == N
    assert all(0.0 <= s < 1.0 for _, s in got)
    assert got == run(7)                       # deterministic
    assert [d for d, _ in got] != [d for d, _ in run(8)]


def test_function_score_script_function(ix, meta):
    """script_score as a FUNCTION inside function_score: the
    restricted-Painless value replaces the score (boost_mode
    replace), recomputed in pure Python."""
    body = {"query": {"function_score": {
        "functions": [{"script_score": {"script": {
            "source": "Math.log(doc['doclen'].value + 1) * 0.5"}}}],
        "boost_mode": "replace",
    }}, "size": N}
    got = _rows(search_hits(ix, body).select("doc_id", "score"))
    assert len(got) == N
    for d, s in got:
        _, dl = meta[d]
        assert math.isclose(s, 0.5 * math.log(dl + 1), rel_tol=1e-9), d
