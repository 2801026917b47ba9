"""multi_match (multi-field index, per-field boosts) semantics.

Ground truth: most_fields decomposes -- the multi-field score must
equal sum_f boost_f * (single-field BM25 over field f alone), where
each single-field run is the already-oracle-verified engine."""

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.analysis import tokens_col
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.multifield import (
    MultiFieldIndex,
    build_multi_index,
    multi_match_scores,
    multi_match_topk,
)

QUERY = "w00001 w00057 w00003"
BOOSTS = {"body": 1.0, "title": 2.5}


@pytest.fixture(scope="module")
def pages(spark):
    p = corpus.pages_df(spark, 400, seed=7, partitions=4).withColumn(
        "title", F.array_join(F.slice(tokens_col("text"), 1, 6), " ")
    )
    p.persist().count()
    return p


@pytest.fixture(scope="module")
def mix(spark, pages):
    m = build_multi_index(
        spark, pages, {"body": "text", "title": "title"}, salt_threshold=50
    )
    m.postings = m.postings.persist()
    m.term_stats = m.term_stats.persist()
    return m


def _single_field_scores(spark, pages, col, k=1000):
    ix = build_index(spark, pages, text_col=col, salt_threshold=50)
    from siem_on_amazon_opensearch_service_spark.index.query import bm25_scores

    return {
        r["doc_id"]: r["score"] for r in bm25_scores(ix, QUERY).collect()
    }


def test_most_fields_decomposition(spark, pages, mix):
    got = {
        r["doc_id"]: r["score"]
        for r in multi_match_scores(mix, QUERY, BOOSTS).collect()
    }
    body = _single_field_scores(spark, pages, "text")
    title = _single_field_scores(spark, pages, "title")
    want = {}
    for d, s in body.items():
        want[d] = want.get(d, 0.0) + BOOSTS["body"] * s
    for d, s in title.items():
        want[d] = want.get(d, 0.0) + BOOSTS["title"] * s
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9), d


def test_zero_boost_field_excluded(spark, pages, mix):
    only_body = {
        r["doc_id"]: r["score"]
        for r in multi_match_scores(mix, QUERY, {"body": 1.0, "title": 0.0})
        .collect()
    }
    body = _single_field_scores(spark, pages, "text")
    assert only_body.keys() == body.keys()
    for d, s in body.items():
        assert only_body[d] == pytest.approx(s, abs=1e-9)


def test_topk_order_and_field_column(spark, mix, tmp_path):
    top = multi_match_topk(mix, QUERY, BOOSTS, k=10).collect()
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)
    assert set(mix.postings.select("field").distinct().toPandas()["field"]) == {
        "body", "title"
    }
    # save/load roundtrip preserves results
    mix.save(spark, str(tmp_path / "mix"), buckets=2)
    re = MultiFieldIndex.load(spark, str(tmp_path / "mix"))
    top2 = multi_match_topk(re, QUERY, BOOSTS, k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in top] == [
        (r["doc_id"], round(r["score"], 9)) for r in top2
    ]


def test_best_fields_dis_max_decomposition(spark, pages, mix):
    """best_fields must equal max_f + tb * sum(others) over the same
    per-field single-engine scores most_fields decomposes into."""
    tb = 0.3
    got = {
        r["doc_id"]: r["score"]
        for r in multi_match_scores(
            mix, QUERY, BOOSTS, mode="best_fields", tie_breaker=tb
        ).collect()
    }
    body = _single_field_scores(spark, pages, "text")
    title = _single_field_scores(spark, pages, "title")
    want = {}
    for d in set(body) | set(title):
        fs = []
        if d in body:
            fs.append(BOOSTS["body"] * body[d])
        if d in title:
            fs.append(BOOSTS["title"] * title[d])
        want[d] = max(fs) + tb * (sum(fs) - max(fs))
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9), d


def test_best_fields_zero_tiebreak_is_pure_max(spark, pages, mix):
    got = {
        r["doc_id"]: r["score"]
        for r in multi_match_scores(
            mix, QUERY, BOOSTS, mode="best_fields"
        ).collect()
    }
    body = _single_field_scores(spark, pages, "text")
    title = _single_field_scores(spark, pages, "title")
    for d, s in got.items():
        want = max(
            [BOOSTS["body"] * body.get(d, 0.0),
             BOOSTS["title"] * title.get(d, 0.0)]
        )
        assert s == pytest.approx(want, abs=1e-9)


def _py_cross_fields(spark, pages, mix, tb):
    """Pure-python blended-statistics twin over the raw corpus."""
    import math

    from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py
    from siem_on_amazon_opensearch_service_spark.bm25 import B, K1

    url2id = {r["url"]: int(r["doc_id"]) for r in mix.docs.collect()}
    raw = pages.select("url", "text", "title").collect()
    toks = {
        url2id[r["url"]]: {"body": tokenize_py(r["text"]),
                           "title": tokenize_py(r["title"])}
        for r in raw
    }
    qtf: dict[str, int] = {}
    for t in tokenize_py(QUERY):
        qtf[t] = qtf.get(t, 0) + 1

    stats = {}
    for f in BOOSTS:
        dls = {d: len(v[f]) for d, v in toks.items() if v[f]}
        stats[f] = (len(dls), sum(dls.values()) / len(dls))
    n_blend = max(n for n, _ in stats.values())

    df_blend = {}
    for t in qtf:
        for f in BOOSTS:
            df = sum(1 for v in toks.values() if t in v[f])
            df_blend[t] = max(df_blend.get(t, 0), df)

    want = {}
    for d, v in toks.items():
        total = 0.0
        for t, q in qtf.items():
            if df_blend[t] == 0:
                continue
            idf = math.log(1 + (n_blend - df_blend[t] + 0.5)
                           / (df_blend[t] + 0.5))
            fs = []
            for f in BOOSTS:
                tf = v[f].count(t)
                if not tf:
                    continue
                _, avgdl = stats[f]
                sat = tf / (tf + K1 * (1 - B + B * len(v[f]) / avgdl))
                fs.append(BOOSTS[f] * q * idf * sat)
            if fs:
                total += max(fs) + tb * (sum(fs) - max(fs))
        if total:
            want[d] = total
    return want


@pytest.mark.parametrize("tb", [0.0, 0.3])
def test_cross_fields_blended_twin(spark, pages, mix, tb):
    """cross_fields == the blended-statistics model: one idf per term
    (df = max across fields, N = max docCount), per-term dis_max over
    fields, summed over terms."""
    got = {
        r["doc_id"]: r["score"]
        for r in multi_match_scores(
            mix, QUERY, BOOSTS, mode="cross_fields", tie_breaker=tb
        ).collect()
    }
    want = _py_cross_fields(spark, pages, mix, tb)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9), d


def test_unknown_mode_raises(mix):
    with pytest.raises(ValueError):
        multi_match_scores(mix, QUERY, BOOSTS, mode="phrase_prefixy")


def _py_combined_fields(pages, mix, weights):
    """Pure-python BM25F twin (Lucene CombinedFieldQuery model):
    weighted tf / dl folded BEFORE saturation, blended idf, union N."""
    import math

    from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py
    from siem_on_amazon_opensearch_service_spark.bm25 import B, K1

    url2id = {r["url"]: int(r["doc_id"]) for r in mix.docs.collect()}
    raw = pages.select("url", "text", "title").collect()
    toks = {
        url2id[r["url"]]: {"body": tokenize_py(r["text"]),
                           "title": tokenize_py(r["title"])}
        for r in raw
    }
    qtf: dict[str, int] = {}
    for t in tokenize_py(QUERY):
        qtf[t] = qtf.get(t, 0) + 1

    n_union = sum(1 for v in toks.values() if any(v[f] for f in weights))
    sum_wdl = sum(
        w * len(v[f]) for v in toks.values() for f, w in weights.items()
    )
    avgdl_c = sum_wdl / n_union
    df_blend = {
        t: max(
            sum(1 for v in toks.values() if t in v[f]) for f in weights
        )
        for t in qtf
    }

    want = {}
    for d, v in toks.items():
        dl_c = sum(w * len(v[f]) for f, w in weights.items())
        total = 0.0
        for t, q in qtf.items():
            if df_blend[t] == 0:
                continue
            tf_c = sum(w * v[f].count(t) for f, w in weights.items())
            if not tf_c:
                continue
            idf = math.log(1 + (n_union - df_blend[t] + 0.5)
                           / (df_blend[t] + 0.5))
            total += q * idf * tf_c / (
                tf_c + K1 * (1 - B + B * dl_c / avgdl_c))
        if total:
            want[d] = total
    return want


def test_combined_fields_python_twin(spark, pages, mix):
    from siem_on_amazon_opensearch_service_spark.index.multifield import (
        combined_fields_scores,
    )

    got = {
        r["doc_id"]: r["score"]
        for r in combined_fields_scores(mix, QUERY, BOOSTS).collect()
    }
    want = _py_combined_fields(pages, mix, BOOSTS)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9), d


def test_combined_fields_single_field_is_plain_bm25(spark, pages, mix):
    """With one field at weight 1 (and every doc non-empty in it, so
    the union docCount equals the field docCount), combined_fields
    collapses to the single-field engine exactly."""
    from siem_on_amazon_opensearch_service_spark.index.multifield import (
        combined_fields_scores,
    )

    assert mix.field_stats["*"][0] == mix.field_stats["body"][0]
    got = {
        r["doc_id"]: r["score"]
        for r in combined_fields_scores(mix, QUERY, {"body": 1.0}).collect()
    }
    body = _single_field_scores(spark, pages, "text")
    assert got.keys() == body.keys()
    for d, s in body.items():
        assert got[d] == pytest.approx(s, abs=1e-9), d


def test_combined_fields_save_load_roundtrip(spark, mix, tmp_path):
    from siem_on_amazon_opensearch_service_spark.index.multifield import (
        combined_fields_topk,
    )

    top = combined_fields_topk(mix, QUERY, BOOSTS, k=10).collect()
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)
    mix.save(spark, str(tmp_path / "cmix"), buckets=2)
    re = MultiFieldIndex.load(spark, str(tmp_path / "cmix"))
    assert re.doc_lens is not None
    top2 = combined_fields_topk(re, QUERY, BOOSTS, k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in top] == [
        (r["doc_id"], round(r["score"], 9)) for r in top2
    ]


def test_combined_fields_requires_norms(spark, mix):
    from siem_on_amazon_opensearch_service_spark.index.multifield import (
        MultiFieldIndex as MFI,
        combined_fields_scores,
    )

    bare = MFI(docs=mix.docs, postings=mix.postings,
               term_stats=mix.term_stats, field_stats=mix.field_stats,
               doc_lens=None)
    with pytest.raises(ValueError, match="norms"):
        combined_fields_scores(bare, QUERY, BOOSTS)


def test_body_multi_match_and_combined_fields(spark, pages, mix):
    """search_hits dispatches multi_match / combined_fields body
    kinds onto the MultiFieldIndex (wire field^boost syntax)."""
    from siem_on_amazon_opensearch_service_spark.index.multifield import (
        combined_fields_topk,
    )
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_hits,
    )

    ix = build_index(spark, pages, salt_threshold=50)
    fields = ["body", "title^2.5"]

    body = {"query": {"multi_match": {
        "query": QUERY, "fields": fields, "type": "most_fields"}},
        "size": 10}
    got = [(r["doc_id"], round(r["score"], 9))
           for r in search_hits(ix, body, multi_ix=mix)
           .select("doc_id", "score").collect()]
    want = [(r["doc_id"], round(r["score"], 9))
            for r in multi_match_topk(mix, QUERY, BOOSTS, k=10).collect()]
    assert got == want

    # default type is best_fields
    bbody = {"query": {"multi_match": {"query": QUERY, "fields": fields,
                                       "tie_breaker": 0.3}}, "size": 10}
    got_b = [(r["doc_id"], round(r["score"], 9))
             for r in search_hits(ix, bbody, multi_ix=mix)
             .select("doc_id", "score").collect()]
    want_b = [(r["doc_id"], round(r["score"], 9))
              for r in multi_match_topk(
                  mix, QUERY, BOOSTS, k=10, mode="best_fields",
                  tie_breaker=0.3).collect()]
    assert got_b == want_b

    cbody = {"query": {"combined_fields": {
        "query": QUERY, "fields": fields}}, "size": 10}
    got_c = [(r["doc_id"], round(r["score"], 9))
             for r in search_hits(ix, cbody, multi_ix=mix)
             .select("doc_id", "score").collect()]
    want_c = [(r["doc_id"], round(r["score"], 9))
              for r in combined_fields_topk(mix, QUERY, BOOSTS, k=10)
              .collect()]
    assert got_c == want_c

    with pytest.raises(ValueError, match="multi-field index"):
        search_hits(ix, body).collect()


def test_body_fields_wildcard_expansion(spark, pages, mix):
    """fields: ["*^2"] expands to every indexed field (never the
    reserved "*" stats row) with the pattern's boost."""
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_hits,
    )

    ix = build_index(spark, pages, salt_threshold=50)
    body = {"query": {"multi_match": {
        "query": QUERY, "fields": ["*^2"], "type": "most_fields"}},
        "size": 10}
    got = [(r["doc_id"], round(r["score"], 9))
           for r in search_hits(ix, body, multi_ix=mix)
           .select("doc_id", "score").collect()]
    want = [(r["doc_id"], round(r["score"], 9))
            for r in multi_match_topk(
                mix, QUERY, {"body": 2.0, "title": 2.0}, k=10).collect()]
    assert got == want


def test_combined_fields_operator_and_mnm(spark, pages, mix):
    """operator=and keeps only docs matching EVERY query term in some
    field; minimum_should_match thresholds the distinct-term count;
    surviving scores are unchanged from the OR run."""
    from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py
    from siem_on_amazon_opensearch_service_spark.index.multifield import (
        combined_fields_scores,
    )

    base = {
        r["doc_id"]: r["score"]
        for r in combined_fields_scores(mix, QUERY, BOOSTS).collect()
    }
    toks = {}
    for r in pages.select("url", "text", "title").collect():
        toks[r["url"]] = tokenize_py(r["text"]) + tokenize_py(r["title"])
    url2id = {r["url"]: int(r["doc_id"]) for r in mix.docs.collect()}
    nmatch = {
        url2id[u]: sum(1 for t in set(tokenize_py(QUERY)) if t in tk)
        for u, tk in toks.items()
    }
    qn = len(set(tokenize_py(QUERY)))

    got_and = {
        r["doc_id"]: r["score"]
        for r in combined_fields_scores(
            mix, QUERY, BOOSTS, operator="and").collect()
    }
    want_and = {d for d, n in nmatch.items() if n == qn}
    assert set(got_and) == want_and and want_and
    for d, s in got_and.items():
        assert s == pytest.approx(base[d], abs=1e-9)

    got_2 = {
        r["doc_id"]
        for r in combined_fields_scores(
            mix, QUERY, BOOSTS, minimum_should_match=2).collect()
    }
    assert got_2 == {d for d, n in nmatch.items() if n >= 2}
    assert got_2 > want_and  # strictly wider -- not vacuous
