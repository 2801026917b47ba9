"""Sparse-vector retrieval (rank_features / neural_sparse) vs pure
Python twins, plus the _search body wiring."""

import math

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.analysis import tokenize_py
from siem_on_amazon_opensearch_service_spark.index.sparse import (
    SparseIndex,
    build_sparse_index,
    encode_with_model,
    neural_sparse_scores,
    neural_sparse_topk,
    neural_sparse_topk_two_phase,
    rank_feature_value,
    sparse_encode,
    sparse_from_maps,
)

TEXTS = [
    "spark spark table join stream window",
    "table join table join table",
    "stream stream stream processing engine",
    "spark engine shuffle partition",
    "window aggregate shuffle spark stream",
    "completely unrelated words here",
    "",
]


def _py_weights(texts):
    out = {}
    for i, t in enumerate(texts):
        m = {}
        for tok in tokenize_py(t):
            m[tok] = m.get(tok, 0) + 1
        out[i] = {k: math.log1p(v) for k, v in m.items()}
    return out


def _py_topk(doc_w, q, k):
    scored = []
    for did, m in doc_w.items():
        s = sum(qw * m[t] for t, qw in q.items() if t in m and qw > 0)
        if s > 0:
            scored.append((did, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


@pytest.fixture(scope="module")
def sx(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    return build_sparse_index(sparse_encode(docs), n_docs=len(TEXTS))


def test_encode_matches_python_twin(sx):
    rows = sx.features.collect()
    exp = _py_weights(TEXTS)
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, {})[r.term] = r.weight
    assert set(got) == {i for i, t in enumerate(TEXTS) if tokenize_py(t)}
    for did, m in got.items():
        assert set(m) == set(exp[did])
        for t, w in m.items():
            assert w == pytest.approx(exp[did][t], rel=1e-12)


QUERY = {"spark": 2.0, "stream": 1.5, "shuffle": 1.0, "absent": 3.0}


def test_topk_matches_python_twin(sx):
    got = [(r.doc_id, r.score) for r in
           neural_sparse_topk(sx, QUERY, k=4).collect()]
    exp = _py_topk(_py_weights(TEXTS), QUERY, 4)
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, g), (_, e) in zip(got, exp):
        assert g == pytest.approx(e, rel=1e-12)


def test_scores_unlimited_and_empty_query(sx):
    n = neural_sparse_scores(sx, QUERY).count()
    assert n == len(_py_topk(_py_weights(TEXTS), QUERY, 99))
    assert neural_sparse_scores(sx, {}).count() == 0
    assert neural_sparse_topk(sx, {"absent": 1.0}, k=3).count() == 0
    # non-positive query weights are dropped, not scored negatively
    assert neural_sparse_scores(sx, {"spark": -1.0}).count() == 0


def test_two_phase_exact_scores_and_rank(sx):
    # high-weight tokens (spark, stream) cover every doc that can
    # score materially; 'shuffle' is the pruned low-weight tail the
    # second phase folds back in — the regime the 2.15 two-phase
    # processor is built for
    q = {"spark": 2.0, "stream": 1.8, "shuffle": 0.3}
    full = [(r.doc_id, r.score) for r in
            neural_sparse_topk(sx, q, k=3).collect()]
    two = [(r.doc_id, r.score) for r in
           neural_sparse_topk_two_phase(sx, q, k=3,
                                        prune_ratio=0.5).collect()]
    # phase-2 rescoring makes returned scores EXACT; on this corpus
    # the expanded candidate set recovers the exhaustive ranking too
    assert [d for d, _ in two] == [d for d, _ in full]
    for (_, a), (_, b) in zip(two, full):
        assert a == pytest.approx(b, rel=1e-12)
    # degenerate prune (all tokens above the bar) = exhaustive plan
    same = neural_sparse_topk_two_phase(sx, {"spark": 1.0}, k=3)
    exp = neural_sparse_topk(sx, {"spark": 1.0}, k=3)
    assert same.collect() == exp.collect()


def test_save_load_roundtrip_and_pushdown(spark, sx, tmp_path):
    path = str(tmp_path / "sparse_ix")
    sx.save(spark, path, buckets=4)
    lx = SparseIndex.load(spark, path)
    assert lx.n_docs == sx.n_docs and lx.field == sx.field
    a = neural_sparse_topk(lx, QUERY, k=4).collect()
    b = neural_sparse_topk(sx, QUERY, k=4).collect()
    assert [(r.doc_id, round(r.score, 9)) for r in a] == \
           [(r.doc_id, round(r.score, 9)) for r in b]
    # the term IN predicate reaches the parquet scan
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        neural_sparse_topk(lx, QUERY, k=4).explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "In(term" in plan
    # one shuffle total (the doc_id hash agg — formatted output names
    # each node twice); no join anywhere
    assert plan.count("Exchange") == 2, plan
    assert "Join" not in plan


def test_from_maps_and_model_seam(spark):
    docs = spark.createDataFrame(
        [(0, {"a": 1.0, "b": 0.5, "neg": -2.0}), (1, {"b": 2.0})],
        "doc_id long, feats map<string,double>")
    rows = {(r.term, r.doc_id): r.weight
            for r in sparse_from_maps(docs, "feats").collect()}
    assert rows == {("a", 0): 1.0, ("b", 0): 0.5, ("b", 1): 2.0}

    def fake_model(texts):
        return [{w: float(len(w)) for w in t.split()} for t in texts]

    tdocs = spark.createDataFrame(
        [(0, "aa bbb"), (1, "c")], "doc_id long, text string")
    got = {(r.term, r.doc_id): r.weight
           for r in encode_with_model(tdocs, fake_model).collect()}
    assert got == {("aa", 0): 2.0, ("bbb", 0): 3.0, ("c", 1): 1.0}


def test_rank_feature_map_functions(spark):
    df = spark.createDataFrame(
        [(0, {"pagerank": 4.0}), (1, {"pagerank": 0.0}), (2, {})],
        "doc_id long, feats map<string,double>")
    out = df.select(
        rank_feature_value("feats", "pagerank", "saturation",
                           pivot=2.0).alias("sat"),
        rank_feature_value("feats", "pagerank", "log",
                           scaling_factor=1.0).alias("lg"),
        rank_feature_value("feats", "pagerank", "sigmoid", pivot=2.0,
                           exponent=2.0).alias("sg"),
    ).collect()
    assert out[0].sat == pytest.approx(4.0 / 6.0)
    assert out[0].lg == pytest.approx(math.log(5.0))
    assert out[0].sg == pytest.approx(16.0 / 20.0)
    for r in out[1:]:
        assert (r.sat, r.lg, r.sg) == (0.0, 0.0, 0.0)
    with pytest.raises(ValueError):
        rank_feature_value("feats", "x", "cube")


def test_neural_sparse_body_and_hybrid(spark, sx):
    from siem_on_amazon_opensearch_service_spark.index import build_index
    from siem_on_amazon_opensearch_service_spark.index.searchbody import (
        search_body,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    ix = build_index(spark, docs, text_col="text", id_col="doc_id")
    body = {"query": {"neural_sparse": {"sparse_embedding": {
        "query_tokens": QUERY, "k": 3}}}, "size": 3}
    hits = search_body(ix, body, sparse=sx)["hits"].collect()
    exp = _py_topk(_py_weights(TEXTS), QUERY, 3)
    assert [r.doc_id for r in hits] == [d for d, _ in exp]
    for r, (_, e) in zip(hits, exp):
        assert r.score == pytest.approx(e, rel=1e-12)

    # wrong field name is a loud contract error; missing handle too
    with pytest.raises(ValueError):
        search_body(ix, {"query": {"neural_sparse": {"other": {
            "query_tokens": QUERY}}}}, sparse=sx)
    with pytest.raises(ValueError):
        search_body(ix, body)

    # hybrid BM25 + sparse: RRF over the two depth-bounded cuts
    hy = {"query": {"hybrid": {"queries": [
        {"match": {"text": "spark stream"}},
        {"neural_sparse": {"sparse_embedding": {
            "query_tokens": QUERY, "k": 5}}},
    ], "pagination_depth": 5, "rank_constant": 60}}, "size": 5}
    fused = search_body(ix, hy, sparse=sx)["hits"].collect()
    assert fused and all(r.score > 0 for r in fused)
    # doc 0 matches both rankings near the top -> must lead the fusion
    assert fused[0].doc_id == 0


def test_pruned_rank_identical(spark):
    # stopword-laden sparse query over a Zipfian synthetic corpus:
    # the pruned plan must be rank+score identical to exhaustive
    from siem_on_amazon_opensearch_service_spark import corpus
    from siem_on_amazon_opensearch_service_spark.index.sparse import (
        neural_sparse_topk_pruned,
    )

    pages = corpus.pages_df(spark, 600, seed=11, partitions=4)
    docs = pages.selectExpr(
        "cast(row_number() over (order by url) - 1 as long) as doc_id",
        "text")
    sx2 = build_sparse_index(sparse_encode(docs), n_docs=600)
    sx2.features = sx2.features.persist()
    sx2.features.count()
    # w00001/w00002 are the Zipf head (stopword analog); w01xxx tail
    q = {"w00001": 0.2, "w00002": 0.15, "w00412": 2.0, "w00733": 1.5}
    stats = {}
    ex = [(r.doc_id, round(r.score, 9)) for r in
          neural_sparse_topk(sx2, q, k=10).collect()]
    pr = [(r.doc_id, round(r.score, 9)) for r in
          neural_sparse_topk_pruned(sx2, q, k=10,
                                    stats_out=stats).collect()]
    assert pr == ex
    assert stats["theta"] > 0
    # absent tokens and tiny corpora stay correct via dispatch
    assert neural_sparse_topk_pruned(sx2, {"zz": 1.0}, k=3).count() == 0
    small = [(r.doc_id, round(r.score, 9)) for r in
             neural_sparse_topk_pruned(sx2, q, k=10).collect()]
    assert small == ex  # cost dispatch routes to exhaustive, same rows
    sx2.features.unpersist()
