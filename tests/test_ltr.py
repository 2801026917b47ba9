"""LTR plugin surface: feature logging (one forest pass, plan-pinned
single postings scan), linear-model scoring, closed-form ridge
training vs numpy lstsq, and sltr rescore window semantics — all
cross-checked against the pure-python OracleIndex."""

import io
import math
from contextlib import redirect_stdout

import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex, build_index,
)
from siem_on_amazon_opensearch_service_spark.index.ltr import (
    LinearModel, instantiate, log_features, sltr_rescore, sltr_score,
    sltr_topk, train_linear,
)
from siem_on_amazon_opensearch_service_spark.oracle import OracleIndex

N = 250

FEATURESET = [
    {"name": "f_kw", "template": {"match": {"text": "{{keywords}}"}}},
    {"name": "f_title", "template": {"match": {"text": "{{title_kw}}"}}},
    {"name": "f_const", "template": {"match_all": {}}},
]
PARAMS = {"keywords": "w00001 w00057", "title_kw": "w00003"}


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    pdf = corpus.make_pages_pdf(N, seed=31)
    pdf.insert(0, "doc_id", range(len(pdf)))
    built = build_index(spark, spark.createDataFrame(pdf),
                        id_col="doc_id", salt_threshold=60)
    path = str(tmp_path_factory.mktemp("ltr_ix"))
    built.save(spark, path, buckets=4)
    return PostingsIndex.load(spark, path)


@pytest.fixture(scope="module")
def oracle(spark):
    pdf = corpus.make_pages_pdf(N, seed=31)
    return OracleIndex.build(dict(zip(range(len(pdf)), pdf["text"])))


def test_instantiate():
    t = {"match": {"text": "{{kw}} and {{kw}}"},
         "nest": [{"a": "{{b}}"}], "n": 3}
    assert instantiate(t, {"kw": "x", "b": "y"}) == {
        "match": {"text": "x and x"}, "nest": [{"a": "y"}], "n": 3}


def test_log_features_vs_oracle(ix, oracle):
    feats = {r["doc_id"]: (r["f_kw"], r["f_title"], r["f_const"])
             for r in log_features(ix, FEATURESET, PARAMS).collect()}
    want_kw = dict(oracle.search(PARAMS["keywords"], k=N))
    want_ti = dict(oracle.search(PARAMS["title_kw"], k=N))
    assert set(feats) == set(range(N))  # f_const covers every doc
    for d, (fk, ft, fc) in feats.items():
        assert fk == pytest.approx(want_kw.get(d, 0.0), abs=1e-9)
        assert ft == pytest.approx(want_ti.get(d, 0.0), abs=1e-9)
        assert fc == 1.0


def test_log_features_single_scan(ix):
    df = log_features(ix, FEATURESET, PARAMS)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the two match features share one postings scan
    assert plan.count("postings") <= 2  # scan node + its detail block


def test_doc_filter_rows(ix, spark):
    ids = spark.createDataFrame([(0,), (5,), (17,)], "doc_id long")
    got = log_features(ix, FEATURESET, PARAMS, doc_filter=ids)
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 5, 17]


def test_sltr_score_and_topk(ix, oracle):
    model = LinearModel({"f_kw": 0.7, "f_title": 0.4, "f_const": 0.1},
                        intercept=-0.05)
    feats = log_features(ix, FEATURESET, PARAMS)
    got = {r["doc_id"]: r["_ltr"]
           for r in sltr_score(feats, model).collect()}
    want_kw = dict(oracle.search(PARAMS["keywords"], k=N))
    want_ti = dict(oracle.search(PARAMS["title_kw"], k=N))
    for d in range(N):
        w = (-0.05 + 0.7 * want_kw.get(d, 0.0)
             + 0.4 * want_ti.get(d, 0.0) + 0.1)
        assert got[d] == pytest.approx(w, abs=1e-9)
    top = [(r["doc_id"], r["score"])
           for r in sltr_topk(ix, FEATURESET, PARAMS, model, k=5)
           .collect()]
    want_top = sorted(((d, got[d]) for d in got),
                      key=lambda t: (-t[1], t[0]))[:5]
    assert [d for d, _ in top] == [d for d, _ in want_top]


def test_train_linear_recovers_and_matches_lstsq(ix):
    feats = log_features(ix, FEATURESET, PARAMS)
    names = ["f_kw", "f_title", "f_const"]
    pdf = feats.toPandas().sort_values("doc_id")
    # noise-free linear grades: exact recovery expected
    grades = (0.3 + 1.5 * pdf["f_kw"] - 0.8 * pdf["f_title"]).to_numpy()
    spark = feats.sparkSession
    judg = spark.createDataFrame(
        [(int(d), float(g)) for d, g in zip(pdf["doc_id"], grades)],
        "doc_id long, grade double")
    # f_const is collinear with the intercept — train on the 2 real
    # features (the singular-matrix guard is exercised separately)
    model = train_linear(feats, judg, names[:2], l2=1e-9)
    assert model.weights["f_kw"] == pytest.approx(1.5, abs=1e-5)
    assert model.weights["f_title"] == pytest.approx(-0.8, abs=1e-5)
    assert model.intercept == pytest.approx(0.3, abs=1e-5)
    # and the Gram-matrix path == numpy lstsq on the same rows
    x = np.column_stack([np.ones(len(pdf)),
                         pdf["f_kw"].to_numpy(),
                         pdf["f_title"].to_numpy()])
    ls = np.linalg.lstsq(x, grades, rcond=None)[0]
    assert model.intercept == pytest.approx(ls[0], abs=1e-6)
    assert model.weights["f_kw"] == pytest.approx(ls[1], abs=1e-6)
    assert model.weights["f_title"] == pytest.approx(ls[2], abs=1e-6)


def test_sltr_rescore_window(ix, oracle):
    from siem_on_amazon_opensearch_service_spark.index import bm25_topk

    model = LinearModel({"f_title": 1.0}, intercept=0.0)
    base = bm25_topk(ix, PARAMS["keywords"], k=N)
    got = [(r["doc_id"], r["score"]) for r in sltr_rescore(
        ix, base, [FEATURESET[1]], PARAMS, model,
        window=10, k=5, query_weight=0.5, rescore_weight=2.0).collect()]
    # python twin: top-10 base docs, rescored 0.5*base + 2*f_title
    base_rows = sorted(((d, s) for d, s in oracle.search(
        PARAMS["keywords"], k=N)), key=lambda t: (-t[1], t[0]))[:10]
    want_ti = dict(oracle.search(PARAMS["title_kw"], k=N))
    rescored = sorted(
        ((d, 0.5 * s + 2.0 * want_ti.get(d, 0.0)) for d, s in base_rows),
        key=lambda t: (-t[1], t[0]))[:5]
    assert [d for d, _ in got] == [d for d, _ in rescored]
    for (_, gs), (_, ws) in zip(got, rescored):
        assert gs == pytest.approx(ws, abs=1e-9)


# --- model/xgboost (tree ensemble) -----------------------------------------

TREES = [
    {"nodeid": 0, "split": "f_kw", "split_condition": 1.5,
     "yes": 1, "no": 2, "missing": 1, "children": [
         {"nodeid": 1, "split": "f_title", "split_condition": 0.5,
          "yes": 3, "no": 4, "missing": 4, "children": [
              {"nodeid": 3, "leaf": 0.1},
              {"nodeid": 4, "leaf": 0.7}]},
         {"nodeid": 2, "leaf": 1.3}]},
    {"nodeid": 0, "split": "f_const", "split_condition": 0.9,
     "yes": 1, "no": 2, "missing": 2, "children": [
         {"nodeid": 1, "leaf": -0.2},
         {"nodeid": 2, "leaf": 0.4}]},
]


def _py_tree(node, feats):
    while "leaf" not in node:
        kids = {c["nodeid"]: c for c in node["children"]}
        v = feats.get(node["split"])
        if v is None:
            node = kids[node.get("missing", node["yes"])]
        elif v < node["split_condition"]:
            node = kids[node["yes"]]
        else:
            node = kids[node["no"]]
    return node["leaf"]


def test_tree_ensemble_matches_python_twin(ix):
    from siem_on_amazon_opensearch_service_spark.index.ltr import (
        TreeEnsembleModel,
        log_features,
        sltr_score,
    )

    model = TreeEnsembleModel(TREES, base_score=0.05)
    feats = log_features(ix, FEATURESET, PARAMS)
    got = {r.doc_id: r._ltr for r in sltr_score(feats, model).collect()}
    rows = feats.collect()
    assert got, "no feature rows -- vacuous"
    for r in rows:
        fv = {n: r[n] for n in ("f_kw", "f_title", "f_const")}
        want = 0.05 + sum(_py_tree(t, fv) for t in TREES)
        assert math.isclose(got[r.doc_id], want, rel_tol=1e-9), (
            r.doc_id, got[r.doc_id], want)


def test_tree_ensemble_null_follows_missing(spark):
    from siem_on_amazon_opensearch_service_spark.index.ltr import (
        TreeEnsembleModel,
    )

    df = spark.createDataFrame(
        [(0, None, 2.0, 1.0), (1, 2.0, None, None)],
        "doc_id long, f_kw double, f_title double, f_const double")
    model = TreeEnsembleModel(TREES)
    got = {r.doc_id: r._s
           for r in df.withColumn("_s", model.expr()).collect()}
    # doc 0: f_kw missing -> missing=yes(1); f_title=2 -> no(4)=0.7;
    #        tree2 f_const=1 -> no=0.4
    assert math.isclose(got[0], 0.7 + 0.4, rel_tol=1e-9)
    # doc 1: f_kw=2 -> no(2)=1.3; f_const missing -> missing=no(2)=0.4
    assert math.isclose(got[1], 1.3 + 0.4, rel_tol=1e-9)


def test_tree_ensemble_upload_envelope_and_validation():
    import json

    from siem_on_amazon_opensearch_service_spark.index.ltr import (
        TreeEnsembleModel,
    )

    env = {"model": {"definition": json.dumps(TREES)}}
    m = TreeEnsembleModel.from_xgboost(env)
    assert len(m.trees) == 2
    m2 = TreeEnsembleModel.from_xgboost(json.dumps(TREES))
    assert m2.trees == m.trees
    bad = [{"nodeid": 0, "split": "f", "split_condition": 1.0,
            "yes": 1, "no": 2, "missing": 9, "children": [
                {"nodeid": 1, "leaf": 0.0}, {"nodeid": 2, "leaf": 1.0}]}]
    with pytest.raises(ValueError, match="missing"):
        TreeEnsembleModel(bad).expr()


def test_sltr_topk_accepts_tree_model(ix):
    from siem_on_amazon_opensearch_service_spark.index.ltr import (
        TreeEnsembleModel,
        log_features,
        sltr_score,
        sltr_topk,
    )

    model = TreeEnsembleModel(TREES)
    top = sltr_topk(ix, FEATURESET, PARAMS, model, k=5).collect()
    feats = log_features(ix, FEATURESET, PARAMS)
    scored = sorted(
        ((r._ltr, -r.doc_id, r.doc_id)
         for r in sltr_score(feats, model).collect()),
        reverse=True)
    want = [d for _s, _nd, d in scored[:5]]
    assert [r.doc_id for r in top] == want


def test_tree_ensemble_plugin_envelope_and_nan(spark):
    import json

    from siem_on_amazon_opensearch_service_spark.index.ltr import (
        TreeEnsembleModel,
    )

    # the real _createmodel nesting: model.model.definition
    env = {"model": {"name": "m", "model": {
        "type": "model/xgboost", "definition": json.dumps(TREES)}}}
    assert TreeEnsembleModel.from_xgboost(env).trees == TREES
    # the {objective, splits} definition form
    obj = {"model": {"model": {"definition": json.dumps(
        {"objective": "rank:ndcg", "splits": TREES})}}}
    assert TreeEnsembleModel.from_xgboost(obj).trees == TREES
    with pytest.raises(ValueError, match="envelope"):
        TreeEnsembleModel.from_xgboost({"nope": 1})
    # NaN routes to the missing child, exactly like xgboost
    df = spark.createDataFrame(
        [(0, float("nan"), 2.0, 1.0)],
        "doc_id long, f_kw double, f_title double, f_const double")
    got = df.withColumn("_s", TreeEnsembleModel(TREES).expr()) \
        .collect()[0]._s
    # f_kw NaN -> missing=yes(1); f_title=2 -> no(4)=0.7; tree2: 0.4
    assert math.isclose(got, 0.7 + 0.4, rel_tol=1e-9)
