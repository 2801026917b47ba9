"""Learning-to-rank — the OpenSearch LTR plugin surface
(opensearch-project/opensearch-learning-to-rank-base, the o19s
Elasticsearch plugin lineage): *featuresets* of templated queries,
*feature logging* for judged (query, doc) pairs, an uploaded *model*
scored by the ``sltr`` query, usually inside a ``rescore`` window.

Reference context: the SIEM stack's saved searches rank purely by
BM25/recency; LTR is how an OpenSearch operator upgrades that ranking
with signals (per-field BM25, doc length/quality, recency) once
judgments exist. The plugin's pieces map onto this engine as:

* featureset — a list of ``{"name", "template"}`` where the template
  is a normal ``_search`` query dict with ``{{param}}`` placeholders
  (Mustache-style, the plugin's wire shape). :func:`instantiate`
  substitutes params driver-side.
* feature logging (``ltr_log``) — :func:`log_features`. Every
  feature of the set compiles into the SHARED query forest
  (``querystring.forest_scores``), so logging F features costs ONE
  postings scan + ONE groupBy(doc_id) shuffle, not F of either. The
  per-feature scored frames union with a feature tag and pivot to a
  wide (doc_id, f1..fF) matrix in one more shuffle — at 100 TB the
  whole logging pass is two exchanges regardless of feature count.
  Unmatched features log 0.0 (the plugin's documented default).
* model — :class:`LinearModel` (the plugin's ``model/linear`` type):
  driver-held weights, scored as ONE native expression
  (:func:`sltr_score`); and :class:`TreeEnsembleModel` (the plugin's
  ``model/xgboost`` type): each regression tree of the uploaded
  xgboost dump compiles to one nested CASE expression over the
  feature columns — the predict loop restated as a Catalyst
  expression tree, whole-stage codegen, no UDF. Both duck-type on
  ``.expr()``, so every ``sltr_*`` entry point takes either.
* training — :func:`train_linear`: ridge regression by normal
  equations. The (F×F) Gram matrix and (F) moment vector reduce in
  ONE aggregation job (F(F+1)/2 + F native sums — feature counts are
  small by design), then solve on the driver with numpy. Offline
  trainers (RankLib, XGBoost) are external to the plugin too; what
  ships here is the deterministic closed-form baseline.
* ``sltr`` rescore — :func:`sltr_rescore`: score the model over the
  top-``window`` docs of a base ranking only (the plugin's standard
  deployment: cheap BM25 recall, LTR precision re-rank). The window
  is k-bounded metadata, so feature scoring joins against a
  broadcast-sized id set.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .build import PostingsIndex
from .querystring import forest_scores


def instantiate(obj, params: dict[str, str]):
    """Recursive ``{{param}}`` substitution over a query template —
    the Mustache subset the LTR plugin actually uses (plain variable
    interpolation)."""
    if isinstance(obj, str):
        out = obj
        for k, v in params.items():
            out = out.replace("{{" + k + "}}", str(v))
        return out
    if isinstance(obj, dict):
        return {k: instantiate(v, params) for k, v in obj.items()}
    if isinstance(obj, list):
        return [instantiate(v, params) for v in obj]
    return obj


def log_features(ix: PostingsIndex, featureset: list[dict],
                 params: dict[str, str],
                 doc_filter: DataFrame | None = None,
                 text_field: str = "text") -> DataFrame:
    """Feature-logging pass: ``(doc_id, <feature name>...)`` with one
    double column per feature of the set.

    All feature queries execute as ONE forest (single postings scan,
    single groupBy) and pivot to the wide matrix in one further
    shuffle. Rows = union of docs matched by any feature, or exactly
    ``doc_filter`` (a (doc_id) frame) when given — the ``sltr``
    logging filter. Unmatched features are 0.0."""
    from .searchbody import compile_query

    names = [f["name"] for f in featureset]
    if len(set(names)) != len(names):
        raise ValueError("duplicate feature names in featureset")
    trees = [compile_query(instantiate(f["template"], params),
                           text_field)
             for f in featureset]
    scored, shared = forest_scores(ix, trees)
    tagged = []
    for name, df in zip(names, scored):
        if df is None:      # match_all-shaped feature: constant 1.0
            df = ix.docs.select("doc_id").withColumn(
                "score", F.lit(1.0))
        tagged.append(df.select(
            "doc_id", F.lit(name).alias("__feat"), "score"))
    unioned = tagged[0]
    for t in tagged[1:]:
        unioned = unioned.unionByName(t)
    wide = (
        unioned.groupBy("doc_id")
        .pivot("__feat", names)
        .agg(F.first("score"))
        .na.fill(0.0, names)
    )
    if doc_filter is not None:
        ids = doc_filter.select("doc_id")
        wide = ids.join(wide, "doc_id", "left").na.fill(0.0, names)
    if shared is not None:
        shared.unpersist()
    return wide


@dataclass
class LinearModel:
    """The plugin's ``model/linear`` type: named weights + intercept.
    Driver metadata — scoring is a literal expression, never a join."""

    weights: dict[str, float]
    intercept: float = 0.0

    def expr(self):
        out = F.lit(float(self.intercept))
        for name, w in self.weights.items():
            out = out + F.lit(float(w)) * F.coalesce(
                F.col(name), F.lit(0.0))
        return out


def _tree_expr(node: dict):
    """One xgboost dump node -> a native Column.  Split semantics
    mirrored exactly: ``feature < split_condition`` -> ``yes`` child,
    else ``no``; a NULL feature follows the ``missing`` child."""
    if "leaf" in node:
        return F.lit(float(node["leaf"]))
    kids = {c["nodeid"]: c for c in node["children"]}
    yes_id, no_id = node["yes"], node["no"]
    miss_id = node.get("missing", yes_id)
    if miss_id not in (yes_id, no_id):
        raise ValueError(
            f"node {node.get('nodeid')}: missing={miss_id} is "
            "neither the yes nor the no child")
    yes = _tree_expr(kids[yes_id])
    no = _tree_expr(kids[no_id])
    feat = F.col(str(node["split"])).cast("double")
    miss = yes if miss_id == yes_id else no
    # xgboost treats NaN exactly like missing -- NULL alone would
    # route NaN to the 'no' child (NaN < x is false in Spark)
    return (F.when(feat.isNull() | F.isnan(feat), miss)
            .when(feat < F.lit(float(node["split_condition"])), yes)
            .otherwise(no))


@dataclass
class TreeEnsembleModel:
    """The plugin's ``model/xgboost`` type: the uploaded model is a
    JSON array of regression trees in the xgboost dump format
    (``{"nodeid", "split", "split_condition", "yes", "no",
    "missing", "children": [...]}``, leaves ``{"leaf": v}``).
    Score = base_score + Σ per-tree leaf values.

    Scoring is ONE native expression: each tree becomes a nested
    CASE over the logged feature columns — query metadata, codegen,
    no UDF, no join, model size bounded by the plugin's own upload
    limits."""

    trees: list[dict]
    base_score: float = 0.0

    @classmethod
    def from_xgboost(cls, dump, base_score: float = 0.0
                     ) -> "TreeEnsembleModel":
        """Accepts the raw dump string/list, the plugin's upload
        envelope at ANY nesting depth (``_createmodel`` posts
        ``{"model": {"name": ..., "model": {"type": ...,
        "definition": ...}}}``), and the object definition form
        ``{"objective": ..., "splits": [...]}``."""
        import json

        obj = json.loads(dump) if isinstance(dump, str) else dump
        while isinstance(obj, dict):
            if "definition" in obj:
                obj = obj["definition"]
                if isinstance(obj, str):
                    obj = json.loads(obj)
            elif "model" in obj:
                obj = obj["model"]
            elif "splits" in obj:
                obj = obj["splits"]
            else:
                raise ValueError(
                    "unrecognized xgboost model envelope: expected "
                    "a tree array, 'definition', 'model' or 'splits'")
        return cls(list(obj), float(base_score))

    def expr(self):
        out = F.lit(float(self.base_score))
        for t in self.trees:
            out = out + _tree_expr(t)
        return out


def sltr_score(features: DataFrame, model: LinearModel) -> DataFrame:
    """Apply the model over a logged feature matrix: adds ``_ltr``."""
    return features.withColumn("_ltr", model.expr())


def sltr_topk(ix: PostingsIndex, featureset: list[dict],
              params: dict[str, str], model: LinearModel, k: int = 10,
              doc_filter: DataFrame | None = None,
              text_field: str = "text") -> DataFrame:
    """The ``sltr`` query as a primary ranking: log features (one
    forest pass), score the model, TakeOrdered k."""
    feats = log_features(ix, featureset, params, doc_filter, text_field)
    return (
        sltr_score(feats, model)
        .select("doc_id", F.col("_ltr").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def sltr_rescore(ix: PostingsIndex, base_scored: DataFrame,
                 featureset: list[dict], params: dict[str, str],
                 model: LinearModel, window: int = 50, k: int = 10,
                 query_weight: float = 0.0, rescore_weight: float = 1.0,
                 text_field: str = "text") -> DataFrame:
    """LTR in its standard deployment: re-rank the top-``window`` of
    a base (doc_id, score) ranking with the model; outside the window
    the base order is unchanged (only the window is returned, as with
    the body ``rescore`` surface). Final score =
    ``query_weight·base + rescore_weight·ltr``."""
    top = (base_scored.orderBy(F.desc("score"), F.asc("doc_id"))
           .limit(window))
    feats = log_features(ix, featureset, params,
                         doc_filter=top.select("doc_id"),
                         text_field=text_field)
    rescored = (
        top.join(F.broadcast(feats), "doc_id", "left")
        .na.fill(0.0, [f["name"] for f in featureset])
        .withColumn("_ltr", model.expr())
        .select("doc_id",
                (F.lit(query_weight) * F.col("score")
                 + F.lit(rescore_weight) * F.col("_ltr")).alias("score"))
    )
    return rescored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def train_linear(features: DataFrame, judgments: DataFrame,
                 names: list[str], label_col: str = "grade",
                 l2: float = 1e-6) -> LinearModel:
    """Closed-form ridge fit of a linear model on logged features vs
    judgment grades: ONE native aggregation reduces the Gram matrix
    X'X and moments X'y (F(F+1)/2 + F sums over the judged rows —
    judgment sets are small relative to the corpus but this works at
    any size), then the (F+1)×(F+1) normal equations solve on the
    driver. Deterministic — no SGD, no seed."""
    import numpy as np

    rows = features.join(judgments, "doc_id")
    cols = [F.coalesce(F.col(n), F.lit(0.0)) for n in names]
    y = F.col(label_col).cast("double")
    aggs = [F.count("*").alias("_n"), F.sum(y).alias("_sy")]
    for i, ci in enumerate(cols):
        aggs.append(F.sum(ci).alias(f"_s{i}"))
        aggs.append(F.sum(ci * y).alias(f"_sy{i}"))
        for j, cj in enumerate(cols[i:], start=i):
            aggs.append(F.sum(ci * cj).alias(f"_g{i}_{j}"))
    row = rows.agg(*aggs).collect()[0]

    k = len(names)
    # augmented design [1, x1..xk]: normal equations (A + l2*I) w = b
    a = np.zeros((k + 1, k + 1))
    b = np.zeros(k + 1)
    a[0, 0] = row["_n"]
    b[0] = row["_sy"]
    for i in range(k):
        a[0, i + 1] = a[i + 1, 0] = row[f"_s{i}"]
        b[i + 1] = row[f"_sy{i}"]
        for j in range(i, k):
            a[i + 1, j + 1] = a[j + 1, i + 1] = row[f"_g{i}_{j}"]
    reg = l2 * np.eye(k + 1)
    reg[0, 0] = 0.0           # don't penalize the intercept
    w = np.linalg.solve(a + reg, b)
    if not all(math.isfinite(x) for x in w):
        raise ValueError("singular feature matrix — drop a feature")
    return LinearModel(
        weights={n: float(w[i + 1]) for i, n in enumerate(names)},
        intercept=float(w[0]))
