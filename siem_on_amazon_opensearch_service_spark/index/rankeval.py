"""``_rank_eval`` — search-relevance evaluation over judged queries.

Reference semantics target: the OpenSearch Ranking Evaluation API
(public semantics; the SIEM repo tunes its saved searches against it
operationally — no repo code, behavior target like the query DSL).
A request carries N templated queries, each with graded relevance
judgments; the response is a per-query and overall metric score for
one of: precision@k, recall@k, mean reciprocal rank, (n)DCG@k.

Spark restatement: the N query bodies execute through the
``_msearch`` forest (ONE postings scan + ONE shuffle for the whole
eval set — an eval run with 1,000 judged queries costs one decode
pass, which is what makes sweeping k1/b grids viable at corpus
scale).  The per-query hit pages are k-row fragments; they union into
a single (request_id, rank, doc_id) frame joined once against the
ratings table, and every metric is a groupBy(request_id) of native
conditional aggregates.

Metric definitions (OpenSearch defaults):

* precision@k  = relevant_retrieved / retrieved, unrated docs count
  as non-relevant (``ignore_unlabeled=False``).
* recall@k     = relevant_retrieved / total_relevant.
* MRR          = 1 / rank of the first relevant hit (0 if none).
* DCG@k        = Σ (2^rating − 1) / log2(rank + 1); with
  ``normalize`` the ideal DCG comes from the ratings themselves
  (top-k ratings sorted desc) — NDCG.

``relevant`` means rating ≥ relevant_rating_threshold (default 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .build import PostingsIndex
from .msearch import msearch
from .searchbody import DEFAULT_TEXT_FIELD

_METRICS = ("precision", "recall", "mean_reciprocal_rank", "dcg")


def _ratings_df(spark: SparkSession, requests: list[dict]) -> DataFrame:
    rows = [
        (r["id"], int(d), int(g))
        for r in requests
        for d, g in (r.get("ratings") or [])
    ]
    return spark.createDataFrame(
        rows or [("", -1, 0)],
        "request_id string, doc_id long, rating int",
    ).filter(F.col("doc_id") >= 0)


def rank_eval(
    ix: PostingsIndex,
    requests: list[dict],
    metric: dict | None = None,
    positional_ix: PostingsIndex | None = None,
    text_field: str = DEFAULT_TEXT_FIELD,
) -> dict:
    """Evaluate ``requests`` (each ``{"id", "request": <search body>,
    "ratings": [(doc_id, rating), ...]}``) under ``metric`` (one key
    from precision / recall / mean_reciprocal_rank / dcg with its
    params).  Returns ``{"metric_score": float, "details": DataFrame
    (request_id, metric_score, relevant_retrieved, retrieved,
    total_relevant)}`` — details stay a DataFrame so a million-query
    sweep never lands on the driver."""
    metric = metric or {"precision": {"k": 10}}
    if len(metric) != 1:
        raise ValueError("metric must have exactly one key")
    mname, mp = next(iter(metric.items()))
    if mname not in _METRICS:
        raise ValueError(f"unknown metric {mname!r}")
    k = int(mp.get("k", 10))
    thr = int(mp.get("relevant_rating_threshold", 1))
    normalize = bool(mp.get("normalize", mname == "dcg" and False))

    spark = ix.docs.sparkSession
    if any("sort" in r["request"] for r in requests):
        raise ValueError("rank_eval judges RELEVANCE order; "
                         "custom sort in a request body is not rankable")
    bodies = [dict(r["request"], size=k) for r in requests]
    resp = msearch(ix, bodies, positional_ix=positional_ix,
                   text_field=text_field)

    # union the k-row hit pages into one (request_id, rank, doc_id)
    # frame: per-page rank is a window over ≤k rows, metadata-sized.
    hits = None
    for req, r in zip(requests, resp.responses):
        h = r["hits"].select(
            F.lit(req["id"]).alias("request_id"),
            F.col("doc_id").cast("long"),
            F.col("score"),
        )
        hits = h if hits is None else hits.unionByName(h)
    w = Window.partitionBy("request_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    hits = hits.withColumn("rank", F.row_number().over(w)).drop("score")

    ratings = _ratings_df(spark, requests)
    judged = hits.join(ratings, ["request_id", "doc_id"], "left")
    rel = (F.col("rating") >= thr).cast("int")

    per_req = judged.groupBy("request_id").agg(
        F.sum(F.coalesce(rel, F.lit(0))).alias("relevant_retrieved"),
        F.count("*").alias("retrieved"),
        F.min(F.when(F.coalesce(rel, F.lit(0)) == 1, F.col("rank")))
        .alias("first_rel_rank"),
        F.sum(
            (F.pow(F.lit(2.0), F.coalesce(F.col("rating"), F.lit(0))) - 1.0)
            / F.log2(F.col("rank") + 1)
        ).alias("dcg"),
    )
    totals = ratings.filter(F.col("rating") >= thr).groupBy(
        "request_id").agg(F.count("*").alias("total_relevant"))

    # ideal DCG from the judgments themselves (top-k ratings desc)
    iw = Window.partitionBy("request_id").orderBy(
        F.desc("rating"), F.asc("doc_id"))
    ideal = (
        ratings.withColumn("irank", F.row_number().over(iw))
        .filter(F.col("irank") <= k)
        .groupBy("request_id")
        .agg(F.sum(
            (F.pow(F.lit(2.0), F.col("rating")) - 1.0)
            / F.log2(F.col("irank") + 1)
        ).alias("idcg"))
    )

    # every request appears even with an empty hit page
    ids = spark.createDataFrame([(r["id"],) for r in requests],
                                "request_id string")
    full = (
        ids.join(per_req, "request_id", "left")
        .join(totals, "request_id", "left")
        .join(ideal, "request_id", "left")
        .na.fill({"relevant_retrieved": 0, "retrieved": 0,
                  "total_relevant": 0, "dcg": 0.0, "idcg": 0.0})
    )
    if mname == "precision":
        score = F.when(F.col("retrieved") > 0,
                       F.col("relevant_retrieved") / F.col("retrieved")
                       ).otherwise(F.lit(0.0))
    elif mname == "recall":
        score = F.when(F.col("total_relevant") > 0,
                       F.col("relevant_retrieved") / F.col("total_relevant")
                       ).otherwise(F.lit(0.0))
    elif mname == "mean_reciprocal_rank":
        score = F.coalesce(1.0 / F.col("first_rel_rank"), F.lit(0.0))
    else:  # dcg
        score = (F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
                 .otherwise(F.lit(0.0))) if normalize else F.col("dcg")

    details = full.select(
        "request_id",
        F.round(score, 6).alias("metric_score"),
        "relevant_retrieved", "retrieved", "total_relevant",
    )
    overall = details.agg(F.avg("metric_score")).collect()[0][0]
    resp.release()
    return {"metric_score": round(float(overall or 0.0), 6),
            "details": details}
