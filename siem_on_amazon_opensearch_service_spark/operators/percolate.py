"""Percolator: match a batch of documents against a TABLE of stored
queries (reverse search) — OpenSearch's ``percolate`` query, the
primitive behind saved-search alerting (the reference ships scheduled
monitors under ``opensearch_alert_config/``; a percolator evaluates
the same rule set per incoming document instead of per schedule).

Stored-query model: each rule is an analyzed ``match`` query —
(query_id, query_text, operator, minimum_should_match). ``operator``
is ``and`` (every term must appear — OpenSearch
``match.operator: and``) or ``or`` with ``minimum_should_match``
(at least m distinct query terms appear).

Spark restatement (one DAG, no per-rule loop):

* Rules tokenize Spark-side into (query_id, term) pairs plus a
  per-rule term count — rule sets are thousands of rows, metadata
  next to the corpus, so the pair table BROADCASTS.
* Documents tokenize once (native expressions), explode to DISTINCT
  (doc_id, term) pairs, and join the broadcast rule-term table on
  ``term`` — the same "only terms the queries mention survive the
  scan" pruning Lucene's percolator gets from its query-term index;
  docs sharing no vocabulary with any rule are dropped at the join.
* One hash aggregate on (doc_id, query_id) counts matched distinct
  terms; the rule's threshold (all / >= m) filters the result.

The shuffle is keyed on actual (doc, rule) candidate matches — not
|docs| x |rules| — so selective rule vocabularies stay cheap at
100 TB; a rule matching everything costs what its match set costs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import tokens_col


def percolate(docs: DataFrame, rules: DataFrame,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Match every document in ``docs`` against every stored rule.

    ``rules`` columns: query_id (any type), query (string),
    operator ('and' | 'or'), msm (int, minimum_should_match — used
    when operator='or'; an 'and' rule ignores it).

    Returns (doc_id, query_id, n_matched, n_terms) for each
    (document, rule) pair whose threshold is met, i.e. the rules that
    would fire for each document.
    """
    rule_terms = (
        rules.select(
            "query_id", "operator", "msm",
            F.explode(F.array_distinct(tokens_col("query"))).alias("term"),
        )
    )
    rule_sizes = rule_terms.groupBy("query_id", "operator", "msm").agg(
        F.count("*").alias("n_terms"))

    doc_terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens_col(text_col))).alias("term"),
    )
    matched = (
        doc_terms.join(F.broadcast(rule_terms.select("query_id", "term")),
                       "term")
        .groupBy("doc_id", "query_id")
        .agg(F.count("*").alias("n_matched"))
    )
    fired = (
        matched.join(F.broadcast(rule_sizes), "query_id")
        .filter(
            F.when(F.col("operator") == "and",
                   F.col("n_matched") == F.col("n_terms"))
            .otherwise(F.col("n_matched") >= F.col("msm"))
        )
    )
    return fired.select("doc_id", "query_id", "n_matched", "n_terms")


def percolate_query_strings(docs: DataFrame,
                            rules: list[tuple[object, str]],
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            default_operator: str = "OR") -> DataFrame:
    """Percolate FULL query_string rules — the form the reference's
    saved searches / monitors actually take (``eventName:(A OR B) AND
    NOT errorCode:*`` style) — against a document batch.

    ``rules``: driver-held ``(query_id, query_string)`` list (rule
    sets are metadata). Each rule parses ONCE on the driver and
    compiles to a native boolean over the doc's token array + field
    columns (`index/querystring.py:tokens_tree_predicate`); all rules
    evaluate in ONE whole-stage-codegen projection — no join, no
    per-rule job, cost |docs| x (cheap native predicates). For
    vocabulary-selective mega rule sets, the broadcast-join pruning
    :func:`percolate` remains the other physical strategy.

    Returns (doc_id, query_id) pairs for every rule that fires.
    """
    from ..index.querystring import (
        parse_query_string, tokens_tree_predicate,
    )

    toks = F.col("__toks")
    fired = F.array(*[
        F.when(
            tokens_tree_predicate(
                parse_query_string(q, default_operator=default_operator),
                toks),
            F.lit(str(qid)),
        )
        for qid, q in rules
    ])
    return (
        docs.withColumn("__toks", tokens_col(text_col))
        .select(
            F.col(id_col),
            F.explode(F.filter(fired, lambda x: x.isNotNull()))
            .alias("query_id"),
        )
    )


def doc_level_monitor(docs: DataFrame, rules: list[tuple[object, str]],
                      path: str, ts_col: str = "warc_ts",
                      text_col: str = "text", id_col: str = "doc_id",
                      default_operator: str = "OR") -> dict:
    """Alerting-plugin *document-level monitor* execution: percolate
    only documents newer than the stored checkpoint against the
    monitor's query_string rules, append the per-document *findings*
    (the plugin's finding index), and advance the checkpoint — so
    repeated executions over a growing corpus alert on each document
    exactly once (the doc-level monitor contract, vs the bucket-level
    monitor in ``streaming/alerting.py``).

    Scale shape: the delta filter is a time predicate (partition
    pruning on an ingest-time layout); percolation is the one-codegen-
    projection path of :func:`percolate_query_strings`; findings are
    O(matches) appends. Returns {"new_docs": n, "findings": m,
    "watermark": ts}.
    """
    import json
    import os

    state_file = os.path.join(path, "_monitor.json")
    state = (json.load(open(state_file))
             if os.path.exists(state_file) else {"watermark": None})
    ts = F.col(ts_col).cast("timestamp")
    delta = (docs if state["watermark"] is None
             else docs.filter(ts > F.lit(state["watermark"])
                              .cast("timestamp")))
    hi = delta.agg(F.max(ts).cast("string").alias("hi"),
                   F.count("*").alias("n")).collect()[0]
    if not hi["n"]:
        return {"new_docs": 0, "findings": 0,
                "watermark": state["watermark"]}
    found = percolate_query_strings(
        delta, rules, text_col=text_col, id_col=id_col,
        default_operator=default_operator).persist()
    out_dir = os.path.join(path, "findings")
    found.write.mode("append").parquet(out_dir)
    m = found.count()
    found.unpersist()
    os.makedirs(path, exist_ok=True)
    with open(state_file, "w") as f:
        json.dump({"watermark": hi["hi"]}, f)
    return {"new_docs": int(hi["n"]), "findings": int(m),
            "watermark": hi["hi"]}
