"""Hot-term skew guard: salting must bound per-reducer group sizes
(SURVEY.md section 7.3 item 2 — the Zipf-head stopword problem)."""

from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import build_index

THRESHOLD = 60


def test_salted_groups_bounded_and_disjoint(spark):
    pdf = corpus.make_pages_pdf(400, seed=29)
    pdf.insert(0, "doc_id", range(len(pdf)))
    ix = build_index(spark, spark.createDataFrame(pdf), id_col="doc_id",
                     salt_threshold=THRESHOLD)
    ix.postings = ix.postings.persist()

    per_group = (
        ix.postings.groupBy("term", "salt")
        .agg(F.sum("doc_count").alias("n"))
        .persist()
    )
    # Every (term, salt) reducer group is bounded: expected size is
    # ~df/n_salts ~= THRESHOLD; hash imbalance allows slack but no
    # group may approach the unsalted hot-term size (the Zipf head is
    # several hundred docs here).
    mx = per_group.agg(F.max("n")).collect()[0][0]
    assert mx <= 2 * THRESHOLD, mx

    # hot terms really are split across multiple salts
    n_salts = (
        per_group.groupBy("term").agg(F.countDistinct("salt").alias("s"))
        .agg(F.max("s")).collect()[0][0]
    )
    assert n_salts >= 3

    # salts of one term partition the doc space (df == sum over salts;
    # no doc counted twice): term_stats df must equal the true df.
    import re

    def toks(t):
        return set(re.split(r"[^a-z0-9]+", t.lower())) - {""}

    true_df = {}
    for r in pdf.itertuples():
        for t in toks(r.text):
            true_df[t] = true_df.get(t, 0) + 1
    got = {r["term"]: r["df"] for r in ix.term_stats.collect()}
    assert got == true_df
