"""search_template rendering/execution, match_bool_prefix
(search-as-you-type), and the rate metric agg."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex, build_index,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    run_aggs, search_body,
)
from siem_on_amazon_opensearch_service_spark.index.templates import (
    TemplateRegistry, render_template, search_template,
)

N = 200


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    pdf = corpus.make_pages_pdf(N, seed=7)
    pdf.insert(0, "doc_id", range(len(pdf)))
    built = build_index(spark, spark.createDataFrame(pdf),
                        id_col="doc_id", salt_threshold=60)
    path = str(tmp_path_factory.mktemp("tpl_ix"))
    built.save(spark, path, buckets=4)
    return PostingsIndex.load(spark, path)


# ---------------------------------------------------------------------------
# templates
# ---------------------------------------------------------------------------

def test_render_variables_and_defaults():
    src = ('{"query": {"match": {"text": "{{kw}}"}}, '
           '"size": {{size}}{{^size}}10{{/size}}}')
    assert render_template(src, {"kw": "hello", "size": 3}) == {
        "query": {"match": {"text": "hello"}}, "size": 3}
    assert render_template(src, {"kw": "a b"})["size"] == 10


def test_render_tojson_splices_lists():
    src = '{"query": {"terms": {"lang": {{#toJson}}langs{{/toJson}}}}}'
    assert render_template(src, {"langs": ["en", "de"]}) == {
        "query": {"terms": {"lang": ["en", "de"]}}}


def test_render_invalid_json_raises():
    with pytest.raises(ValueError, match="invalid JSON"):
        render_template('{"size": {{size}}}', {})


def test_search_template_matches_direct_body(ix):
    src = ('{"query": {"match": {"text": "{{kw}}"}}, '
           '"size": {{size}}{{^size}}10{{/size}}}')
    got = search_template(ix, {"kw": "w00001 w00057", "size": 5},
                          source=src)["hits"].collect()
    want = search_body(ix, {"query": {
        "match": {"text": "w00001 w00057"}}, "size": 5})["hits"].collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 5


def test_stored_template_registry(ix):
    reg = TemplateRegistry()
    reg.put("top", '{"query": {"match": {"text": "{{kw}}"}}, "size": 3}')
    got = search_template(ix, {"kw": "w00002"}, template_id="top",
                          registry=reg)["hits"].collect()
    assert len(got) == 3
    reg.delete("top")
    with pytest.raises(KeyError):
        search_template(ix, {}, template_id="top", registry=reg)


# ---------------------------------------------------------------------------
# match_bool_prefix
# ---------------------------------------------------------------------------

def test_match_bool_prefix_equals_desugared_bool(ix):
    got = search_body(ix, {"query": {"match_bool_prefix": {
        "text": "w00001 w0005"}}, "size": 20})["hits"].collect()
    want = search_body(ix, {"query": {"bool": {"should": [
        {"term": {"text": "w00001"}},
        {"prefix": {"text": "w0005"}},
    ]}}, "size": 20})["hits"].collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got


def test_match_bool_prefix_trailing_space_completes_word(ix):
    # "w00001 " — the last word is complete, so it matches as a TERM
    got = search_body(ix, {"query": {"match_bool_prefix": {
        "text": {"query": "w00057 w00001 "}}}, "size": 20})
    want = search_body(ix, {"query": {"match": {
        "text": "w00057 w00001"}}, "size": 20})
    assert ([tuple(r) for r in got["hits"].collect()]
            == [tuple(r) for r in want["hits"].collect()])


# ---------------------------------------------------------------------------
# rate metric
# ---------------------------------------------------------------------------

def test_rate_metric_vs_pandas(spark):
    rows = [(i, f"2024-01-01 {i % 48 // 2:02d}:{(i % 2) * 30:02d}:00",
             float(i % 7)) for i in range(400)]
    df = (spark.createDataFrame(rows, "doc_id long, ts string, v double")
          .withColumn("ts", F.to_timestamp("ts")))
    out = run_aggs(df, {"per_2h": {
        "date_histogram": {"field": "ts", "fixed_interval": "2h"},
        "aggs": {
            "per_min": {"rate": {"field": "v", "unit": "minute"}},
            "docs_per_h": {"rate": {"unit": "hour"}},
        },
    }})["per_2h"].toPandas().sort_values("per_2h")

    pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "v"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["b"] = pdf["ts"].dt.floor("2h")
    want = pdf.groupby("b").agg(sv=("v", "sum"), n=("v", "size"))
    for _, r in out.iterrows():
        w = want.loc[pd.Timestamp(r["per_2h"])]
        assert r["per_min"] == pytest.approx(w["sv"] / 120.0)
        assert r["docs_per_h"] == pytest.approx(w["n"] / 2.0)


def test_rate_requires_date_histogram(spark):
    df = spark.createDataFrame([(1, "a", 1.0)],
                               "doc_id long, lang string, v double")
    with pytest.raises(ValueError, match="date_histogram"):
        run_aggs(df, {"by_lang": {
            "terms": {"field": "lang"},
            "aggs": {"r": {"rate": {"field": "v", "unit": "hour"}}},
        }})["by_lang"].collect()


def test_rate_rejects_variable_calendar(spark):
    df = (spark.createDataFrame([(1, "2024-01-01 00:00:00", 1.0)],
                                "doc_id long, ts string, v double")
          .withColumn("ts", F.to_timestamp("ts")))
    with pytest.raises(ValueError, match="calendar"):
        run_aggs(df, {"per_m": {
            "date_histogram": {"field": "ts",
                               "calendar_interval": "month"},
            "aggs": {"r": {"rate": {"unit": "day"}}},
        }})["per_m"].collect()


def test_msearch_template_matches_search_template(spark, ix):
    from siem_on_amazon_opensearch_service_spark.index.msearch import (
        msearch,
    )
    from siem_on_amazon_opensearch_service_spark.index.templates import (
        TemplateRegistry, msearch_template, render_template,
    )

    reg = TemplateRegistry()
    reg.put("q", '{"query": {"match": {"text": "{{q}}"}}, '
                 '"size": {{size}}}')
    entries = [
        {"id": "q", "params": {"q": "w00001 w00057", "size": 3}},
        {"source": '{"query": {"term": {"lang": "{{l}}"}}, "size": 2}',
         "params": {"l": "en"}},
    ]
    res = msearch_template(ix, entries, registry=reg)
    bodies = [render_template(reg.get("q"),
                              {"q": "w00001 w00057", "size": 3}),
              render_template(entries[1]["source"], {"l": "en"})]
    twin = msearch(ix, bodies)
    try:
        for got, exp in zip(res.responses, twin.responses):
            assert [(r.doc_id, r.score) for r in got["hits"].collect()] \
                == [(r.doc_id, r.score) for r in exp["hits"].collect()]
    finally:
        res.release()
        twin.release()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        msearch_template(ix, [{"id": "q"}])
