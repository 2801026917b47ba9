"""Metadata endpoints: _field_caps / _mapping read-back / _cat/indices
over saved index roots (counts, deletes, store bytes, PIT tagging)."""

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import (
    PostingsIndex,
    build_index,
)
from siem_on_amazon_opensearch_service_spark.index.metadata import (
    cat_indices,
    field_caps,
    get_mapping,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    with_runtime_mappings,
)
from siem_on_amazon_opensearch_service_spark.index.tombstones import (
    delete_docs,
)

N = 120


@pytest.fixture(scope="module")
def saved(spark, tmp_path_factory):
    pdf = corpus.make_pages_pdf(N, seed=11)
    pdf.insert(0, "doc_id", range(len(pdf)))
    path = str(tmp_path_factory.mktemp("meta_ix"))
    build_index(spark, spark.createDataFrame(pdf), id_col="doc_id",
                salt_threshold=60).save(spark, path, buckets=2)
    return path


def test_field_caps_and_mapping(spark, saved):
    ix = PostingsIndex.load(spark, saved)
    caps = field_caps(ix)
    assert caps["text"] == {"text": {"type": "text", "searchable": True,
                                     "aggregatable": False}}
    assert caps["lang"]["keyword"]["aggregatable"] is True
    assert caps["warc_ts"]["date"]["type"] == "date"
    assert "html" not in caps  # raw bytes are not kept in the docs table
    assert caps["doclen"]["integer"]["searchable"] is True

    # field selection + unknown-field error
    sel = field_caps(ix, fields=["url", "lang"])
    assert set(sel) == {"url", "lang"}
    with pytest.raises(ValueError, match="unknown fields"):
        field_caps(ix, fields=["nope"])

    # runtime fields derived onto the handle surface in caps
    rt = with_runtime_mappings(ix, {
        "dl2": {"type": "long", "script": {"source": "doclen * 2"}}})
    assert field_caps(rt)["dl2"]["long"]["aggregatable"] is True

    m = get_mapping(ix)["mappings"]["properties"]
    assert m["text"] == {"type": "text"}
    assert m["warc_ts"] == {"type": "date"}


def test_cat_indices(spark, saved):
    rows = cat_indices(spark, {"web": saved})
    (r,) = rows
    assert r["index"] == "web" and r["docs_count"] == N
    assert r["docs_deleted"] == 0 and r["store_bytes"] > 0

    delete_docs(spark, saved, [0, 1, 2])
    r = cat_indices(spark, {"web": saved})[0]
    assert r["docs_deleted"] == 3 and r["docs_count"] == N
    r = cat_indices(spark, {"web": saved}, live_counts=True)[0]
    assert r["docs_count"] == N - 3

    with pytest.raises(ValueError, match="no index"):
        cat_indices(spark, {"x": saved + "/nope"})


def test_analyze_api():
    from siem_on_amazon_opensearch_service_spark.analysis import (
        tokenize_py,
    )
    from siem_on_amazon_opensearch_service_spark.analysis_ext import (
        analyze_text,
        py_analyzed_tokens,
    )

    text = "The Quick brown-Fox, JUMPS over 2 lazy dogs!"
    stream = analyze_text(text)
    # token identity with the indexing analyzer
    assert [t["token"] for t in stream] == tokenize_py(text)
    # offsets slice the (lowered) input back out
    low = text.lower()
    for t in stream:
        assert low[t["start_offset"]:t["end_offset"]] == t["token"]
    assert [t["position"] for t in stream] == list(range(len(stream)))

    # filter chain parity with the distributed twin
    chain = analyze_text(text, stopwords=["the", "over"], stem=True)
    assert [t["token"] for t in chain] == py_analyzed_tokens(
        text, stopwords=["the", "over"], stem=True)
    assert analyze_text("") == []


def test_termvectors(spark, saved):
    from collections import Counter

    from siem_on_amazon_opensearch_service_spark.analysis import (
        tokenize_py,
    )
    from siem_on_amazon_opensearch_service_spark.index.metadata import (
        termvectors,
    )

    pdf = corpus.make_pages_pdf(N, seed=11)
    pdf.insert(0, "doc_id", range(len(pdf)))
    source = spark.createDataFrame(pdf[["doc_id", "text"]])
    ix = PostingsIndex.load(spark, saved)

    tv = termvectors(ix, source, 5)
    toks = tokenize_py(pdf["text"][5])
    want_tf = Counter(toks)
    assert {t: e["term_freq"] for t, e in tv["terms"].items()} == want_tf
    assert tv["doc_count"] == N
    # every term the doc contains is in the index: df >= 1
    assert all(e["doc_freq"] >= 1 for e in tv["terms"].values())
    # positions enumerate the token stream
    poss = sorted(p["position"] for e in tv["terms"].values()
                  for p in e["tokens"])
    assert poss == list(range(len(toks)))

    with pytest.raises(ValueError, match="not found"):
        termvectors(ix, source, 10_000)


def test_terms_enum_vocab_and_keyword(spark, saved):
    from siem_on_amazon_opensearch_service_spark.index.metadata import (
        terms_enum,
    )

    ix = PostingsIndex.load(spark, saved)
    # text field: term-dictionary walk, sorted, prefix-pushed
    got = [r.term for r in terms_enum(ix, "text", string="s").collect()]
    assert got == sorted(got) and all(t.startswith("s") for t in got)
    assert 0 < len(got) <= 10
    # search_after pages strictly past the cursor
    nxt = [r.term for r in terms_enum(ix, "text", string="s",
                                      search_after=got[-1]).collect()]
    assert all(t > got[-1] for t in nxt)
    # keyword column: distinct values, case-insensitive prefix
    langs = [r.term for r in
             terms_enum(ix, "lang", string="E",
                        case_insensitive=True, size=5).collect()]
    assert langs == sorted(set(langs))
    assert all(v.lower().startswith("e") for v in langs)
