"""Generic XML source (xmltodict path projection) and prefix/wildcard
multi-term queries."""

import pytest

from siem_on_amazon_opensearch_service_spark import corpus
from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.boolquery import multiterm_topk
from siem_on_amazon_opensearch_service_spark.sources import xmlfmt


def test_parse_xml_paths(spark):
    xmls = [
        ("<event type='login'><user id='7'>alice</user>"
         "<host>web1</host></event>",),
        ("<event type='logout'><user id='9'>bob</user></event>",),
        ("not xml at <<<",),
    ]
    df = spark.createDataFrame(xmls, "xml string")
    out = xmlfmt.parse_xml_paths(
        df, "xml",
        {
            "etype": "event.@type",
            "user": "event.user.#text",
            "uid": "event.user.@id",
            "host": "event.host",
        },
    ).collect()
    by = {r["etype"]: r for r in out if not r["_xml_error"]}
    assert by["login"]["user"] == "alice" and by["login"]["uid"] == "7"
    assert by["login"]["host"] == "web1"
    assert by["logout"]["user"] == "bob" and by["logout"]["host"] is None
    errs = [r for r in out if r["_xml_error"]]
    assert len(errs) == 1 and errs[0]["user"] is None


@pytest.fixture(scope="module")
def small_ix(spark):
    pdf = corpus.make_pages_pdf(200, seed=17)
    pdf.insert(0, "doc_id", range(len(pdf)))
    ix = build_index(spark, spark.createDataFrame(pdf),
                     id_col="doc_id", salt_threshold=50)
    ix.postings = ix.postings.persist()
    ix.postings.count()
    return pdf, ix


def test_prefix_match(spark, small_ix):
    pdf, ix = small_ix
    import re

    def toks(t):
        return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]

    exp = sorted(
        r.doc_id for r in pdf.itertuples()
        if any(t.startswith("salt1") for t in toks(r.text))
    )[:15]
    got = [r["doc_id"] for r in multiterm_topk(ix, "salt1%", k=15).collect()]
    assert got == exp
    assert multiterm_topk(ix, "zzzz%", k=5).count() == 0


def test_wildcard_match(spark, small_ix):
    pdf, ix = small_ix
    # '%0042%' style infix wildcard — cannot push as a range but must
    # still answer correctly
    got = [r["doc_id"] for r in multiterm_topk(ix, "w0004_", k=200).collect()]
    import re

    def toks(t):
        return set(re.split(r"[^a-z0-9]+", t.lower()))

    exp = sorted(
        r.doc_id for r in pdf.itertuples()
        if any(re.fullmatch(r"w0004.", t) for t in toks(r.text))
    )[:200]
    assert got == exp
