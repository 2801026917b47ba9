"""KQL compiler semantics: parsed nodes executed through search_body
must select the right docs; date math, typing, and error paths."""

import datetime

import pytest

from siem_on_amazon_opensearch_service_spark.index import build_index
from siem_on_amazon_opensearch_service_spark.index.kql import (
    KQLError, parse_kql,
)
from siem_on_amazon_opensearch_service_spark.index.searchbody import (
    search_hits,
)

ROWS = [
    (0, "login failed badly", "ERROR", "auth", 1, 10.0),
    (1, "login ok", "INFO", "auth", 2, 20.0),
    (2, "scan started", "ERROR", "scan", 3, 30.0),
    (3, "scan finished cleanly", "WARN", None, 4, 40.0),
    (4, "other message", "DEBUG", "audit", 5, 50.0),
]


@pytest.fixture(scope="module")
def ix(spark):
    from siem_on_amazon_opensearch_service_spark.index.positional import (
        build_positional_index,
    )

    docs = spark.createDataFrame(
        ROWS, "doc_id long, text string, level string, module string, "
        "seq long, value double")
    return (build_index(spark, docs, text_col="text", id_col="doc_id",
                        keep_cols=["level", "module", "seq", "value"]),
            build_positional_index(spark, docs, id_col="doc_id"))


def _ids(ix, q, **kw):
    node = parse_kql(q, **kw)
    page = search_hits(ix[0], {"query": node, "size": 10},
                       positional_ix=ix[1])
    return sorted(r["doc_id"] for r in page.collect())


def test_term_and_or_not(ix):
    assert _ids(ix, "level: ERROR") == [0, 2]
    assert _ids(ix, "level: ERROR and module: auth") == [0]
    assert _ids(ix, "level: ERROR or level: WARN") == [0, 2, 3]
    assert _ids(ix, "not level: ERROR") == [1, 3, 4]
    assert _ids(ix, "level: (ERROR or WARN) and not module: scan") \
        == [0, 3]


def test_exists_wildcard_numbers(ix):
    assert _ids(ix, "module: *") == [0, 1, 2, 4]
    assert _ids(ix, "not module: *") == [3]
    assert _ids(ix, "level: ERR*") == [0, 2]
    assert _ids(ix, "seq >= 4") == [3, 4]
    assert _ids(ix, "value < 25") == [0, 1]
    assert _ids(ix, "seq > 1 and seq <= 3") == [1, 2]


def test_bare_and_phrase_default_field(ix):
    assert _ids(ix, "login") == [0, 1]
    assert _ids(ix, '"scan finished"') == [3]
    assert _ids(ix, "scan and not finished") == [2]


def test_nbsp_and_quoted_field(ix):
    assert _ids(ix, "level:\xa0ERROR") == [0, 2]
    assert _ids(ix, '"level": ERROR') == [0, 2]


def test_date_math_resolution():
    now = datetime.datetime(2024, 6, 8)
    node = parse_kql('@timestamp > "now-7d"', now=now)
    assert node == {"range": {"@timestamp": {
        "gt": datetime.datetime(2024, 6, 1)}}}
    # without now= the raw string passes through
    raw = parse_kql('@timestamp > "now-7d"')
    assert raw == {"range": {"@timestamp": {"gt": "now-7d"}}}


def test_errors():
    with pytest.raises(KQLError, match="parenthes"):
        parse_kql("(level: ERROR")
    with pytest.raises(KQLError, match="mixed"):
        parse_kql("level: (a or b and c)")
    with pytest.raises(KQLError, match="trailing"):
        parse_kql("level: ERROR )")
    assert parse_kql("  ") == {"match_all": {}}
