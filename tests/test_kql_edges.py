"""KQL parser edge robustness (pure parsing — no Spark session)."""

import datetime

import pytest

from siem_on_amazon_opensearch_service_spark.index.kql import (
    KQLError, parse_kql,
)


def test_escaped_quotes_in_values():
    node = parse_kql(r'msg: "say \"hi\" now"')
    assert node == {"term": {"msg": 'say "hi" now'}}


def test_nested_groups_and_mixed_case_keywords():
    node = parse_kql("(a: 1 Or a: 2) AnD nOt b: 3")
    b = node["bool"]["filter"]
    assert b[0]["bool"]["minimum_should_match"] == 1
    assert b[1] == {"bool": {"must_not": [{"term": {"b": 3}}]}}


def test_value_group_single_item_and_numbers():
    assert parse_kql("a: (42)") == {"term": {"a": 42}}
    assert parse_kql("a: -3.5") == {"term": {"a": -3.5}}


def test_slash_and_at_fields():
    node = parse_kql("ProductFields.aws/securityhub/Product: X")
    assert node == {"term":
                    {"ProductFields.aws/securityhub/Product": "X"}}
    node2 = parse_kql("@timestamp <= now", now=datetime.datetime(2024, 1, 1))
    assert node2 == {"range": {"@timestamp":
                               {"lte": datetime.datetime(2024, 1, 1)}}}


def test_bad_inputs_raise():
    for bad in ("a:", "a: (1 or", ": v", "a >", 'a: "unclosed'):
        with pytest.raises(KQLError):
            parse_kql(bad)
