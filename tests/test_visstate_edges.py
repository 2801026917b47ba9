"""visState translator edges (pure translation — no Spark)."""

import pytest

from siem_on_amazon_opensearch_service_spark.index.visstate import (
    VisStateError, visstate_to_aggs,
)


def test_disabled_aggs_are_skipped():
    vis = {"aggs": [
        {"id": "1", "enabled": True, "type": "count", "schema": "metric",
         "params": {}},
        {"id": "2", "enabled": False, "type": "terms", "schema": "segment",
         "params": {"field": "a"}},
        {"id": "3", "enabled": True, "type": "terms", "schema": "segment",
         "params": {"field": "b", "orderBy": "_key", "order": "asc"}},
    ]}
    spec = visstate_to_aggs(vis)
    assert list(spec) == ["3"]
    assert spec["3"]["terms"]["order"] == {"_key": "asc"}


def test_orderby_metric_id_resolves_or_falls_to_count():
    vis = {"aggs": [
        {"id": "7", "enabled": True, "type": "cardinality",
         "schema": "metric", "params": {"field": "x"}},
        {"id": "2", "enabled": True, "type": "terms", "schema": "segment",
         "params": {"field": "a", "orderBy": "7", "order": "desc"}},
    ]}
    spec = visstate_to_aggs(vis)
    assert spec["2"]["terms"]["order"] == {"7": "desc"}
    # unknown orderBy id -> _count
    vis["aggs"][1]["params"]["orderBy"] = "99"
    assert visstate_to_aggs(vis)["2"]["terms"]["order"] == \
        {"_count": "desc"}


def test_nested_buckets_in_array_order():
    vis = {"aggs": [
        {"id": "m", "enabled": True, "type": "sum", "schema": "metric",
         "params": {"field": "v"}},
        {"id": "outer", "enabled": True, "type": "terms",
         "schema": "group", "params": {"field": "a"}},
        {"id": "inner", "enabled": True, "type": "terms",
         "schema": "segment", "params": {"field": "b"}},
    ]}
    spec = visstate_to_aggs(vis)
    assert list(spec) == ["outer"]
    inner = spec["outer"]["aggs"]
    assert list(inner) == ["inner"]
    assert inner["inner"]["aggs"] == {"m": {"sum": {"field": "v"}}}


def test_unsupported_types_raise_visstateerror():
    with pytest.raises(VisStateError, match="metric"):
        visstate_to_aggs({"aggs": [
            {"id": "1", "enabled": True, "type": "median",
             "schema": "metric", "params": {"field": "v"}}]})
    with pytest.raises(VisStateError, match="bucket"):
        visstate_to_aggs({"aggs": [
            {"id": "1", "enabled": True, "type": "geohash_grid",
             "schema": "segment", "params": {"field": "loc"}}]})
