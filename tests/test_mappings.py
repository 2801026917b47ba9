"""Index-template compiler: the data.ini component-template shapes
must type the ingest frame exactly (ignore_malformed semantics) and
route fields to the right index structure."""

import datetime

from siem_on_amazon_opensearch_service_spark.index.mappings import (
    apply_mapping,
    index_plan,
    parse_template,
)

# the reference's component_template_log shapes in miniature
# (deploy_es/data.ini:84-353): declared keyword/text/date/
# epoch_millis/ip/geo_point/numeric fields, a multi-field, a
# doc_values:false keyword, dynamic strings -> keyword.
TEMPLATE = {
    "template": {
        "settings": {"index.mapping.ignore_malformed": True},
        "mappings": {
            "dynamic_templates": [{
                "strings": {
                    "match_mapping_type": "string",
                    "mapping": {"type": "keyword"},
                }
            }],
            "properties": {
                "@id": {"type": "keyword"},
                "@message": {"type": "text"},
                "@timestamp": {"type": "date"},
                "cwl_timestamp": {"type": "date",
                                  "format": "epoch_millis"},
                "destination.ip": {"type": "ip"},
                "destination.geo.location": {"type": "geo_point"},
                "destination.bytes": {"type": "long"},
                "http.response.status_code": {"type": "short"},
                "event.risk_score": {"type": "float"},
                "dns.id": {"type": "keyword", "doc_values": False},
                "http.request.body.content": {
                    "type": "keyword",
                    "fields": {"text": {"type": "text"}},
                },
                "base": {"type": "object"},
            },
        },
    }
}

ROWS = [
    # (id, msg, ts, cwl_ms, ip, geo, bytes, status, risk)
    ("a", "hello world", "2024-05-01T10:20:30", "1714558830123",
     "10.1.2.3", "35.6,139.7", "123", "200", "1.5"),
    ("b", "bad row", "not-a-date", "oops",
     "999.1.2.3", "91.0,10.0", "many", "xx", "nan?"),
    ("c", "v6", "2024-05-02 00:00:00", "0",
     "2001:db8::1", "-35.0,-58.4", "0", "404", "0"),
]
COLS = ["@id", "@message", "@timestamp", "cwl_timestamp",
        "destination.ip", "destination.geo.location",
        "destination.bytes", "http.response.status_code",
        "event.risk_score"]


def _df(spark):
    return spark.createDataFrame(ROWS, [c for c in COLS])


def test_apply_mapping_types_and_ignore_malformed(spark):
    m = parse_template(TEMPLATE)
    out = apply_mapping(_df(spark), m)
    dt = dict(out.dtypes)
    assert dt["@timestamp"] == "timestamp"
    assert dt["cwl_timestamp"] == "timestamp"
    assert dt["destination.bytes"] == "bigint"
    assert dt["http.response.status_code"] == "smallint"
    assert dt["event.risk_score"] == "float"
    assert dt["destination.geo.location"] == \
        "struct<lat:double,lon:double>"

    rows = {r["@id"]: r for r in out.collect()}
    good = rows["a"]
    assert good["@timestamp"] == datetime.datetime(2024, 5, 1, 10, 20, 30)
    assert good["cwl_timestamp"].year == 2024
    assert good["destination.ip"] == "10.1.2.3"
    assert good["destination.geo.location"]["lat"] == 35.6
    assert good["destination.bytes"] == 123
    assert good["http.response.status_code"] == 200
    assert abs(good["event.risk_score"] - 1.5) < 1e-6

    # ignore_malformed: every bad value nulls, the doc survives
    bad = rows["b"]
    assert bad["@timestamp"] is None
    assert bad["cwl_timestamp"] is None
    assert bad["destination.ip"] is None          # 999.x invalid
    assert bad["destination.geo.location"] is None  # lat 91 out of range
    assert bad["destination.bytes"] is None
    assert bad["http.response.status_code"] is None
    assert bad["event.risk_score"] is None
    assert bad["@message"] == "bad row"

    v6 = rows["c"]
    assert v6["destination.ip"] == "2001:db8::1"
    assert v6["cwl_timestamp"] == datetime.datetime(1970, 1, 1, 0, 0, 0)
    assert v6["destination.geo.location"]["lon"] == -58.4


def test_index_plan_routing():
    m = parse_template(TEMPLATE)
    plan = index_plan(m)
    # text spaces: declared text + the multi-field .text sub
    assert plan["text_fields"] == [
        "@message", "http.request.body.content.text"]
    assert "@id" in plan["keyword_fields"]
    assert "http.request.body.content" in plan["keyword_fields"]
    assert plan["filter_only"] == ["dns.id"]
    assert plan["typed_fields"]["destination.ip"] == "ip"
    assert plan["typed_fields"]["destination.geo.location"] == "geo_point"
    assert plan["dynamic_string_type"] == "keyword"
    # column-restricted plan drops absent fields
    plan2 = index_plan(m, columns=["@message", "@id"])
    assert plan2["text_fields"] == ["@message"]


def test_parse_bare_mappings_and_dynamic_default():
    m = parse_template({"properties": {"x": {"type": "long"}}})
    assert m.properties["x"]["type"] == "long"
    assert m.dynamic_string_type == "keyword"
    assert m.ignore_malformed is True
