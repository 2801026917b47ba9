"""PAN-OS raw-log transformer parity (reference
pa_firewall_rawlog_transformer/index.py): concatenated-JSON Firehose
blobs -> CloudWatch-Logs envelopes -> substring-classified CSV rows
-> per-type typed tables."""

import json

import pytest

from siem_on_amazon_opensearch_service_spark.sources.pan_firewall import (
    PAN_COLUMNS,
    pan_classify,
    pan_demux,
    pan_messages,
    pan_tables,
    split_concat_json,
)


def _row(group: str, **overrides) -> str:
    """A CSV row with the group's exact arity; field values default
    to f<i> except the type/subtype markers and overrides."""
    cols = PAN_COLUMNS[group]
    vals = [f"f{i}" for i in range(len(cols))]
    vals[0] = "2024/10/17 14:32:34"
    marker = {"system": "SYSTEM", "traffic": "TRAFFIC",
              "threat_url": "THREAT", "threat_data": "THREAT",
              "threat_others": "THREAT", "decryption": "DECRYPTION",
              "config": "CONFIG",
              "authentication": "AUTHENTICATION"}[group]
    vals[2] = marker
    vals[3] = {"threat_url": "url", "threat_data": "data",
               "threat_others": "vulnerability"}.get(group, "general")
    for k, v in overrides.items():
        vals[cols.index(k)] = v
    return ",".join(vals)


def _blob(messages: list[str]) -> str:
    # two envelopes CONCATENATED with no separator (the Firehose
    # delivery shape), messages split across them
    half = len(messages) // 2
    e1 = json.dumps({"logEvents": [
        {"message": "\n".join(messages[:half])}]})
    e2 = json.dumps({"logEvents": [
        {"message": m} for m in messages[half:]]})
    return e1 + e2


MESSAGES = [
    _row("system", event_id="general", severity="informational"),
    _row("traffic", source_address="10.0.0.1"),
    _row("threat_url"),
    _row("threat_data"),
    _row("threat_others"),
    _row("decryption"),
    _row("config"),
    _row("authentication"),
    "garbage line with no known type",
]


@pytest.fixture(scope="module")
def tables(spark):
    df = spark.createDataFrame([(_blob(MESSAGES),)], "blob string")
    return pan_demux(df, "blob")


def test_split_concat_json(spark):
    df = spark.createDataFrame(
        [('{"a": 1} {"b": 2}{"c": 3} trailing-garbage',)],
        "blob string")
    got = [r.obj for r in split_concat_json(df, "blob").collect()]
    assert [json.loads(o) for o in got] == [{"a": 1}, {"b": 2},
                                            {"c": 3}]


def test_groups_and_counts(tables):
    counts = {g: t.count() for g, t in tables.items()}
    assert counts == {"system": 1, "traffic": 1, "threat_url": 1,
                      "threat_data": 1, "threat_others": 1,
                      "decryption": 1, "config": 1,
                      "authentication": 1}


def test_typed_columns_parse(tables):
    sysrow = tables["system"].collect()[0]
    assert list(tables["system"].columns) == PAN_COLUMNS["system"]
    assert sysrow.receive_time == "2024/10/17 14:32:34"
    assert sysrow.event_id == "general"
    assert sysrow.severity == "informational"
    assert tables["traffic"].collect()[0].source_address == "10.0.0.1"


def test_substring_precedence_quirk(spark):
    # a TRAFFIC row whose free text mentions SYSTEM classifies as
    # system -- the reference's substring precedence (index.py:124),
    # pinned as contract
    trap = _row("traffic", rule_name="SYSTEM-upgrade-rule")
    df = pan_classify(spark.createDataFrame([(trap,)],
                                            "message string"))
    assert df.collect()[0].log_group == "system"
    # unknown rows are NULL-labelled (logged-and-dropped upstream)
    df2 = pan_classify(spark.createDataFrame([("nothing here",)],
                                             "message string"))
    assert df2.collect()[0].log_group is None


def test_short_row_null_fills(spark):
    short = "2024/10/17 14:32:34,serial,CONFIG,general"
    t = pan_tables(pan_classify(
        spark.createDataFrame([(short,)], "message string")))
    row = t["config"].collect()[0]
    assert row.type == "CONFIG"
    assert row[PAN_COLUMNS["config"][-1]] is None


def test_whitespace_strip(spark):
    padded = _row("system").replace("SYSTEM", "  SYSTEM  ")
    t = pan_tables(pan_classify(
        spark.createDataFrame([(padded,)], "message string")))
    assert t["system"].collect()[0].type == "SYSTEM"


def test_write_partitions(tables, tmp_path, spark):
    from siem_on_amazon_opensearch_service_spark.sources.pan_firewall \
        import pan_write

    pan_write({"system": tables["system"]}, str(tmp_path))
    back = spark.read.parquet(str(tmp_path / "system"))
    row = back.collect()[0]
    assert (row.year, row.month, row.day, row.hour) == (2024, 10, 17,
                                                        14)


def test_envelope_explode(spark):
    df = spark.createDataFrame([(_blob(["a", "b", "c"]),)],
                               "blob string")
    msgs = sorted(r.message for r in
                  pan_messages(split_concat_json(df, "blob"))
                  .collect())
    assert msgs == ["a", "b", "c"]


def test_config_columns_follow_published_order():
    # the reference's own list names "client" twice and drops
    # after_change_detail (index.py:1209, a transcription bug its
    # dict comprehension hides); we restore the published order --
    # no duplicates, 27 fields, after_change_detail present
    cols = PAN_COLUMNS["config"]
    assert len(cols) == 27 and len(set(cols)) == 27
    i = cols.index("client")
    assert cols[i:i + 5] == ["client", "result", "configuration_path",
                             "before_change_detail",
                             "after_change_detail"]


def test_config_table_writes_cleanly(spark, tmp_path):
    from siem_on_amazon_opensearch_service_spark.sources.pan_firewall \
        import pan_write

    row = _row("config", after_change_detail="new-val")
    t = pan_tables(pan_classify(
        spark.createDataFrame([(row,)], "message string")))
    pan_write({"config": t["config"]}, str(tmp_path))
    back = spark.read.parquet(str(tmp_path / "config"))
    assert back.collect()[0].after_change_detail == "new-val"
