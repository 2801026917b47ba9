"""Circuit-breaker parity (reference es_loader_stopper/index.py):
alarm decisions, real StreamingQuery stop/restart, state-change-only
notifications."""

import time

import pytest

from siem_on_amazon_opensearch_service_spark.streaming.stopper import (
    PASS,
    THROTTLE,
    UNTHROTTLE,
    LoaderStopper,
    direct_action,
    evaluate_alarm,
)


def _ev(state):
    return {"detail": {"state": {"value": state}}}


def test_direct_action_decision_table():
    # reference index.py:64-73 verbatim semantics
    assert direct_action(_ev("ALARM")) == THROTTLE
    assert direct_action(_ev("OK")) == UNTHROTTLE
    assert direct_action(_ev("INSUFFICIENT_DATA")) == PASS
    assert direct_action({}) == PASS
    assert direct_action({"detail": {"state": None}}) == PASS


def test_evaluate_alarm_threshold():
    assert direct_action(evaluate_alarm(95.0, 90.0)) == THROTTLE
    assert direct_action(evaluate_alarm(42.0, 90.0)) == UNTHROTTLE
    assert direct_action(
        evaluate_alarm(1.0, 5.0, comparison="lt")) == THROTTLE


@pytest.fixture
def stopper(spark, tmp_path):
    def start():
        return (spark.readStream.format("rate")
                .option("rowsPerSecond", 10).load()
                .writeStream.format("noop")
                .option("checkpointLocation",
                        str(tmp_path / "ckpt"))
                .start())

    notes = []
    s = LoaderStopper(start, notify=lambda subj, msg:
                      notes.append(subj))
    s.notes = notes
    yield s
    if s.query is not None:
        s.query.stop()


def test_throttle_stops_query_and_restart_resumes(stopper):
    q = stopper.ensure_started()
    assert q.isActive
    assert stopper.handle(_ev("ALARM")) == THROTTLE
    assert stopper.query is None and not q.isActive
    # double-ALARM is a no-op (already throttled)
    assert stopper.handle(_ev("ALARM")) == THROTTLE
    assert stopper.actions == [THROTTLE, PASS]
    # OK restarts via start_fn (the concurrency-restore analog)
    assert stopper.handle(_ev("OK")) == UNTHROTTLE
    deadline = time.time() + 30
    while not stopper.query.isActive and time.time() < deadline:
        time.sleep(0.2)
    assert stopper.query.isActive
    # notifications fire on state CHANGES only
    assert stopper.notes == ["es-loader has been throttled.",
                             "es-loader has been unthrottled."]
    # PASS leaves everything alone
    assert stopper.handle(_ev("INSUFFICIENT_DATA")) == PASS
    assert stopper.query.isActive


def test_unthrottle_when_never_throttled_is_noop(stopper):
    q = stopper.ensure_started()
    assert stopper.handle(_ev("OK")) == UNTHROTTLE
    assert stopper.query is q and q.isActive
    assert stopper.notes == []


def test_ensure_started_respects_open_breaker(stopper):
    stopper.ensure_started()
    stopper.handle(_ev("ALARM"))
    # breaker open: ensure_started refuses to start a new query
    assert stopper.ensure_started() is None
    assert stopper.query is None
    # OK restarts exactly one query
    stopper.handle(_ev("OK"))
    q = stopper.query
    assert q is not None
    # a second OK is a no-op (no duplicate start on the checkpoint)
    stopper.handle(_ev("OK"))
    assert stopper.query is q
