"""Ingest circuit breaker (reference ``es_loader_stopper/index.py``).

The reference wires a CloudWatch alarm (cluster health) to a Lambda
that THROTTLEs the loader by setting its reserved concurrency to 0
(every future invocation is rejected, in-flight ones finish), and
UNTHROTTLEs by restoring the configured concurrency — with an SNS
notification either way (index.py:29-61, 64-105).

Spark restatement: the loader is a Structured Streaming query; the
same three-way decision (``direct_action``: ALARM -> THROTTLE,
OK -> UNTHROTTLE, anything else -> PASS, index.py:64-73) drives
``StreamingQuery.stop()`` / a caller-supplied restart.  Stopping a
streaming query is the concurrency-0 analog exactly: the checkpoint
holds the committed offset, no data is lost, and restart resumes from
it — at-least-once delivery is preserved end-to-end, which is why the
upstream breaker can afford to slam the door during an emergency.

``evaluate_alarm`` closes the loop in-engine: the upstream alarm is a
threshold over a cluster metric stream; here a threshold over the
build-metrics table (``plans/checkpoint.build_metrics`` rows, the
index_metrics_exporter analog) emits the same event shape the
breaker consumes, so breaker behavior is testable with no cloud."""

from __future__ import annotations

from collections.abc import Callable

THROTTLE = "THROTTLE"
UNTHROTTLE = "UNTHROTTLE"
PASS = "PASS"


def direct_action(event: dict) -> str:
    """Alarm event -> decision (reference index.py:64-73, same event
    shape: ``{"detail": {"state": {"value": "ALARM" | "OK" | ...}}}``;
    INSUFFICIENT_DATA and anything unknown PASSes)."""
    state = (event.get("detail", {}).get("state", {}) or {}) \
        .get("value")
    if state == "ALARM":
        return THROTTLE
    if state == "OK":
        return UNTHROTTLE
    return PASS


def evaluate_alarm(value: float, threshold: float,
                   comparison: str = "gt") -> dict:
    """One metric sample -> the alarm event ``direct_action``
    consumes (the CloudWatch-alarm seam, closed in-engine)."""
    breached = value > threshold if comparison == "gt" \
        else value < threshold
    return {"detail": {"state": {"value": "ALARM" if breached
                                 else "OK"}}}


class LoaderStopper:
    """Throttle/unthrottle a streaming ingest query on alarm events.

    ``start_fn`` starts (or restarts) the load and returns the
    StreamingQuery — the reserved-concurrency-restore analog; the
    streaming checkpoint makes restart resume exactly where stop cut
    off.  ``notify`` receives (subject, message) on every state
    CHANGE, mirroring the reference's SNS publishes (index.py:36-58);
    a PASS or an already-in-state decision notifies nothing."""

    def __init__(self, start_fn: Callable, notify: Callable | None = None):
        self._start_fn = start_fn
        self._notify = notify or (lambda subject, message: None)
        self.query = None
        self.throttled = False
        self.actions: list[str] = []  # audit trail of applied actions

    def ensure_started(self):
        """Start the load unless the breaker is OPEN — a throttled
        breaker refuses to start (the reserved-concurrency-0 analog:
        future invocations are rejected until UNTHROTTLE)."""
        if self.query is None and not self.throttled:
            self.query = self._start_fn()
        return self.query

    def handle(self, event: dict) -> str:
        """Apply one alarm event; returns the decision taken."""
        action = direct_action(event)
        if action == THROTTLE and not self.throttled:
            q = self.query
            if q is not None:
                q.stop()
                q.awaitTermination()
            self.query = None
            self.throttled = True
            self.actions.append(THROTTLE)
            self._notify("es-loader has been throttled.",
                         "Ingest stopped by the circuit breaker; "
                         "the streaming checkpoint preserves the "
                         "committed offset for restart.")
        elif action == UNTHROTTLE and self.throttled:
            self.throttled = False
            if self.query is None:
                self.query = self._start_fn()
            self.actions.append(UNTHROTTLE)
            self._notify("es-loader has been unthrottled.",
                         "Ingest resumed from the checkpoint.")
        else:
            self.actions.append(PASS)
        return action
