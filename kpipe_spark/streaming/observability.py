"""Streaming observability bridge (SURVEY §2.5 R9).

kpipe exposes consumer counters/histograms via ``withMetrics`` and a
pluggable reporter (docs/OBSERVABILITY.md:20-42). Spark's native
telemetry is the StreamingQueryListener progress event stream; this
bridge folds progress events into the engine's ``Metrics`` counter set
so one surface carries both pipeline outcomes (from the runner) and
engine-level rates (rows/sec, batch durations, state-store sizes).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

from kpipe_spark.streaming.runner import Metrics


def _rate_gauge(value) -> int:
    """Progress-rate field -> int gauge; None/NaN -> 0 (docstring in
    onQueryProgress)."""
    if value is None:
        return 0
    v = float(value)
    return 0 if math.isnan(v) else int(v)


class MetricsListener(StreamingQueryListener):
    """Fold QueryProgress events into Metrics counters.

    Counter names extend the kpipe set (ConsumerMetricKeys): batch
    input rows, cumulative processing time, and the last observed
    rates (gauges stored alongside counters for one scrape surface).
    """

    def __init__(self, metrics: Metrics | None = None) -> None:
        self.metrics = metrics or Metrics()

    def onQueryStarted(self, event) -> None:
        self.metrics.add("queries.started")

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.metrics.add("progress.batches")
        self.metrics.add("progress.input.rows", int(p.numInputRows))
        duration = p.durationMs.get("triggerExecution")
        if duration is not None:
            self.metrics.add("progress.trigger.ms", int(duration))
        # last-value gauges. Spark reports NaN rates on the first
        # progress event (no prior batch to rate against); float('nan')
        # is truthy, so `or 0` does NOT catch it and int(nan) raises —
        # which would abort the callback after progress.batches was
        # already incremented, leaving the counter set inconsistent.
        self.metrics.counters["gauge.input.rows.per.sec"] = _rate_gauge(
            p.inputRowsPerSecond
        )
        self.metrics.counters["gauge.processed.rows.per.sec"] = _rate_gauge(
            p.processedRowsPerSecond
        )

    def onQueryIdle(self, event) -> None:
        self.metrics.add("progress.idle.events")

    def onQueryTerminated(self, event) -> None:
        self.metrics.add(
            "queries.terminated.error" if event.exception else "queries.terminated.ok"
        )


def attach_metrics_listener(
    spark: SparkSession, metrics: Metrics | None = None
) -> MetricsListener:
    """Register a MetricsListener on the session; returns it so callers
    can scrape ``listener.metrics.counters`` (or hand the same Metrics
    object to a StreamRunner for a single combined surface)."""
    listener = MetricsListener(metrics)
    spark.streams.addListener(listener)
    return listener
