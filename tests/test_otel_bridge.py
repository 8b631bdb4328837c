"""OTel exporter bridges, tested against duck-typed fakes (the real
SDK isn't in this container — the bridge is coded to the public OTel
API surface, which these fakes replicate)."""

from __future__ import annotations

import pytest

from kpipe_spark.streaming.otel import (
    INSTRUMENTATION_NAME,
    SPAN_NAME,
    OtelBatchTracer,
    OtelConsumerMetrics,
)
from kpipe_spark.streaming.runner import Metrics


class FakeCounter:
    def __init__(self, name):
        self.name = name
        self.points: list[tuple[int, dict]] = []

    def add(self, n, attributes=None):
        self.points.append((n, dict(attributes or {})))


class FakeHistogram(FakeCounter):
    def record(self, v, attributes=None):
        self.points.append((v, dict(attributes or {})))


class FakeMeter:
    def __init__(self):
        self.instruments: dict[str, FakeCounter] = {}

    def create_counter(self, name, unit=None, description=None):
        return self.instruments.setdefault(name, FakeCounter(name))

    def create_histogram(self, name, unit=None, description=None):
        return self.instruments.setdefault(name, FakeHistogram(name))


class FakeSpan:
    def __init__(self, name, attributes, context):
        self.name, self.attributes, self.context = name, attributes, context
        self.ended = False
        self.exceptions: list = []

    def record_exception(self, exc):
        self.exceptions.append(exc)

    def end(self):
        self.ended = True


class FakeTracer:
    def __init__(self):
        self.spans: list[FakeSpan] = []

    def start_span(self, name, attributes=None, context=None):
        span = FakeSpan(name, dict(attributes or {}), context)
        self.spans.append(span)
        return span


class FakeOtel:
    def __init__(self):
        self.meter = FakeMeter()
        self.tracer = FakeTracer()
        self.meter_names: list[str] = []

    def get_meter(self, name):
        self.meter_names.append(name)
        return self.meter

    def get_tracer(self, name):
        return self.tracer


def test_metrics_bridge_exports_deltas_with_reference_names():
    otel = FakeOtel()
    bridge = OtelConsumerMetrics(otel, pipeline_name="orders")
    assert otel.meter_names == [INSTRUMENTATION_NAME]

    m = Metrics()
    m.add("records.received", 100)
    m.add("pipeline.processed.passed", 80)
    m.add("pipeline.processed.failed", 20)

    deltas = bridge.export(m)
    assert deltas == {
        "records.received": 100,
        "pipeline.processed.passed": 80,
        "pipeline.processed.failed": 20,
    }
    received = otel.meter.instruments["kpipe.consumer.messages.received"]
    assert received.points == [(100, {"pipeline": "orders"})]
    errors = otel.meter.instruments["kpipe.consumer.messages.errors"]
    assert errors.points == [(20, {"pipeline": "orders"})]

    # second export: only the delta moves (idempotent cadence)
    m.add("records.received", 5)
    assert bridge.export(m) == {"records.received": 5}
    assert received.points[-1] == (5, {"pipeline": "orders"})
    # unchanged counters emit nothing
    assert len(errors.points) == 1


def test_metrics_bridge_histogram_and_no_pipeline_attr():
    otel = FakeOtel()
    bridge = OtelConsumerMetrics(otel)
    bridge.record_batch_duration(12.5)
    hist = otel.meter.instruments["kpipe.consumer.processing.duration"]
    assert hist.points == [(12.5, {})]


def test_batch_tracer_span_lifecycle_and_attributes():
    otel = FakeOtel()
    tracer = OtelBatchTracer(otel)
    with tracer.batch_span("orders", batch_id=7, n_records=1000) as span:
        assert span.name == SPAN_NAME
        assert span.attributes["messaging.kafka.topic"] == "orders"
        assert span.attributes["kpipe.batch.records"] == 1000
        assert not span.ended
    assert span.ended


def test_batch_tracer_records_exception_and_reraises():
    otel = FakeOtel()
    tracer = OtelBatchTracer(otel)
    with pytest.raises(RuntimeError):
        with tracer.batch_span("orders", batch_id=8, n_records=10):
            raise RuntimeError("sink down")
    span = otel.tracer.spans[-1]
    assert span.ended and len(span.exceptions) == 1


def test_batch_tracer_traceparent_degrades_without_otel_sdk():
    """No opentelemetry package in this container: extract fails, span
    is still emitted unparented (OtelTracer.java:84-90 degradation)."""
    otel = FakeOtel()
    tracer = OtelBatchTracer(otel)
    tp = "00-0123456789abcdef0123456789abcdef-0123456789abcdef-01"
    with tracer.batch_span("t", 1, 1, traceparent=tp):
        pass
    assert otel.tracer.spans[-1].context is None
