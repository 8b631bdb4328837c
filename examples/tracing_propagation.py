#!/usr/bin/env python
"""W3C trace-context propagation — the analogue of the reference's
``examples/tracing`` app: extract the upstream ``traceparent`` from
each record's Kafka headers, process under that trace, and inject a
child context on the outbound frame so downstream consumers see the
same trace id with a fresh span id.

Columnar translation of the per-record span model: the trace id flows
through as DATA (pure expressions — no per-record Python), child span
ids are hash-derived (deterministic under at-least-once replay), and
the per-BATCH span goes through ``OtelBatchTracer`` — here backed by a
logging fake standing in for ``GlobalOpenTelemetry.get()``, which,
exactly like the reference with no agent configured, makes tracing a
no-op-ish observer rather than a hard dependency.

Run: python examples/tracing_propagation.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.session import get_spark  # noqa: E402
from kpipe_spark.streaming.otel import OtelBatchTracer  # noqa: E402
from kpipe_spark.streaming.tracing import (  # noqa: E402
    child_traceparent,
    extract_traceparent,
    inject_traceparent,
)

UPSTREAM_TRACE = "0af7651916cd43dd8448eb211c80319c"


class _LoggingTracerProvider:
    """GlobalOpenTelemetry stand-in: collects spans instead of exporting."""

    def __init__(self) -> None:
        self.spans = []

    def get_tracer(self, name):
        provider = self

        class _Span:
            def __init__(self, name, attributes):
                self.name, self.attributes = name, attributes

            def end(self):
                provider.spans.append(self)

        class _Tracer:
            def start_span(self, name, attributes=None, context=None):
                return _Span(name, dict(attributes or {}))

        return _Tracer()


def main() -> None:
    spark = get_spark(app_name="example-tracing")
    spark.sparkContext.setLogLevel("ERROR")

    def header(tp: str):
        return [("traceparent", tp.encode())]

    rows = [
        (b"order-1", header(f"00-{UPSTREAM_TRACE}-00f067aa0ba902b7-01")),
        (b"order-2", header(f"00-{UPSTREAM_TRACE}-00f067aa0ba902b8-01")),
        (b"order-3", []),  # no upstream context: no traceparent extracted
    ]
    df = spark.createDataFrame(
        rows, "value binary, headers array<struct<key: string, value: binary>>"
    )

    parent = extract_traceparent("headers")
    traced = df.withColumn("_tp", parent).withColumn(
        "_child", child_traceparent(F.col("_tp"), F.col("value"))
    )
    out = inject_traceparent(traced, F.col("_child"))

    rows_out = out.select("value", "_tp", "_child", "headers").collect()
    provider = _LoggingTracerProvider()
    tracer = OtelBatchTracer(provider)
    with tracer.batch_span("orders", batch_id=0, n_records=len(rows_out)):
        for r in rows_out:
            print(
                "  record=%s upstream=%s child=%s"
                % (bytes(r["value"]).decode(), r["_tp"], r["_child"])
            )

    with_ctx = [r for r in rows_out if r["_tp"] is not None]
    # trace id PRESERVED, span id replaced, flags carried through
    assert all(r["_child"].split("-")[1] == UPSTREAM_TRACE for r in with_ctx)
    assert all(
        r["_child"].split("-")[2] != r["_tp"].split("-")[2] for r in with_ctx
    )
    # outbound headers carry the child context (inject-on-produce)
    for r in with_ctx:
        hdr = {h["key"]: bytes(h["value"]).decode() for h in r["headers"]}
        assert hdr["traceparent"] == r["_child"]
    print("batch spans emitted:", len(provider.spans))
    print("trace continuity: preserved trace-id, fresh span-id = True")


if __name__ == "__main__":
    main()
