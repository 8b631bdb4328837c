"""Streaming execution: the kpipe consumer runtime, replaced by
Structured Streaming.

kpipe's operational core — offset ledger + commit frontier
(KafkaOffsetManager.java:56-392), dispatchers (Parallel/Sequential/
KeyOrdered), backpressure, graceful drain — is not reimplemented: the
micro-batch engine's checkpoint WAL/commit-log gives the same
at-least-once contract (offset advances only after the batch's sinks,
including DLQ parking, succeed), and shuffle partitioning gives per-key
serialization. What remains engine work is the glue in ``runner``:
outcome-aware foreachBatch terminals with DLQ-before-commit ordering,
and the processing-mode batch shapers in ``modes``.
"""

from kpipe_spark.streaming.backpressure import (  # noqa: F401
    Action,
    BackpressureGovernor,
    kafka_lag,
)
from kpipe_spark.streaming.modes import ProcessingMode  # noqa: F401
from kpipe_spark.streaming.runner import StreamRunner  # noqa: F401
