"""kpipe_spark — a PySpark-native analytics engine.

A ground-up reimplementation of the capabilities of eschizoid/kpipe
(a JVM Kafka consumer pipeline runtime) on Apache Spark:

- the kpipe pipeline API (``Stream``-shaped builder: pipe/filter/when/
  skip_bytes, Operators, Result outcome semantics, DLQ routing) expressed
  as Catalyst column expressions over DataFrames (`kpipe_spark.pipeline`),
- the relational query surface graded by the DuckDB oracle
  (`kpipe_spark.queries`),
- Structured Streaming execution with checkpoint-based at-least-once
  delivery replacing kpipe's offset ledger (`kpipe_spark.streaming`),
- large-scale training-data operators: dedup, similarity search, text
  analysis, multimodal columns (`kpipe_spark.functions`).

Design notes are in ARCHITECTURE.md. Reference semantics are cited per
module as /root/reference file:line.
"""

__version__ = "0.1.0"

from kpipe_spark.session import get_spark  # noqa: F401
