#!/usr/bin/env python
"""Streaming with the full delivery contract — the analogue of the
reference's circuit-breaker/DLQ examples: file-source micro-batches
through a Pipeline, DLQ-before-commit, metrics, graceful stop.

Run: python examples/streaming_dlq.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.pipeline import Pipeline  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402
from kpipe_spark.streaming import StreamRunner  # noqa: E402
from kpipe_spark.streaming.runner import CircuitBreaker  # noqa: E402
from kpipe_spark.streaming.sources import file_source  # noqa: E402

SCHEMA = "event_id bigint, event_type string, value double"


def main() -> None:
    spark = get_spark(app_name="example-streaming-dlq")
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="kpipe-example-")
    src = os.path.join(workdir, "incoming")
    os.makedirs(src)
    with open(os.path.join(src, "batch1.json"), "w") as f:
        for i in range(100):
            f.write(
                json.dumps(
                    {
                        "event_id": i,
                        "event_type": "error" if i % 10 == 7 else "ok",
                        "value": float(i),
                    }
                )
                + "\n"
            )

    delivered: list[int] = []
    parked: list[int] = []

    runner = StreamRunner(
        pipeline=(
            Pipeline()
            .fail_when(F.col("event_type") == "error", "boom")
            .filter(F.col("value") >= 50.0)
        ),
        sink=lambda df, batch_id: delivered.append(df.count()),
        dlq_writer=lambda df, batch_id: parked.append(df.count()),
        circuit_breaker=CircuitBreaker(failure_threshold=0.9, window=1000),
    )

    handle = runner.start(
        file_source(spark, src, SCHEMA),
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        query_name="example",
    )
    handle.process_all_available()  # deterministic flush (TestStream.flush)
    handle.close()  # graceful stop; uncommitted work would replay

    print("delivered per batch:", delivered)
    print("DLQ-parked per batch:", parked)
    print("metrics:", handle.metrics())
    print("health:", {k: v for k, v in handle.health().items() if k == "running"})


if __name__ == "__main__":
    main()
