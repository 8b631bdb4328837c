#!/usr/bin/env python
"""Circuit-breaker walkthrough — the analogue of the reference's
``examples/circuit-breaker`` app: a stream whose records fail at first
(>= 50% failure rate over a 5-outcome window trips the breaker), then
recover — driving the CLOSED -> OPEN -> HALF_OPEN -> CLOSED cycle in
one run (Stream.withCircuitBreaker, Stream.java:161-185; state machine
ConsumerHealthController.java:292-451).

While OPEN the runner pauses consumption for ``open_duration_s`` (the
Spark analogue of kpipe pausing the consumer while keeping group
membership); the first batch after the pause is the HALF_OPEN probe —
success closes the breaker, failure re-opens it.

Run: python examples/circuit_breaker.py
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


def write_batch(src: str, name: str, rows: list[dict]) -> None:
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def main() -> None:
    spark = get_spark(app_name="example-circuit-breaker")
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="kpipe-example-cb-")
    src = os.path.join(workdir, "incoming")
    os.makedirs(src)

    breaker = CircuitBreaker(failure_threshold=0.5, window=5, open_duration_s=0.5)
    runner = StreamRunner(
        pipeline=Pipeline().fail_when(F.col("event_type") == "error", "downstream"),
        sink=lambda df, bid: None,
        dlq_writer=lambda df, bid: None,
        circuit_breaker=breaker,
    )

    states: list[str] = []

    # batch 1: simulated downstream outage — every record fails; window
    # fills at 100% failure rate => breaker trips to OPEN
    write_batch(
        src,
        "b1.json",
        [{"event_id": i, "event_type": "error", "value": 1.0} for i in range(10)],
    )
    handle = runner.start(file_source(spark, src, SCHEMA), os.path.join(workdir, "ckpt"))
    handle.process_all_available()
    states.append(breaker.state)
    print("after outage batch: state=%s trips=%d" % (breaker.state, breaker.trips))

    # batch 2: downstream recovered. The runner's gate() sleeps out the
    # remaining open window, flips to HALF_OPEN, and this batch is the
    # probe — all-success closes the breaker.
    write_batch(
        src,
        "b2.json",
        [{"event_id": 100 + i, "event_type": "ok", "value": 1.0} for i in range(10)],
    )
    handle.process_all_available()
    states.append(breaker.state)
    handle.close()

    print("after recovery probe: state=%s" % breaker.state)
    print("metrics:", {k: v for k, v in handle.metrics().items() if "circuit" in k})
    assert states == ["OPEN", "CLOSED"], states
    print("cycle: CLOSED -> OPEN -> HALF_OPEN -> CLOSED =", True)


if __name__ == "__main__":
    main()
