#!/usr/bin/env python
"""Lag-based backpressure, end to end — the admission-control loop the
reference runs inside its consumer (BackpressureController.java:24-136)
mapped onto Structured Streaming's restart model.

Spark fixes source options at query start, so the governor's
recommendation applies by ROLLING the query: poll ``Handle.govern()``
(which folds ``lastProgress`` lag into the hysteresis core), and when
the recommended admission changes materially, stop the query and
restart it from the same checkpoint with the new per-trigger budget.

THE ROLL HAS A COST — own it: the restart resumes from the last
COMMITTED batch, so an in-flight (uncommitted) micro-batch at roll
time is abandoned and REPLAYS in full under the new admission. That is
ordinary at-least-once redelivery (idempotent sinks / the batch_id-
keyed DLQ absorb it), but it is paid work: poll ``govern()`` between
batches and roll at a batch boundary (as ``Handle.close()`` after
``processAllAvailable`` does here) and the roll loses nothing — this
example asserts exactly that, no record is processed twice across the
roll. The reference pays no such cost because pause/resume leaves its
consumer running (BackpressureController.java:24-37); rolling is the
price of Spark fixing source options at start, so hysteresis matters
doubly — the watermark gap is what keeps rolls RARE.

This example drives the loop with synthetic lag samples (no
Kafka broker in this container; the lag parser is the same one a Kafka
``lastProgress`` feeds) and shows a real file-backed query restarting
under a shrunken budget.

Run: python examples/backpressure_roll.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kpipe_spark.pipeline import Pipeline  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402
from kpipe_spark.streaming import BackpressureGovernor, StreamRunner  # noqa: E402
from kpipe_spark.streaming.sources import file_source  # noqa: E402

SCHEMA = "event_id bigint, value double"


def main() -> None:
    spark = get_spark(app_name="example-backpressure-roll")
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="kpipe-example-bp-")
    src = os.path.join(workdir, "incoming")
    ckpt = os.path.join(workdir, "ckpt")
    os.makedirs(src)
    with open(os.path.join(src, "b1.json"), "w") as f:
        for i in range(100):
            f.write(json.dumps({"event_id": i, "value": float(i)}) + "\n")

    governor = BackpressureGovernor(
        high_watermark=10_000, low_watermark=7_000, max_admission=100_000
    )
    runner = StreamRunner(pipeline=Pipeline(), sink=lambda df, bid: None)

    # phase 1: healthy consumer at full admission
    handle = runner.start(
        file_source(spark, src, SCHEMA), ckpt, backpressure=governor
    )
    handle.process_all_available()
    print("phase 1: lag=%d admission=%d" % (handle.lag(), handle.govern()))

    # a lag spike arrives (synthetic samples standing in for the Kafka
    # lastProgress offsets a real deployment feeds through handle.lag())
    for lag in (15_000, 22_000, 18_000):
        admission = governor.observe(lag)
        print("lag sample %d -> recommended admission %d" % (lag, admission))
    assert governor.paused and governor.admission < governor.max_admission

    # the recommendation changed materially: ROLL the query — stop,
    # restart from the SAME checkpoint with the shrunken trigger budget
    handle.close()
    with open(os.path.join(src, "b2.json"), "w") as f:
        for i in range(100, 150):
            f.write(json.dumps({"event_id": i, "value": float(i)}) + "\n")
    # (a Kafka deployment passes max_offsets_per_trigger=governor.admission
    # to kafka_source here; the file source's analogue caps files/trigger)
    handle2 = runner.start(
        file_source(spark, src, SCHEMA, max_files_per_trigger=1),
        ckpt,
        backpressure=governor,
    )
    handle2.process_all_available()
    print(
        "rolled with admission=%d; records processed total=%d"
        % (governor.admission, runner.metrics.counters["records.received"])
    )
    # boundary-roll cost assertion: phase 1 (100) + new file (50), no
    # replay — the roll happened at a batch boundary so the checkpoint
    # was current; a mid-batch roll would re-run the in-flight batch
    # (at-least-once), which is why govern() is polled between batches
    assert runner.metrics.counters["records.received"] == 150, (
        "boundary roll must not reprocess committed records"
    )

    # lag drains: hysteresis resumes full admission
    governor.observe(6_000)
    assert not governor.paused and governor.admission == governor.max_admission
    handle2.close()
    print("drained: admission restored to", governor.admission)
    print("backpressure loop: shrink -> roll -> restore = True")


if __name__ == "__main__":
    main()
