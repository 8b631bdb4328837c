#!/usr/bin/env python
"""The 80% path, batch flavor — the engine's analogue of the reference's
examples/json app (KPipe.json(topic).pipe(...).toConsole().start()):

    KPipe.json("events", props)
         .filter(...)
         .pipe(...)
         .withDeadLetterTopic("events.dlq")
         .toConsole()

Here the same pipeline runs over the events parquet table standing in
for the topic; swap `load_table` for `kafka_source(...)` + decode_json
to run against a broker.

Run: python examples/json_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.catalog import load_table  # noqa: E402
from kpipe_spark.pipeline import Pipeline, outcome_counts  # noqa: E402
from kpipe_spark.pipeline.sinks import dlq_frame, to_console  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example-json-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    events = load_table(spark, sf_dir, "events")

    pipeline = (
        Pipeline()
        .pipe("k_val", F.get_json_object("props", "$.k").cast("int"))
        .fail_when(F.col("event_type") == "error", "DeserializationException")
        .require_field("k_val")
        .filter(F.col("value") > 50.0)
        .add_field("pipeline_version", "v1")
    )

    applied = pipeline.apply(events)
    print("outcomes:", outcome_counts(applied))

    passed = applied.filter(F.col("_status") == "passed")
    to_console(passed.select("event_id", "event_type", "value", "k_val"), n=5)

    dlq = dlq_frame(applied)
    print(f"DLQ rows: {dlq.count()} (would produce to events.dlq)")


if __name__ == "__main__":
    main()
