#!/usr/bin/env python
"""Heterogeneous multi-topic routing — the analogue of the reference's
MultiBuilder example (KPipe.multi(props).json("orders", ...)
.bytes("audit", ...).start()): ONE source, one checkpoint, per-topic
typed pipelines; unrouted topics drop at WARNING with offsets
advancing.

Run: python examples/multi_topic.py
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
from kpipe_spark.streaming.multi import MultiRunner  # noqa: E402
from kpipe_spark.streaming.sources import file_source  # noqa: E402

SCHEMA = "topic string, key string, payload string, amount double"


def main() -> None:
    spark = get_spark(app_name="example-multi-topic")
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="kpipe-multi-")
    src = os.path.join(workdir, "incoming")
    os.makedirs(src)
    rows = (
        [{"topic": "orders", "key": f"o{i}", "payload": "{}", "amount": float(i)} for i in range(40)]
        + [{"topic": "audit", "key": f"a{i}", "payload": "{}", "amount": 0.0} for i in range(10)]
        + [{"topic": "unknown", "key": "x", "payload": "{}", "amount": 0.0}] * 5
    )
    with open(os.path.join(src, "b1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    received: dict[str, int] = {"orders": 0, "audit": 0}

    def sink_for(topic: str):
        def sink(df, batch_id):
            received[topic] += df.count()

        return sink

    multi = MultiRunner(
        routes={
            "orders": StreamRunner(
                pipeline=Pipeline().filter(F.col("amount") >= 20.0),
                sink=sink_for("orders"),
            ),
            "audit": StreamRunner(pipeline=Pipeline(), sink=sink_for("audit")),
        }
    )

    q = (
        file_source(spark, src, SCHEMA)
        .writeStream.queryName("multi")
        .foreachBatch(multi.process_batch)
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    print("delivered per route:", received)
    print("unrouted dropped:", multi.metrics.counters.get("records.dropped.unrouted"))


if __name__ == "__main__":
    main()
