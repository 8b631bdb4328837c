#!/usr/bin/env python
"""Streaming corpus admission — exactly-once index STATE on top of
at-least-once delivery, without a transactional sink.

Micro-batches of arriving documents flow through StreamRunner into a
foreachBatch sink that admits each batch against the stored
CorpusIndex and appends the admitted docs:

    stream ─▶ Pipeline (outcome contract) ─▶ admit ─▶ append(admitted)

At-least-once means a crash can REPLAY a batch the sink already
applied. The index's same-id re-ingest detection makes the replay a
no-op: every replayed doc collides with its own indexed copy,
admitted=False, nothing appends. This example proves it the blunt
way — re-running the whole stream on a FRESH checkpoint (every batch
re-delivered, the worst-case replay geometry) and showing the index
byte-count unchanged.

Run: python examples/streaming_admission.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kpipe_spark.catalog import load_table  # noqa: E402
from kpipe_spark.functions.corpus_index import CorpusIndex  # noqa: E402
from kpipe_spark.pipeline import Pipeline  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402
from kpipe_spark.streaming import StreamRunner  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="streaming-admission", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    is_new = "doc_id % 4 = 0"
    idx = CorpusIndex.build(
        spark,
        docs.filter(f"NOT ({is_new})").select("doc_id", "text"),
        f"stream_admit_{uuid.uuid4().hex[:8]}",
        num_buckets=8,
    )
    workdir = tempfile.mkdtemp(prefix="stream-admit-")
    src = os.path.join(workdir, "src")
    os.makedirs(src)
    # the 'arriving' docs, split into two micro-batch files
    arriving = docs.filter(is_new).select("doc_id", "text")
    arriving.filter("doc_id % 8 = 0").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    arriving.filter("doc_id % 8 = 4").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    admitted_per_batch: list[int] = []

    def admit_sink(df, batch_id):
        batch = df.select("doc_id", "text")
        ledger = idx.admit(batch)
        admitted = batch.join(
            ledger.filter("admitted").select("doc_id"), "doc_id", "semi"
        )
        admitted_per_batch.append(admitted.count())
        idx.append(admitted)

    def run(ckpt: str) -> None:
        runner = StreamRunner(
            pipeline=Pipeline().require_field("doc_id"), sink=admit_sink
        )
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        handle = runner.start(stream, os.path.join(workdir, ckpt), ckpt)
        try:
            handle.process_all_available()
        finally:
            handle.close()

    try:
        run("first")
        first_admits = sum(admitted_per_batch)
        rows_after_first = spark.table(idx.table).count()
        print(f"first pass admitted {first_admits} docs across "
              f"{len(admitted_per_batch)} micro-batches")

        # worst-case replay: fresh checkpoint re-delivers EVERY batch
        admitted_per_batch.clear()
        run("replayed")
        replay_admits = sum(admitted_per_batch)
        unchanged = spark.table(idx.table).count() == rows_after_first
        print(
            "replay admitted 0 and left the index unchanged =",
            replay_admits == 0 and unchanged,
        )
    finally:
        idx.drop()


if __name__ == "__main__":
    main()
