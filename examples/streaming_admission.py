#!/usr/bin/env python
"""Streaming corpus admission — exactly-once index STATE on top of
at-least-once delivery, without a transactional sink, with a Bloom
sketch gate maintained per micro-batch in front of the stored index.

Micro-batches of arriving documents flow through StreamRunner into a
foreachBatch sink that admits each batch against the stored
CorpusIndex and appends the admitted docs:

    stream ─▶ Pipeline ─▶ bloom gate ─▶ admit ─▶ append(admitted)
                              │                      │
                              └── update_batch(batchId) ──┘

The gate (``functions/sketches.BloomGate``) holds the corpus's BAND
KEYS as a fixed-size bitmap (≤ m rows whatever the corpus,
broadcastable forever). Band collisions happen exactly on key
equality, so a batch doc whose EVERY band key probes negative
certainly has no corpus collision — at 100 TB those docs skip the
stored index's band join entirely; only may-collide docs (plus the
~fill^k false-positive fraction) pay it. This example audits that
claim per batch: every gate-cleared doc must show n_corpus_dups = 0
in the full admission ledger. The gate stays CURRENT by inserting the
admitted docs' band keys per micro-batch.

At-least-once means a crash can REPLAY a batch the sink already
applied. Both state stores shrug: the index's same-id re-ingest
detection makes replayed docs collide with their own indexed copies
(admitted=False, nothing appends), and the gate's ``update_batch``
skips already-applied batch ids — and is set-union idempotent even if
the skip marker itself were lost. This example proves it the blunt
way: re-running the whole stream on a FRESH checkpoint (every batch
re-delivered, the worst-case replay geometry) and showing index rows
AND gate bits unchanged.

Run: python examples/streaming_admission.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.catalog import load_table  # noqa: E402
from kpipe_spark.functions.corpus_index import CorpusIndex  # noqa: E402
from kpipe_spark.functions.sketches import BloomGate  # noqa: E402
from kpipe_spark.pipeline import Pipeline  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402
from kpipe_spark.streaming import StreamRunner  # noqa: E402
from kpipe_spark.util import free_local_checkpoint  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="streaming-admission", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    is_new = "doc_id % 4 = 0"
    stem = f"stream_admit_{uuid.uuid4().hex[:8]}"
    idx = CorpusIndex.build(
        spark,
        docs.filter(f"NOT ({is_new})").select("doc_id", "text"),
        stem,
        num_buckets=8,
    )
    # the sketch front door: corpus band keys -> fixed-size bitmap
    gate = BloomGate.build_from_keys(
        spark, idx.band_keys(), f"{stem}_gate"
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
    gate_cleared: list[int] = []
    gate_unsound: list[int] = []

    def admit_sink(df, batch_id):
        batch = df.select("doc_id", "text")
        # probe the gate: per band key, then per doc (a doc may
        # collide iff ANY of its keys probes positive)
        keys = idx.band_keys(batch)
        doc_gate = (
            keys.join(gate.probe_keys(keys.select("key")), "key")
            .groupBy("doc_id")
            .agg(F.max("bloom_positive").alias("may_collide"))
        )
        cleared = doc_gate.filter("may_collide = 0")
        gate_cleared.append(cleared.count())
        ledger = idx.admit(batch)
        # soundness audit: gate-cleared docs must have no corpus dups
        # in the full ledger (no false negatives, per key ⇒ per doc)
        gate_unsound.append(
            ledger.join(cleared, "doc_id", "semi")
            .filter("n_corpus_dups > 0")
            .count()
        )
        admitted = batch.join(
            ledger.filter("admitted").select("doc_id"), "doc_id", "semi"
        )
        admitted_per_batch.append(admitted.count())
        # materialize the admitted docs' keys BEFORE append: 'admitted'
        # is lazy over the ledger, and once append lands, re-executing
        # it sees every doc colliding with its own indexed copy — the
        # gate would get zero new keys and drift behind the index
        admitted_keys = idx.band_keys(admitted).localCheckpoint(
            eager=True
        )
        idx.append(admitted)
        # keep the gate current; idempotent on batchId under replay
        gate.update_keys(admitted_keys, batch_id)
        # per-batch checkpoint lifecycle (wave-10 discipline): the
        # ledger's lineage holds admit's internal band freeze — free
        # both before the next batch, or the stream's session
        # accumulates one dead RDD per checkpoint per batch
        free_local_checkpoint(ledger)
        free_local_checkpoint(admitted_keys)

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
        bits_after_first = gate.n_bits_set()
        print(
            f"first pass admitted {first_admits} docs across "
            f"{len(admitted_per_batch)} micro-batches; bloom gate "
            f"cleared {sum(gate_cleared)} docs past the index join, "
            f"soundness violations: {sum(gate_unsound)}"
        )

        # worst-case replay: fresh checkpoint re-delivers EVERY batch
        admitted_per_batch.clear()
        gate_unsound_first = sum(gate_unsound)
        run("replayed")
        replay_admits = sum(admitted_per_batch)
        unchanged = (
            spark.table(idx.table).count() == rows_after_first
            and gate.n_bits_set() == bits_after_first
        )
        sound = gate_unsound_first == 0 and sum(gate_unsound) == 0
        print(
            "replay admitted 0, gate sound, index and bitmap "
            "unchanged =",
            replay_admits == 0 and unchanged and sound,
        )
    finally:
        gate.drop()
        idx.drop()


if __name__ == "__main__":
    main()
