#!/usr/bin/env python
"""Streaming ingest into a stored IVF-PQ index — embeddings arriving
per micro-batch, encoded against the STORED codebooks, with the
small-file advisory firing and ``compact()`` restoring the one-file-
per-cell layout, search parity intact throughout.

This completes the streaming story for the third stored-artifact
family: `streaming_admission.py` maintains a CorpusIndex (+ BloomGate)
per micro-batch, `corpus_monitoring.py` the CMS/HLL sketches; here the
AnnIndex ingests a stream:

    base vectors ──▶ AnnIndex.build          (centroids + codebooks
                                               trained once, stored)
    stream ──▶ foreachBatch ──▶ update_batch (encode against STORED
                                               side tables — never
                                               re-trained, so old
                                               codes stay valid;
                                               batch-id marker skips
                                               re-delivered batches)
    each append ─▶ file-count advisory       (each append adds a file
                                               per (task, cell); past
                                               the threshold the WARN
                                               says run compact())
    idx.compact()                            (one file per cell again,
                                               cell partitioning — and
                                               the search's partition
                                               pruning — preserved;
                                               also the crash-window
                                               repair: exact-duplicate
                                               code rows dedup here)

    Replay matters MORE here than for the sketches: a duplicated code
    row doesn't just duplicate a result — search sums ADC terms per
    (query, neighbor), so a double-appended vector scores 2× its true
    distance and drops out of every top-k. The worst-case replay
    below (fresh checkpoint, every batch re-delivered) must leave the
    code table row-identical.

Parity pin: the deterministic training convention (centroids = first
n_cells vectors, codebooks = first k_codes residual subvectors — all
inside the base split here) means base-build + streamed appends must
end in EXACTLY the state a one-shot full build produces, so
``search`` over d88's eval panel must return the oracle-checked
`d88_ivfpq_topk` registry rows — checked BEFORE compaction (appends
alone must serve correctly) and AFTER (compaction moves bytes, never
results).

Run: python examples/ann_streaming_append.py [sf_dir]
"""

from __future__ import annotations

import logging
import os
import shutil
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kpipe_spark.catalog import load_table  # noqa: E402
from kpipe_spark.functions.ann_index import AnnIndex  # noqa: E402
from kpipe_spark.pipeline import Pipeline  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402
from kpipe_spark.streaming import StreamRunner  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="ann-streaming-append", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    # base must contain vec_id < max(n_cells, k_codes): the
    # deterministic first-k training convention then trains the SAME
    # centroids/codebooks a full-corpus build would, which is what
    # makes the final state comparable to the oracle-checked query
    is_base = "vec_id < 64 OR vec_id % 3 != 0"
    idx = AnnIndex.build(
        spark, emb.filter(is_base), f"ann_stream_{uuid.uuid4().hex[:8]}"
    )
    workdir = tempfile.mkdtemp(prefix="ann-stream-")
    src = os.path.join(workdir, "src")
    os.makedirs(src)
    arriving = emb.filter(f"NOT ({is_base})")
    for k in range(3):  # three micro-batch files
        arriving.filter(f"vec_id % 9 = {3 * k}").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # the advisory is the compaction trigger signal — drop the
    # threshold so this bounded demo crosses it, and record the WARN
    idx.advisory_files_per_cell = 1
    advisories: list[str] = []

    class _Capture(logging.Handler):
        def emit(self, record: logging.LogRecord) -> None:
            if "compact()" in record.getMessage():
                advisories.append(record.getMessage())

    handler = _Capture()
    logging.getLogger("kpipe_spark.functions.ann_index").addHandler(handler)

    applied_per_batch: list[bool] = []

    def ingest_sink(df, batch_id):
        # encode against the STORED centroids/codebooks (append never
        # re-trains — re-training would silently re-key stored codes);
        # the batch-id marker makes a re-delivered batch a no-op
        applied_per_batch.append(idx.update_batch(df, batch_id))

    def run(ckpt: str) -> None:
        runner = StreamRunner(
            pipeline=Pipeline().require_field("vec_id"), sink=ingest_sink
        )
        stream = (
            spark.readStream.schema(
                "vec_id bigint, embedding array<float>, label int"
            )
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
        n_rows = spark.table(idx.table).count()
        n_files = len(spark.table(idx.table).inputFiles())
        print(
            "ingested %d micro-batches (applied %s); %d code rows, %d files"
            % (
                len(applied_per_batch),
                applied_per_batch,
                n_rows,
                n_files,
            )
        )
        advisory_fired = len(advisories) > 0

        # worst-case replay: a fresh checkpoint re-delivers EVERY
        # batch under the same ids; the marker skips them all and the
        # code table must be row-identical (a duplicate would CORRUPT
        # distances, not just add a row — module docstring)
        applied_per_batch.clear()
        run("replayed")
        replay_safe = (
            not any(applied_per_batch)
            and spark.table(idx.table).count() == n_rows
        )

        # parity BEFORE compaction: appends alone must serve correctly
        from kpipe_spark.queries import all_queries

        panel = emb.filter("vec_id % 25 = 0 AND vec_id < 500")
        want = sorted(
            map(
                tuple,
                all_queries()["d88_ivfpq_topk"].build(spark, sf_dir).collect(),
            )
        )
        pre = sorted(map(tuple, idx.search(panel, k=10, nprobe=2).collect()))

        # the advisory's remedy: back to one file per cell, pruning
        # (and results) intact
        idx.compact()
        n_files_after = len(spark.table(idx.table).inputFiles())
        n_cells_used = spark.table(idx.table).select("cell").distinct().count()
        post = sorted(map(tuple, idx.search(panel, k=10, nprobe=2).collect()))
        print(
            "compacted %d files -> %d (%d cells in use)"
            % (n_files, n_files_after, n_cells_used)
        )

        print(
            "replay-safe streaming append -> advisory -> compact, "
            "search == oracle d88 rows =",
            advisory_fired
            and replay_safe
            and pre == want
            and post == want
            and n_files_after == n_cells_used,
        )
    finally:
        logging.getLogger("kpipe_spark.functions.ann_index").removeHandler(handler)
        idx.drop()
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
