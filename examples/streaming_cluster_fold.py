#!/usr/bin/env python
"""Streaming cluster maintenance — the full curation loop per
micro-batch (round-12 verdict item #3: ClusterIndex was the one stored
artifact without a streaming maintenance path):

    stream ─▶ Pipeline ─▶ bloom gate ─▶ admit ─▶ ClusterIndex.update_batch
                                                   │ 1. fold admitted docs into
                                                   │    the stored components
                                                   │    (refresh_incremental —
                                                   │    batch-scaled quotient fold)
                                                   │ 2. CorpusIndex.append /
                                                   │    append_if_missing (the
                                                   │    ENFORCED fold-then-append
                                                   │    order, marker-policed)
                                                   └ 3. batch-id marker (replay
                                                        re-delivery is a no-op)

What the run proves:

1. worst-case replay safety — the whole stream re-runs on a FRESH
   checkpoint (every batch re-delivered): band rows, component rows,
   and markers all unchanged;
2. the append/marker crash window repairs without duplication — batch
   bands landed but the release_seq bump lost: the replayed
   update_batch reports the fold as a crash-replay and
   ``append_if_missing`` re-stamps the marker instead of re-appending
   (zero duplicate band rows);
3. incremental == full rebuild — the streamed component table equals
   ``ClusterIndex.build`` over the final admitted corpus, exactly.

Run: python examples/streaming_cluster_fold.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.catalog import load_table  # noqa: E402
from kpipe_spark.functions.cluster_index import ClusterIndex  # noqa: E402
from kpipe_spark.functions.corpus_index import CorpusIndex  # noqa: E402
from kpipe_spark.functions.sketches import BloomGate  # noqa: E402
from kpipe_spark.pipeline import Pipeline  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402
from kpipe_spark.streaming import StreamRunner  # noqa: E402
from kpipe_spark.util import free_local_checkpoint  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="streaming-cluster-fold", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    is_new = "doc_id % 4 = 0"
    stem = f"stream_fold_{uuid.uuid4().hex[:8]}"
    base = docs.filter(f"NOT ({is_new})").select("doc_id", "text")
    bands = CorpusIndex.build(spark, base, f"{stem}_bands", num_buckets=8)
    clusters = ClusterIndex.build(spark, base, f"{stem}_clusters")
    gate = BloomGate.build_from_keys(spark, bands.band_keys(), f"{stem}_gate")

    workdir = tempfile.mkdtemp(prefix="stream-fold-")
    src = os.path.join(workdir, "src")
    os.makedirs(src)
    arriving = docs.filter(is_new).select("doc_id", "text")
    for pred in ("doc_id % 8 = 0", "doc_id % 8 = 4"):
        arriving.filter(pred).coalesce(1).write.mode("append").parquet(src)

    admitted_frames: dict[int, list] = {}
    gate_unsound = [0]

    def fold_sink(df, batch_id):
        batch = df.select("doc_id", "text")
        ledger_lazy = bands.admit(batch)
        ledger = ledger_lazy.localCheckpoint(eager=True)
        # the eager checkpoint captured the ledger's rows; admit's
        # internal band freeze under its lineage is superseded
        free_local_checkpoint(ledger_lazy)
        # the sketch front door: docs whose EVERY band key probes
        # negative certainly have no corpus collision — at 100 TB they
        # skip the stored band join entirely. Audited per batch: every
        # gate-cleared doc must show zero corpus dups in the ledger
        # (streaming_admission's soundness check, kept live here too)
        keys = bands.band_keys(batch)
        cleared = (
            keys.join(gate.probe_keys(keys.select("key")), "key")
            .groupBy("doc_id")
            .agg(F.max("bloom_positive").alias("may_collide"))
            .filter("may_collide = 0")
        )
        gate_unsound[0] += (
            ledger.join(cleared, "doc_id", "semi")
            .filter("n_corpus_dups > 0")
            .count()
        )
        # materialize BEFORE the fold appends: 'admitted' is lazy over
        # the ledger, and once the batch's bands land a re-execution
        # would see every doc colliding with its own indexed copy
        admitted = batch.join(
            ledger.filter("admitted").select("doc_id"), "doc_id", "semi"
        ).localCheckpoint(eager=True)
        if batch_id not in admitted_frames:  # replay admits nothing new
            admitted_frames[batch_id] = [
                r["doc_id"] for r in admitted.select("doc_id").collect()
            ]
        gate_keys = bands.band_keys(admitted).localCheckpoint(eager=True)
        # fold-then-append, exactly once per batch id
        clusters.update_batch(admitted, bands, batch_id)
        gate.update_keys(gate_keys, batch_id)
        # per-batch checkpoint lifecycle: a stream holds its session
        # for the whole run, so every unreleased checkpoint accumulates
        # batch over batch (wave-10 discipline, OPTIMIZATION_r13)
        for frame in (ledger, admitted, gate_keys):
            free_local_checkpoint(frame)

    def run(ckpt: str) -> None:
        runner = StreamRunner(
            pipeline=Pipeline().require_field("doc_id"), sink=fold_sink
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

    run("ckpt_a")
    band_rows = spark.table(bands.table).count()
    comp_rows = sorted(map(tuple, clusters.components_df.collect()))
    seq_after = bands.release_seq()

    # 1. worst-case replay: fresh checkpoint re-delivers every batch —
    # the batch-id marker makes each re-delivery a no-op
    run("ckpt_b")
    replay_ok = (
        spark.table(bands.table).count() == band_rows
        and sorted(map(tuple, clusters.components_df.collect())) == comp_rows
        and bands.release_seq() == seq_after
    )

    # 2. the append/marker crash window, live: a new batch's fold and
    # band DATA land but the release_seq bump is lost; the replayed
    # update_batch must re-stamp, not re-append
    crash_batch = (
        spark.createDataFrame(
            [(10_000_001, "crash window replay document")],
            "doc_id bigint, text string",
        ).localCheckpoint(eager=True)
    )
    clusters.refresh_incremental(crash_batch, bands)  # fold landed
    bands._bands_of(crash_batch).write.mode("append").bucketBy(
        8, "band", "bucket"
    ).saveAsTable(bands.table, format="parquet")  # data landed
    spark.catalog.refreshTable(bands.table)  # ... marker bump lost
    rows_mid = spark.table(bands.table).count()
    next_id = clusters.last_batch_id() + 1
    clusters.update_batch(crash_batch, bands, next_id)
    crash_ok = (
        spark.table(bands.table).count() == rows_mid  # zero duplicates
        and bands.release_seq() == seq_after + 1  # marker re-stamped
    )

    # 3. the invariant the cadence machinery serves: streamed
    # components == a full rebuild over the final admitted corpus
    admitted_ids = [i for ids in admitted_frames.values() for i in ids]
    final_corpus = base.unionByName(
        arriving.filter(F.col("doc_id").isin(admitted_ids))
    ).unionByName(crash_batch)
    rebuilt = ClusterIndex.build(spark, final_corpus, f"{stem}_rebuilt")
    parity_ok = sorted(map(tuple, clusters.components_df.collect())) == sorted(
        map(tuple, rebuilt.components_df.collect())
    )

    print(
        json.dumps(
            {
                "batches": len(admitted_frames),
                "admitted_docs": len(admitted_ids),
                "gate_unsound_docs": gate_unsound[0],
                "replay_noop": replay_ok,
                "crash_window_restamped_no_dup": crash_ok,
                "incremental_equals_full_rebuild": parity_ok,
            }
        )
    )
    for art in (rebuilt, clusters, bands, gate):
        art.drop()
    ok = replay_ok and crash_ok and parity_ok and gate_unsound[0] == 0
    print(f"streaming cluster fold sound = {ok}")
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
