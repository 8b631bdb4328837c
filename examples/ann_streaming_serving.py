#!/usr/bin/env python
"""Streaming ANN serving — Kafka-framed query vectors searched per
micro-batch against the stored IVF-PQ index (round-11 verdict item #6:
ingest was already streaming via ``update_batch``; this closes the
loop in the other direction, the 100 TB composition "stream of queries
vs stored index").

    kafka frames ─▶ Pipeline (JSON decode -> require embedding)
                 ─▶ StreamRunner sink = AnnIndex.serving_sink
                       │  per batch: probe cells collect to a STATIC
                       │  partition filter — the scan opens ONLY that
                       │  batch's probed cells' files (the d88 shape)
                       └▶ deliver(hits, batch_id)  (the downstream sink)

The source here is the broker-free Kafka-shaped file source
(``as_kafka_shaped`` — byte-identical envelope to Spark's Kafka
source), so the exact same Pipeline + StreamRunner composition runs on
``kafka_source(...)`` in production unchanged.

What the run proves:

1. streamed hits == the batch path's ``search`` over the same queries
   (the per-batch session clone changes nothing),
2. every batch's executed plan carries a PartitionFilters entry on the
   code table restricted to that batch's probe set,
3. failed frames (undecodable JSON / missing embedding) go to the DLQ,
   never to the search.

Run: python examples/ann_streaming_serving.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.functions.ann_index import AnnIndex  # noqa: E402
from kpipe_spark.pipeline import Pipeline  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402
from kpipe_spark.streaming import StreamRunner  # noqa: E402
from kpipe_spark.streaming.sources import as_kafka_shaped  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="ann-streaming-serving", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    stem = f"ann_serve_{uuid.uuid4().hex[:8]}"
    idx = AnnIndex.build(spark, emb, stem)

    # the 'arriving' queries, framed the way a Kafka producer would
    # frame them: one JSON value per record {"vec_id": ..., "embedding":
    # [...]}; plus one poison frame that must land in the DLQ
    panel = emb.filter("vec_id % 25 = 0 AND vec_id < 500")
    frames = as_kafka_shaped(
        panel.select(
            F.to_json(F.struct("vec_id", "embedding")).alias("payload")
        ),
        value_from="payload",
        topic="ann-queries",
    )
    poison = as_kafka_shaped(
        spark.createDataFrame([("not json",)], "payload string"),
        value_from="payload",
        topic="ann-queries",
    )
    workdir = tempfile.mkdtemp(prefix="ann-serving-")
    src = os.path.join(workdir, "src")
    frames.union(poison).write.parquet(src)

    # decode: JSON value -> (vec_id, embedding); an undecodable frame
    # FAILS the pipeline (fail_when -> DLQ envelope, offset semantics),
    # it is not silently filtered — a serving query that vanishes
    # without a DLQ record is an unanswerable SLA dispute
    schema = "vec_id bigint, embedding array<float>"
    pipeline = (
        Pipeline()
        .pipe("decoded", F.from_json(F.col("value").cast("string"), schema))
        .pipe("vec_id", F.col("decoded.vec_id"))
        .pipe("embedding", F.col("decoded.embedding"))
        .fail_when(F.col("embedding").isNull(), "DeserializationException")
    )

    hits_rows: list[tuple] = []
    plans: list[str] = []
    dlq_rows: list[str] = []

    def deliver(hits, batch_id):
        rows = hits.collect()
        hits_rows.extend(tuple(r) for r in rows)
        # a batch whose frames ALL failed decode searches nothing —
        # there is no scan to assert pruning on
        if rows:
            plans.append(
                hits._jdf.queryExecution().executedPlan().toString()
            )

    def dlq(df, batch_id):
        dlq_rows.extend(
            r["value"].decode() for r in df.select("value").collect()
        )

    runner = StreamRunner(
        pipeline=pipeline,
        sink=idx.serving_sink(deliver, k=10, nprobe=2),
        dlq_writer=dlq,
    )
    stream = (
        spark.readStream.schema(frames.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    handle = runner.start(
        stream, os.path.join(workdir, "ckpt"), "ann-serving-example"
    )
    try:
        handle.process_all_available()
    finally:
        handle.close()

    # 1. parity with the batch path
    want = sorted(
        tuple(r) for r in idx.search(panel, k=10, nprobe=2).collect()
    )
    parity_ok = sorted(hits_rows) == want

    # 2. every searching batch's scan was partition-pruned to its
    # probe set
    pruned_ok = bool(plans) and all(
        any(
            idx.table in ln and "PartitionFilters: [cell" in ln
            for ln in plan.splitlines()
        )
        for plan in plans
    )

    # 3. the poison frame went to the DLQ, not the search
    dlq_ok = any("not json" in v for v in dlq_rows)

    # --- adaptive probing leg (round-12 verdict #6) -----------------
    # the same serving surface with a probe BUDGET instead of a fixed
    # nprobe: the probe decision reads a (cell, n) mass profile — by
    # default the artifact's own stored __cellcounts side table
    # (maintained at build/append/compact, never a code-table scan) —
    # and the number of probed cells adapts to where the mass sits:
    # uniform mass ⇒ exactly `budget` cells; half the corpus in the
    # query's first-ranked cell ⇒ the gate stops at 1.
    import re

    def probed_cells(plan: str) -> int:
        for ln in plan.splitlines():
            if idx.table not in ln or "PartitionFilters: [" not in ln:
                continue
            pf = re.search(r"PartitionFilters: \[([^\]]*)", ln).group(1)
            if "cell" not in pf:
                continue
            m = re.search(r"IN \(([^)]*)\)", pf) or re.search(
                r"INSET ([0-9, ]+)", pf
            )
            if m:
                return len(re.findall(r"\d+", m.group(1)))
            if re.search(r"= \d+", pf):
                return 1  # single probe renders as `(cell#NNN = c)`
        raise AssertionError(
            f"no pruned code-table scan in plan:\n{plan[:4000]}"
        )

    one = emb.filter("vec_id = 100")
    first_cell = (
        idx.search(one, k=5, nprobe=1).select("cell").distinct().collect()
    )[0]["cell"]
    skew_table = f"{stem}_profskew"
    uniform_table = f"{stem}_profuni"
    spark.createDataFrame(
        [(c, 10) for c in range(idx.n_cells)], "cell long, n long"
    ).write.saveAsTable(uniform_table)
    spark.createDataFrame(
        [
            (c, 160 if c == first_cell else 160 // (idx.n_cells - 1))
            for c in range(idx.n_cells)
        ],
        "cell long, n long",
    ).write.saveAsTable(skew_table)

    qsrc = os.path.join(workdir, "adaptive-queries")
    one.coalesce(1).write.parquet(qsrc)
    adaptive_counts: dict[str, int] = {}
    for label, prof in (
        ("stored_profile", None),
        ("uniform_profile", uniform_table),
        ("skewed_profile", skew_table),
    ):
        leg_plans: list[str] = []

        def deliver_leg(hits, batch_id, _plans=leg_plans):
            hits.collect()
            _plans.append(
                hits._jdf.queryExecution().executedPlan().toString()
            )

        handle = idx.serve(
            spark.readStream.schema(one.schema).parquet(qsrc),
            os.path.join(workdir, f"ckpt-{label}"),
            deliver_leg,
            k=10,
            probe_budget=2,
            cell_counts_table=prof,
            query_name=f"ann-adaptive-{label}",
        )
        try:
            handle.process_all_available()
        finally:
            handle.close()
        adaptive_counts[label] = probed_cells(leg_plans[0])
    # injected profiles give exact expectations; the stored (true)
    # profile adapts to wherever the corpus mass actually sits
    adaptive_ok = (
        adaptive_counts["uniform_profile"] == 2
        and adaptive_counts["skewed_profile"] == 1
        and 1 <= adaptive_counts["stored_profile"] <= idx.n_cells
    )

    print(
        json.dumps(
            {
                "streamed_hits": len(hits_rows),
                "parity_with_batch_search": parity_ok,
                "every_batch_scan_pruned": pruned_ok,
                "poison_frame_dlqd": dlq_ok,
                "adaptive_probe_cells": adaptive_counts,
                "adaptive_probing_sound": adaptive_ok,
            }
        )
    )
    for t in (skew_table, uniform_table):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    idx.drop()
    ok = parity_ok and pruned_ok and dlq_ok and adaptive_ok
    print(f"streaming ANN serving sound = {ok}")
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
