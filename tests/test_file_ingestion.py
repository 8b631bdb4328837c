"""read_jsonl: the file front door must honor the same delivery
contract as the Kafka decode path — a corrupt line is a failed RECORD
(raw line preserved, DLQ-routable), never a failed job, and every
input line is accounted for exactly once."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kpipe_spark.pipeline import read_jsonl
from kpipe_spark.pipeline.result import ERROR_COL, STATUS_COL

LINES = [
    '{"doc_id": 1, "text": "alpha beta"}',
    '{"doc_id": 2, "text": "gamma delta"}',
    'this is not json at all',
    '{"doc_id": 3, "text": "epsilon"}',
    '',
    '{"doc_id": 4, "text": "unterminated',
]

SCHEMA = "doc_id bigint, text string"


def _write(src: str, name: str = "part1.jsonl") -> None:
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        f.write("\n".join(LINES) + "\n")


def test_jsonl_batch_outcome_accounting(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(src)
    df = read_jsonl(spark, src, SCHEMA)
    rows = df.collect()
    assert len(rows) == len(LINES)  # every line accounted, none dropped
    passed = [r for r in rows if r[STATUS_COL] == "passed"]
    failed = [r for r in rows if r[STATUS_COL] == "failed"]
    assert {r["payload"]["doc_id"] for r in passed} == {1, 2, 3}
    assert len(failed) == 3  # garbage, blank, unterminated
    for r in failed:
        assert r[ERROR_COL].startswith("DeserializationException")
    # the raw line survives for DLQ forensics
    assert any("not json at all" in r["raw"] for r in failed)


def test_jsonl_streaming_routes_corrupt_to_dlq(spark, tmp_path):
    """New files arriving = micro-batches; corrupt lines park in the
    DLQ while parsed lines reach the sink — the crawl-shard ingestion
    loop end to end."""
    from kpipe_spark.pipeline import Pipeline
    from kpipe_spark.streaming import StreamRunner

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write(src)
    stream = read_jsonl(spark, src, SCHEMA, streaming=True)
    delivered, parked = [], []
    runner = StreamRunner(
        pipeline=Pipeline().pipe("n_tokens", F.size(F.split("payload.text", " "))),
        sink=lambda df, bid: delivered.extend(df.collect()),
        dlq_writer=lambda df, bid: parked.extend(df.collect()),
    )
    handle = runner.start(stream, ckpt, "jsonl-ingest")
    try:
        handle.process_all_available()
    finally:
        handle.close()
    assert {r["payload"]["doc_id"] for r in delivered} == {1, 2, 3}
    assert len(parked) == 3


def test_jsonl_schemaless_map_mode(spark, tmp_path):
    """decode_json's schema-less map mode has no corrupt-record column;
    read_jsonl must still classify a malformed line as failed (NULL
    map) instead of crashing on the missing error column."""
    src = str(tmp_path / "src")
    _write(src)
    df = read_jsonl(spark, src, "map<string,string>")
    rows = df.collect()
    assert len(rows) == len(LINES)
    statuses = [r[STATUS_COL] for r in rows]
    assert statuses.count("passed") == 3
    assert statuses.count("failed") == 3


def test_streaming_curation_end_to_end(spark, tmp_path):
    """The whole ingestion story composed: a JSONL stream decodes under
    the outcome contract, a Pipeline quality gate filters short docs,
    arriving docs near-dup-check against a static corpus band index
    (stream-static join — no corpus re-scan), and the terminal split
    delivers clean docs while corrupt lines park in the DLQ. Every
    input line is accounted for across the three outcomes."""
    import json
    import os

    from pyspark.sql import functions as F

    from kpipe_spark.functions import dedup as D
    from kpipe_spark.pipeline import Pipeline
    from kpipe_spark.streaming import StreamRunner

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    corpus = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id bigint, text string",
    )
    index = D.minhash_bands_df(D.minhash_signature_df(corpus))
    lines = [
        # passes gate, novel -> delivered
        {"doc_id": 1, "text": "completely novel content with enough words here"},
        # near-dup of the indexed corpus doc -> delivered but flagged
        {"doc_id": 2, "text": "alpha beta gamma delta epsilon zeta eta theta"},
        # too short -> filtered by the gate
        {"doc_id": 3, "text": "tiny"},
    ]
    with open(os.path.join(src, "b1.jsonl"), "w") as f:
        for r in lines:
            f.write(json.dumps(r) + "\n")
        f.write("{broken json\n")  # -> DLQ

    stream = read_jsonl(spark, src, "doc_id bigint, text string",
                        streaming=True)
    delivered, parked = [], []

    def admit_sink(df, batch_id):
        new = df.select(F.col("payload.doc_id").alias("doc_id"),
                        F.col("payload.text").alias("text"))
        hits = (
            D.minhash_bands_df(D.minhash_signature_df(new))
            .join(index.withColumnRenamed("doc_id", "corpus_id"),
                  ["band", "bucket"])
            .select("doc_id").distinct()
            .withColumn("is_dup", F.lit(True))
        )
        delivered.extend(
            new.join(hits.select("doc_id", "is_dup"), "doc_id", "left")
            .select("doc_id", F.coalesce("is_dup", F.lit(False)).alias("is_dup"))
            .collect()
        )

    runner = StreamRunner(
        pipeline=Pipeline().filter(
            F.size(F.split(F.col("payload.text"), " ")) >= 5
        ),
        sink=admit_sink,
        dlq_writer=lambda df, bid: parked.extend(df.collect()),
    )
    handle = runner.start(stream, ckpt, "curation-e2e")
    try:
        handle.process_all_available()
    finally:
        handle.close()
    got = {r["doc_id"]: r["is_dup"] for r in delivered}
    assert got == {1: False, 2: True}  # doc 3 filtered, line 4 parked
    assert len(parked) == 1


def test_streaming_drift_monitoring(spark, tmp_path):
    """Drift monitoring at ingest: the monitor's state — (source,
    bucket) hashed-bigram counts — is ADDITIVE, so a JSONL stream
    ingested in micro-batches, with each batch's counts summed into an
    accumulator, must yield EXACTLY d72's batch report over the same
    documents. This is the 100 TB shape: the stored state stays
    <= |sources| x 4096 rows and the corpus is never re-scanned."""
    import json
    import os
    from collections import defaultdict

    from pyspark.sql import functions as F

    from kpipe_spark.functions.monitoring import (
        bigram_bucket_counts,
        source_kl_bits,
    )
    from kpipe_spark.queries import all_queries

    docs = [
        (0, "alpha beta gamma delta alpha beta", "src0"),
        (1, "alpha beta gamma delta epsilon zeta", "src0"),
        (2, "omega psi chi phi omega psi chi", "src1"),
        (3, "alpha beta omega psi gamma delta", "src1"),
        (4, "epsilon zeta eta theta iota kappa", "src2"),
        (5, "alpha alpha alpha alpha alpha alpha", "src2"),
    ]
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    # three files -> three micro-batches (maxFilesPerTrigger=1)
    for i in range(3):
        with open(os.path.join(src, f"b{i}.jsonl"), "w") as f:
            for d, t, s in docs[i * 2 : i * 2 + 2]:
                f.write(json.dumps({"doc_id": d, "text": t, "source": s}) + "\n")

    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .text(src)
        .select(
            F.from_json(
                F.col("value"), "doc_id bigint, text string, source string"
            ).alias("payload")
        )
    )
    acc: dict[tuple[str, int], int] = defaultdict(int)
    batches = []

    def monitor_sink(df, batch_id):
        cnt = bigram_bucket_counts(df.select("payload.*"))
        rows = cnt.collect()
        if rows:
            batches.append(batch_id)
        for r in rows:
            acc[(r["source"], r["bucket"])] += r["c"]

    qy = (
        stream.writeStream.foreachBatch(monitor_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    qy.awaitTermination(120)
    assert len(batches) >= 2, "expected incremental micro-batches"

    acc_df = spark.createDataFrame(
        [(s, b, c) for (s, b), c in acc.items()],
        "source string, bucket long, c long",
    )
    streamed = {
        r["source"]: (r["n_bigrams"], r["kl_bits"])
        for r in source_kl_bits(acc_df).collect()
    }

    # batch reference: d72 over the same documents written as a table
    ref_dir = str(tmp_path / "ref")
    spark.createDataFrame(
        [(d, t, "en", s, len(t)) for d, t, s in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(os.path.join(ref_dir, "documents.parquet"))
    batch = {
        r["source"]: (r["n_bigrams"], r["kl_bits"])
        for r in all_queries()["d72_source_kl_drift"]
        .build(spark, ref_dir)
        .collect()
    }
    assert streamed == batch
