#!/usr/bin/env python
"""Corpus MONITORING — the per-snapshot health report a production
training-data pipeline runs before admitting a new crawl, composing
the round-4 monitoring operators:

    d72 source KL drift        which source's token distribution moved
    d74 embedding drift        which label's vector centroid moved
    d73 Zipf fit               is the corpus still natural-language-shaped
    d75 vocab coverage curve   how much mass a K-token vocab captures
    d76 OOV rate               which documents fall outside the vocab
    d78 source dup rate        which source started shipping duplicates

In production each number is trended per snapshot and alerting
thresholds sit on the deltas; here we run one snapshot and check the
cross-operator invariants that make the report trustworthy:

  * KL drift is non-negative for every source (Gibbs' inequality)
  * embedding-centroid cosine is in [-1, 1] and L2 >= 0
  * the Zipf slope is negative (frequency falls with rank)
  * the coverage curve is monotone in K and hits 1.0 once K >= vocab
  * mean OOV mass equals 1 - coverage(top-16) over the same corpus
    (the two operators must agree on what "in-vocab" means)

Part 2 — STREAMING monitors (the BloomGate treatment from
examples/streaming_admission.py, applied to the other two stored
sketches): a production monitor doesn't re-derive its sketch per
snapshot; it maintains a CmsSketch (token frequencies) and an
HllSketch (distinct-token cardinality) per micro-batch as documents
arrive, and serves probes from the fixed-geometry stored state:

    stream ─▶ Pipeline ─▶ cms.update_batch(batchId)   (delta partition
                          hll.update_batch(batchId)    / max-append)

Three audits close the trio's story:
  * SERVING PARITY: the streamed-up sketches answer exactly what the
    oracle-graded queries compute inline on the full corpus — d96's
    heavy-hitter estimates (CMS counters are LINEAR over any split of
    the corpus) and d98's HLL estimate (register max-merge is exact).
  * REPLAY SAFETY: re-running the whole stream on a FRESH checkpoint
    (every batch re-delivered under the same ids — at-least-once's
    worst case) leaves every counter and register unchanged: the CMS
    delta overwrites its own batch_id partition, the HLL append is
    max-idempotent.
  * COMPACTION: with streams stopped, ``CmsSketch.compact()`` folds
    the per-batch history into the base partition with identical
    estimates — the table's partition count no longer grows with
    stream lifetime.

Run: python examples/corpus_monitoring.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus-monitoring-example")
    spark.sparkContext.setLogLevel("ERROR")

    from kpipe_spark.queries import all_queries

    q = all_queries()

    kl = {r["source"]: r["kl_bits"]
          for r in q["d72_source_kl_drift"].build(spark, sf_dir).collect()}
    drift = q["d74_embedding_drift"].build(spark, sf_dir).collect()
    zipf = q["d73_zipf_fit"].build(spark, sf_dir).collect()[0]
    cov = {r["k"]: r["coverage_frac"]
           for r in q["d75_vocab_coverage"].build(spark, sf_dir).collect()}
    oov = q["d76_oov_rate"].build(spark, sf_dir).collect()
    dup = {r["source"]: r["dup_rate"]
           for r in q["d78_source_dup_rate"].build(spark, sf_dir).collect()}

    print(f"sources: {len(kl)}; max KL drift = {max(kl.values()):.4f} bits "
          f"({max(kl, key=kl.get)})")
    worst = min(drift, key=lambda r: r["centroid_cosine"] or 1.0)
    print(f"labels: {len(drift)}; most-drifted centroid = label "
          f"{worst['label']} (cosine {worst['centroid_cosine']})")
    print(f"zipf: slope {zipf['zipf_slope']}, vocab {zipf['n_vocab']}, "
          f"tokens {zipf['n_tokens']}")
    print("coverage:", {k: cov[k] for k in sorted(cov)})
    print(f"dup rate: max = {max(dup.values()):.4f} "
          f"({max(dup, key=dup.get)})")

    oov_tokens = sum(r["n_oov"] for r in oov)
    all_tokens = sum(r["n_tokens"] for r in oov)

    ks = sorted(cov)
    checks = {
        "kl_nonneg": all(v >= 0 for v in kl.values()),
        "cosine_bounded": all(
            r["centroid_cosine"] is None or -1 <= r["centroid_cosine"] <= 1
            for r in drift
        ),
        "l2_nonneg": all(r["centroid_l2"] >= 0 for r in drift),
        "zipf_negative": zipf["zipf_slope"] < 0,
        "coverage_monotone": all(
            cov[a] <= cov[b] for a, b in zip(ks, ks[1:])
        ),
        "coverage_saturates": (
            zipf["n_vocab"] > max(ks) or cov[max(ks)] == 1.0
        ),
        # d76's OOV mass and d75's coverage describe the same corpus:
        # total OOV fraction == 1 - coverage(top-16) (up to rounding)
        "oov_matches_coverage": abs(
            oov_tokens / all_tokens - (1.0 - cov[16])
        ) < 1e-3,
        "dup_rate_bounded": all(0.0 <= v <= 1.0 for v in dup.values()),
    }
    for name, ok in checks.items():
        if not ok:
            print(f"FAILED: {name}")
    print(f"corpus health invariants hold = {all(checks.values())}")

    streaming_monitors(spark, sf_dir, q)


def streaming_monitors(spark, sf_dir: str, q) -> None:
    """Part 2: per-micro-batch CmsSketch/HllSketch maintenance with
    serving parity against d96/d98, worst-case replay, compaction."""
    import shutil
    import tempfile
    import uuid

    from kpipe_spark.catalog import load_table
    from kpipe_spark.functions.sketches import CmsSketch, HllSketch
    from kpipe_spark.pipeline import Pipeline
    from kpipe_spark.streaming import StreamRunner

    docs = load_table(spark, sf_dir, "documents")
    is_new = "doc_id % 4 = 0"
    stem = f"corpus_mon_{uuid.uuid4().hex[:8]}"
    # monitors start from the already-held corpus...
    base = docs.filter(f"NOT ({is_new})").select("doc_id", "text")
    cms = CmsSketch.build(spark, base, f"{stem}_cms")
    hll = HllSketch.build(spark, base, f"{stem}_hll")

    # ...and the rest of the corpus ARRIVES, two micro-batch files
    workdir = tempfile.mkdtemp(prefix="corpus-mon-")
    src = os.path.join(workdir, "src")
    os.makedirs(src)
    arriving = docs.filter(is_new).select("doc_id", "text")
    arriving.filter("doc_id % 8 = 0").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    arriving.filter("doc_id % 8 = 4").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def monitor_sink(df, batch_id):
        batch = df.select("doc_id", "text")
        cms.update_batch(batch, batch_id)
        hll.update_batch(batch, batch_id)

    health_docs: list[dict] = []

    def run(ckpt: str) -> None:
        runner = StreamRunner(
            pipeline=Pipeline().require_field("doc_id"), sink=monitor_sink
        )
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        handle = runner.start(stream, os.path.join(workdir, ckpt), ckpt)
        # the growth signal compact() exists to answer: the sketch's
        # delta-partition count + advisory, live on the stream's own
        # health surface under artifacts.cms
        handle.add_health_probe("cms", cms.health)
        try:
            handle.process_all_available()
            health_docs.append(handle.health())
        finally:
            handle.close()

    def cms_serving() -> dict:
        # probe the STORED sketch with d96's top-20 tokens
        tokens = d96_df.select(F.col("token").alias("t"))
        return {
            r["t"]: r["cms_estimate"]
            for r in cms.estimate(tokens).collect()
        }

    try:
        d96_df = q["d96_cms_heavy_hitters"].build(spark, sf_dir)
        d96 = {r["token"]: r["cms_estimate"] for r in d96_df.collect()}
        d98 = q["d98_hll_distinct_tokens"].build(spark, sf_dir).collect()[0]

        run("first")
        # serving parity: base + streamed batches == the full corpus,
        # so the stored sketches must answer exactly what the
        # oracle-graded queries derive inline on the whole table
        cms_match = cms_serving() == d96
        est = lambda: math.floor(  # noqa: E731 — d98's rounding
            hll.distinct_estimate() * 10000.0 + 0.5
        ) / 10000.0
        hll_match = (
            est() == d98["hll_estimate"]
            and hll.registers_df.count() == d98["n_registers_hit"]
        )
        print(
            f"streamed-up monitors: cms top-{len(d96)} parity with d96 "
            f"= {cms_match}; hll estimate {est()} vs d98 "
            f"{d98['hll_estimate']} = {hll_match}"
        )

        # worst-case replay: a fresh checkpoint re-delivers EVERY
        # batch under the same ids; counters and registers must not move
        run("replayed")
        replay_safe = cms_serving() == d96 and est() == d98["hll_estimate"]
        print(f"replay left all counters and registers unchanged = {replay_safe}")

        # streams stopped: fold the per-batch history into the base.
        # The trigger signal came off the live Handle: artifacts.cms
        # reported the delta-partition growth while the stream ran
        growth = health_docs[-1]["artifacts"]["cms"]
        batches_before = cms.applied_batches()
        cms.compact()
        compacted = (
            growth["delta_partitions"] == len(batches_before) - 1
            and cms.applied_batches() == [-1]
            and cms.delta_partitions() == 0
            and cms_serving() == d96
        )
        print(
            f"compaction {batches_before} -> {cms.applied_batches()} "
            f"(health saw {growth['delta_partitions']} deltas, advisory "
            f"threshold {growth['advisory_threshold']}), "
            f"estimates identical = {compacted}"
        )
        print(
            "streaming monitors match oracle queries, replay-safe =",
            cms_match and hll_match and replay_safe and compacted,
        )
    finally:
        cms.drop()
        hll.drop()
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
