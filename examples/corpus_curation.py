#!/usr/bin/env python
"""End-to-end pretraining-corpus curation — the composition every LLM
data pipeline runs, built entirely from `kpipe_spark.functions`:

    raw documents
      -> quality gate          (cheap column exprs, pushed to the scan)
      -> exact dedup           (md5 fingerprint groupBy, min-id survivor)
      -> MinHash near-dedup    (banded LSH -> components -> canonicals)
      -> decontamination       (5-gram overlap vs eval probe, broadcast)
      -> source rebalance      (uniform-token-budget down-sampling)
      -> train/val/test split  (content-hash, reproducible)

Scale discipline on display: nothing materializes to the driver except
the funnel counts; every join against a derived set (survivor ids,
canonical ids, contaminated ids, per-source weights) is broadcast —
those sets carry ids/hashes, never document text; the corpus itself is
scanned, filtered, and written but never shuffled on text.

Run: python examples/corpus_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.catalog import load_table  # noqa: E402
from kpipe_spark.functions.dedup import dup_clusters, exact_dedup  # noqa: E402
from kpipe_spark.functions.text import fingerprint, quality_score  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402

EVAL_MOD = 50          # doc_id % 50 == 0 stands in for a benchmark set
QUALITY_MIN = 0.30
GRAM_K = 5
CONTAM_MAX = 0.50      # drop train docs with >50% eval-gram overlap


def five_grams(df, text_col="text"):
    ws = F.split(F.col(text_col), " ")
    return df.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(ws) >= GRAM_K,
                F.expr(
                    f"transform(sequence(1, size(split(text, ' '))-{GRAM_K - 1}),"
                    f" i -> concat_ws(' ', slice(split(text, ' '), i, {GRAM_K})))"
                ),
            ).otherwise(F.array())
        ).alias("g"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example-corpus-curation")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    train, eval_probe = docs.filter(~is_eval), docs.filter(is_eval)
    funnel = [("raw", train.count())]

    # 1. quality gate — pure column exprs, no shuffle
    train = train.filter(quality_score("text") >= QUALITY_MIN)
    funnel.append(("quality", train.count()))

    # 2. exact dedup — survivors carry (id, dup_count); join back by id
    survivors = exact_dedup(train).select("doc_id")
    train = train.join(F.broadcast(survivors), "doc_id", "left_semi")
    funnel.append(("exact_dedup", train.count()))

    # 3. near-dedup — keep one canonical per MinHash cluster
    canon = dup_clusters(train).filter("is_canonical").select("doc_id")
    train = train.join(F.broadcast(canon), "doc_id", "left_semi")
    funnel.append(("near_dedup", train.count()))

    # 4. decontamination — drop train docs overlapping the eval probe.
    #    Eval grams are the broadcast side; the train corpus is scanned
    #    once and never shuffled.
    eval_grams = five_grams(eval_probe).select("g").distinct()
    contaminated = (
        five_grams(train)
        .join(F.broadcast(eval_grams), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .join(
            five_grams(train).groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("n_all")
            ),
            "doc_id",
        )
        .filter(F.col("n_hit") / F.col("n_all") > CONTAM_MAX)
        .select("doc_id")
    )
    train = train.join(F.broadcast(contaminated), "doc_id", "left_anti")
    funnel.append(("decontaminated", train.count()))

    # 5. source rebalance — down-sample each source toward a uniform
    #    token budget, deterministically (hash-gated, reproducible)
    n_tok = F.size(F.split(F.col("text"), " "))
    per_src = (
        train.groupBy("source").agg(F.sum(n_tok).alias("src_tokens"))
    )
    budget = per_src.agg(
        (F.sum("src_tokens") / F.count(F.lit(1))).alias("budget")
    ).crossJoin(per_src)
    weights = budget.select(
        "source",
        F.least(F.col("budget") / F.col("src_tokens"), F.lit(1.0)).alias("keep_p"),
    )
    gate = (F.pmod(F.xxhash64(F.col("doc_id"), F.lit("mix")), F.lit(1_000_000))
            / 1_000_000.0)
    train = (
        train.join(F.broadcast(weights), "source")
        .filter(gate < F.col("keep_p"))
        .drop("keep_p")
    )
    funnel.append(("rebalanced", train.count()))

    # 6. reproducible content-hash split
    bucket = F.pmod(F.xxhash64(fingerprint("text")), F.lit(100))
    split = train.withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
    )
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}

    # 7. sequence packing — concat-then-chunk the train split into
    #    512-token bins per source (the d39 operator): one in-order
    #    running sum per source partition, no extra corpus pass
    from pyspark.sql import Window  # noqa: E402

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        split.filter(F.col("split") == "train")
        .select("source", "doc_id", n_tok.alias("n_tokens"))
        .withColumn(
            "seq_id",
            F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 512.0),
        )
    )
    n_seqs = packed.select("source", "seq_id").distinct().count()

    print("curation funnel:", " -> ".join(f"{k}={v}" for k, v in funnel))
    print("splits:", {k: counts.get(k, 0) for k in ("train", "val", "test")})
    print("packed train sequences (512-token bins):", n_seqs)
    spark.stop()


if __name__ == "__main__":
    main()
