#!/usr/bin/env python
"""Data SELECTION — choosing which documents to train on when quality
heuristics alone aren't enough, composing the round-4 scoring
operators with the budget machinery:

    documents
      -> DSIR importance     (selection.dsir_log_weights: hashed-bigram
                              log importance ratio toward a trusted
                              target distribution — steer the mix
                              toward wiki-like content without
                              training a classifier)
      -> novelty gate        (d71's shape: drop docs whose shingles all
                              appeared in earlier docs — don't spend
                              budget on near-copies)
      -> budget admission    (budget_select over the DSIR score: admit
                              the most target-like docs to a token
                              budget, two-phase — no global sort)

The check printed at the end: every admitted doc is novel AND no
rejected doc has a strictly higher quantized DSIR score than an
admitted one (the greedy-admission invariant).

Run: python examples/data_selection.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.functions.dedup import word_shingles  # noqa: E402
from kpipe_spark.functions.selection import (  # noqa: E402
    budget_select,
    dsir_log_weights,
)
from kpipe_spark.functions.text import token_count  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="data-selection-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # 1. DSIR: score every doc's bigram distribution against the
    #    src0/src1 "trusted" target
    scored = dsir_log_weights(docs, ("src0", "src1"))

    # 2. novelty: keep docs contributing at least 20% first-seen
    #    shingles (the d71 shape — gram-keyed join, no pairwise work)
    content = F.col("text").isNotNull() & F.col("text").rlike(r"\S")
    sh = docs.filter(content).select(
        "doc_id", F.explode(word_shingles("text", 3)).alias("g")
    )
    first = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novelty = (
        sh.join(first, "g")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("novel_frac")
        )
    )
    novel = novelty.filter(F.col("novel_frac") >= 0.2)

    # 3. admit the most target-like novel docs to a 30%-of-pool token
    #    budget; the quantized DSIR score is the admission bucket
    pool = (
        scored.join(novel, "doc_id")
        .join(docs.select("doc_id", token_count("text").alias("n_tokens")), "doc_id")
        .withColumn("qint", F.floor(F.col("logw") * 1e4 + F.lit(0.5)).cast("long"))
    )
    budget = pool.agg(
        F.floor(F.sum("n_tokens") * 0.3).cast("long").alias("b")
    ).collect()[0]["b"]
    admitted = budget_select(
        pool, F.col("qint"), F.col("n_tokens"), F.lit(budget)
    )

    adm = admitted.select("doc_id", "qint").collect()
    adm_ids = {r["doc_id"] for r in adm}
    min_admitted_q = min(r["qint"] for r in adm)
    pool_rows = pool.select("doc_id", "qint").collect()
    rejected_better = [
        r for r in pool_rows
        if r["doc_id"] not in adm_ids and r["qint"] > min_admitted_q
    ]
    n_pool = len(pool_rows)
    print(f"pool: {n_pool} novel docs; admitted {len(adm_ids)} "
          f"to a {budget}-token budget")
    ok = len(adm_ids) > 0 and not rejected_better
    print(f"DSIR + novelty + budget admission invariant holds = {ok}")


if __name__ == "__main__":
    main()
