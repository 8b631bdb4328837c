#!/usr/bin/env python
"""Corpus ASSEMBLY — what happens after curation (see
corpus_curation.py) has scored and deduped every document: decide what
to train on and how to lay it out, using the reusable pieces in
`kpipe_spark.functions`:

    scored documents
      -> budget selection    (admit best-quality docs to a token budget
                              — selection.budget_select, the two-phase
                              histogram shape: no corpus-wide ordered
                              scan, only the boundary quality-bucket
                              ever sees a window)
      -> mixture weights     (T=0.5 temperature rebalance over the
                              admitted tokens — mixing.temperature_
                              normalize, the sequential-fold normalizer)
      -> shard layout        (content-independent md5 hash to 8 shards:
                              stable under reruns/appends, audited for
                              balance instead of assumed)

Run: python examples/corpus_assembly.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.functions.dedup import md5_hash60  # noqa: E402
from kpipe_spark.functions.mixing import temperature_normalize  # noqa: E402
from kpipe_spark.functions.selection import budget_select  # noqa: E402
from kpipe_spark.functions.text import quality_score, token_count  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus-assembly-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # 1. score and quantize: budget_select needs an integer bucket that
    #    orders exactly like the real key — quality is round4, so its
    #    scaled integer IS that bucket
    # token_count, not a raw split: the budget must be denominated in
    # the same (''-filtered) token definition the quality key uses
    q = docs.select(
        "doc_id",
        "source",
        token_count("text").cast("long").alias("n_tokens"),
        quality_score("text").alias("quality"),
    ).withColumn(
        "qint", F.floor(F.col("quality") * 10000.0 + F.lit(0.5)).cast("long")
    )

    # 2. admit the best 25% of corpus tokens (collect the 1-row limits
    #    once — a second tot.collect() would rescan the corpus)
    lim = q.agg(
        F.floor(F.sum("n_tokens") * 0.25).cast("long").alias("budget"),
        F.max("n_tokens").alias("max_doc"),
    ).collect()[0]
    admitted = budget_select(
        q,
        bucket=F.col("qint"),
        weight=F.col("n_tokens"),
        budget=F.lit(lim["budget"]),
    )
    adm = admitted.agg(
        F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    # greedy contract: reach the budget, overshoot by at most one doc
    budget_ok = lim["budget"] <= adm["t"] <= lim["budget"] + lim["max_doc"]

    # 3. what mixture does the admitted set imply (T=0.5 rebalance)
    per_src = admitted.groupBy("source").agg(
        F.sum("n_tokens").alias("adm_tokens")
    )
    mix = temperature_normalize(per_src, "adm_tokens").select(
        "source", "adm_tokens", (F.col("_pt") / F.col("_denom")).alias("p")
    )
    probs = [r["p"] for r in mix.collect()]  # one action, reused below
    p_sum = sum(probs)

    # 4. lay the admitted docs out in 8 hash shards and audit balance
    shards = (
        admitted.select(
            (md5_hash60(F.col("doc_id").cast("string")) % 8).alias("shard"),
            "n_tokens",
        )
        .groupBy("shard")
        .agg(F.sum("n_tokens").alias("tok"))
        .collect()
    )
    toks = [r["tok"] for r in shards]
    shards_ok = len(shards) == 8 and max(toks) < 2 * (sum(toks) / 8)

    print(
        f"admitted {adm['n']} docs / {adm['t']} tokens "
        f"(budget {lim['budget']})"
    )
    print(f"mixture probabilities sum to {p_sum:.6f} over {len(probs)} sources")
    print(
        "assembly: budget + mixture + shard audit consistent =",
        bool(budget_ok and abs(p_sum - 1.0) < 1e-9 and shards_ok),
    )
    spark.stop()


if __name__ == "__main__":
    main()
