#!/usr/bin/env python
"""Tokenizer training and serving against a stored unigram-LM model —
train once, tokenize every later batch (the 100 TB tokenization loop).

Training rides the distinct-word frequency table (Zipf: vocabulary-
shaped, never corpus-shaped); the artifact that makes day-2 cheap is
the persisted piece-score table:

    train on the corpus            (one corpus pass + vocab-table EM)
    persist (piece, score, usage)  (vocabulary-bounded table)
    tokenize any later batch       (distinct-word Viterbi + broadcast
                                    join — the batch never re-trains)

This example runs the loop: train on the documents table, verify the
stored model reproduces the oracle-checked d90 registry vocabulary
(the artifact is that query's stored form), tokenize a fresh batch,
and show the fertility the model achieves on it (d91's metric).

Run: python examples/tokenizer_training.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.catalog import load_table  # noqa: E402
from kpipe_spark.functions.unigram import UnigramTokenizer  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="tokenizer-training-example", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    tok = UnigramTokenizer.build(
        spark, docs, f"unigram_demo_{uuid.uuid4().hex[:8]}"
    )
    try:
        # the stored vocabulary must equal the oracle-checked d90
        # registry output (same trainer, same corpus)
        from kpipe_spark.queries import all_queries

        want = {
            (r["piece"], r["score"])
            for r in all_queries()["d90_unigram_train"]
            .build(spark, sf_dir)
            .collect()
        }
        got = {
            (r["piece"], r["score"]) for r in tok.vocab_df.collect()
        }
        print("stored vocab == oracle-checked d90 rows =", got == want)

        # day-2: a fresh batch arrives; tokenize against the STORED
        # model (attach() is what a separate job would call)
        att = UnigramTokenizer.attach(spark, tok.table)
        batch = spark.createDataFrame(
            [
                (900001, "stream merge join over sorted batches"),
                (900002, "the window scan was slow"),
                (900003, None),  # contentless: tokenizes to []
            ],
            "doc_id bigint, text string",
        )
        out = att.tokenize(batch).orderBy("doc_id")
        out.show(truncate=False)
        stats = out.agg(
            F.sum("n_pieces").alias("pieces"),
        ).collect()[0]
        n_words = batch.select(
            F.explode(
                F.filter(
                    F.split(F.lower("text"), r"[^a-z0-9]+"),
                    lambda t: t != F.lit(""),
                )
            )
        ).count()
        print(
            f"batch fertility = {stats['pieces']}/{n_words} pieces/word "
            f"= {stats['pieces'] / n_words:.3f}"
        )
    finally:
        tok.drop()
    spark.stop()


if __name__ == "__main__":
    main()
