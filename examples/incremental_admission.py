#!/usr/bin/env python
"""Incremental batch admission against a stored dedup index — the
shape a 100 TB corpus actually runs day to day.

A large corpus is deduped ONCE; after that, every incoming batch must
answer "which of these documents duplicate something we already have
(or each other)?" WITHOUT re-scanning the corpus. The artifact that
makes this cheap is the MinHash band table ((doc_id, band, bucket) —
`minhash_bands_df` output) materialized as a BUCKETED table on
(band, bucket):

    corpus scan  -> signatures -> bands -> write_bucketed  (paid once)
    per batch:      signatures (batch-sized) ->
                    equi-join into the bucketed band table  (no corpus
                    shuffle: the table is already partitioned on the
                    join key) ->
                    admission ledger (dup-of-corpus / dup-in-batch /
                    unique) ->
                    append the admitted batch's bands to the artifact

This example runs the whole loop: index a corpus, admit a batch that
contains genuine near-duplicates of corpus documents, read the ledger,
and verify the incremental answer equals a full recompute (the
invariant `tests/test_llm_ops2.py::
test_incremental_dedup_agrees_with_full_recompute` pins at the
function level). d54 in the query registry is the oracle-checked form.

Run: python examples/incremental_admission.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.catalog import load_table  # noqa: E402
from kpipe_spark.functions.dedup import (  # noqa: E402
    incremental_minhash_partners,
    minhash_bands_df,
    minhash_candidates,
    minhash_signature_df,
)
from kpipe_spark.session import get_spark  # noqa: E402
from kpipe_spark.util import write_bucketed  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example-incremental-admission")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 4 == 0
    corpus, batch = docs.filter(~is_new), docs.filter(is_new)

    # ---- one-time: index the corpus and materialize the band artifact
    # bucketed on the join key, so every future batch joins into it
    # WITHOUT a corpus-side exchange (verified: the bucketed-scan side
    # of the join plans no Exchange — same property
    # tests/test_scale_utils.py::test_bucketed_join_has_no_exchange pins)
    bands = minhash_bands_df(minhash_signature_df(corpus))
    write_bucketed(bands, "corpus_bands", keys=["band", "bucket"], num_buckets=8)
    index = spark.table("corpus_bands")

    # ---- per batch: batch-sized signature work + one equi-join
    partners = incremental_minhash_partners(batch, index).persist()
    ledger = (
        batch.select("doc_id")
        .join(partners, F.col("doc_id") == F.col("id_new"), "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("id_other") % 4 != 0, 1).otherwise(0)).alias(
                "corpus_dups"
            ),
            F.sum(F.when(F.col("id_other") % 4 == 0, 1).otherwise(0)).alias(
                "batch_dups"
            ),
        )
    )
    verdict = (
        F.when(F.col("corpus_dups") > 0, "dup_of_corpus")
        .when(F.col("batch_dups") > 0, "dup_in_batch")
        .otherwise("unique")
    )
    counts = {
        r["verdict"]: r["n"]
        for r in ledger.select(verdict.alias("verdict"))
        .groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print("admission ledger:", counts)

    # ---- invariant: incremental == full recompute (restricted to new)
    incremental = {
        (min(r["id_new"], r["id_other"]), max(r["id_new"], r["id_other"]))
        for r in partners.collect()
    }
    full = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidates(docs).collect()
        if r["id_a"] % 4 == 0 or r["id_b"] % 4 == 0
    }
    partners.unpersist()
    spark.sql("DROP TABLE IF EXISTS corpus_bands")

    # ---- the same loop through the packaged API: CorpusIndex wraps
    # build -> admit -> append, adds keep-one verdicts and re-ingest
    # detection (functions/corpus_index.py; lifecycle pinned in
    # tests/test_corpus_index.py)
    from kpipe_spark.functions.corpus_index import CorpusIndex

    import uuid

    # uuid-suffixed so a killed run's leftover warehouse directory can
    # never poison the next run (the bench-index discipline)
    idx = CorpusIndex.build(
        spark, corpus, f"corpus_bands_api_{uuid.uuid4().hex[:8]}"
    )
    try:
        ledger = idx.admit(batch)
        admitted = batch.join(
            ledger.filter("admitted").select("doc_id"), "doc_id", "semi"
        )
        n_adm = admitted.count()
        idx.append(admitted)
        # re-admitting the same batch now rejects everything: each doc
        # collides with either its own indexed copy or its dup group's
        # surviving representative
        readmitted = idx.admit(batch).filter("admitted").count()
        api_ok = n_adm > 0 and readmitted == 0
    finally:
        idx.drop()
    print("CorpusIndex admit->append->re-admit closes =", api_ok)

    print(
        "incremental == full recompute =", incremental == full,
        "(%d candidate pairs)" % len(incremental),
    )


if __name__ == "__main__":
    main()
