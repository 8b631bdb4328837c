#!/usr/bin/env python
"""Passage retrieval over chunked documents — the chunk → embed →
ANN-search composition a RAG pipeline runs.

1. Chunk every document into 128-token sliding windows at stride 96
   (d67's chunk table: the chunk ordinal, token start, and an md5
   content hash downstream dedup/embedding jobs key on).
2. Embed each chunk with FEATURE HASHING (the classic hashing trick):
   tokens hash into a 16-bucket count vector — a real, deterministic,
   vocabulary-free embedding computed entirely with built-in
   expressions (a production system swaps in a model here; the Spark
   plumbing — chunk ids, array<double> column, broadcast probes — is
   identical).
3. Retrieve: brute-force cosine top-k (`similarity.brute_force_topk`,
   the exact baseline) for two probe chunks, one of which is a
   verbatim COPY of a corpus chunk — its top-1 neighbor must be that
   source chunk at cosine ~1.0.

Scale notes: chunking is a zero-shuffle scan-local explode; embedding
is one (chunk, bucket) count aggregate; probes broadcast so the
corpus embedding table is scanned once and only (query, neighbor,
sim) scalars shuffle into the top-k window. At corpus scale swap
brute force for `similarity.ivf_topk` — same probe contract.

Run: python examples/passage_retrieval.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.functions.dedup import md5_hash60  # noqa: E402
from kpipe_spark.functions.similarity import brute_force_topk  # noqa: E402
from kpipe_spark.queries import all_queries  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402

DIM = 16


def embed_chunks(chunk_tokens):
    """(chunk_uid, token) -> (chunk_uid, embedding array<double>) via
    the hashing trick: bucket = md5(token) % DIM, value = count."""
    counts = chunk_tokens.groupBy(
        "chunk_uid", (md5_hash60(F.col("tok")) % DIM).alias("b")
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    return (
        counts.groupBy("chunk_uid")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("b", "c"))
            ).alias("m")
        )
        .select(
            "chunk_uid",
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda i: F.coalesce(F.element_at("m", i), F.lit(0.0)),
            ).alias("embedding"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example-passage-retrieval")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. the chunk table (registered query d67 — oracle-checked shape)
    chunks = all_queries()["d67_passage_chunks"].build(spark, sf_dir)
    # a stable scalar id for each chunk: doc_id * 1e6 + ordinal
    chunks = chunks.withColumn(
        "chunk_uid", F.col("doc_id") * 1_000_000 + F.col("chunk_id")
    )

    # re-derive each chunk's tokens for embedding (same slice the
    # query hashes — keyed by the chunk ordinal)
    from kpipe_spark.catalog import load_table
    from kpipe_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    W, S = 128, 96
    base = docs.select("doc_id", tokens("text").alias("t")).filter(
        F.size("t") >= 1
    )
    kmax = (
        F.when(F.size("t") <= W, F.lit(0))
        .otherwise(F.ceil((F.size("t") - W) / S))
        .cast("long")
    )
    chunk_tokens = (
        base.select(
            "doc_id",
            "t",
            F.explode(F.sequence(F.lit(0).cast("long"), kmax)).alias("k"),
        )
        .select(
            (F.col("doc_id") * 1_000_000 + F.col("k")).alias("chunk_uid"),
            F.explode(
                F.slice("t", (F.col("k") * S + 1).cast("int"), W)
            ).alias("tok"),
        )
    )

    # 2. embed
    emb = embed_chunks(chunk_tokens)
    n_chunks = emb.count()

    # 3. probes: one verbatim copy of a real chunk (uid re-keyed so it
    # isn't excluded as itself) + one synthetic novel probe
    src = emb.orderBy("chunk_uid").limit(1).collect()[0]
    probe_rows = [
        (9_999_999_001, src["embedding"]),
        (9_999_999_002, [1.0] * DIM),
    ]
    probes = spark.createDataFrame(
        probe_rows, "query_id long, embedding array<double>"
    )
    topk = brute_force_topk(
        emb, probes, k=3, id_col="chunk_uid", vec_col="embedding"
    )
    hits = {
        (r["query_id"], r["rn"]): (r["neighbor_id"], r["cosine_sim"])
        for r in topk.collect()
    }
    twin_id, twin_sim = hits[(9_999_999_001, 1)]
    print(f"chunks embedded: {n_chunks}")
    print(f"copied probe's top-1: chunk {twin_id} sim {twin_sim}")
    ok = twin_id == src["chunk_uid"] and twin_sim >= 0.9999
    print(f"copied chunk retrieves its source at cosine ~1.0 = {ok}")


if __name__ == "__main__":
    main()
