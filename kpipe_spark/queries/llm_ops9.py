"""LLM-pipeline operators, part 9: incremental dedup against a stored
corpus index, and per-frame audio energy over the real WAV decode.

Reference parity note: kpipe declares analytics out of scope
(/root/reference/README.md:190-208); these extend the north-star LLM
surface (SURVEY.md §2.4) over the synthetic documents table.

d54 is the shape a 100 TB pipeline actually runs: the corpus is deduped
once, its MinHash band table is materialized (bucketed on (band,
bucket)), and every incoming batch computes signatures for ITSELF only
and equi-joins into the stored index — batch-sized work per batch, no
corpus re-scan. m05 extends the multimodal decode path with the
1-row-in/N-frames-out mapInPandas shape (m02 only fans out indexes;
this fans out decoded content).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kpipe_spark.catalog import load_tables
from kpipe_spark.functions import dedup as D
from kpipe_spark.functions import multimodal as M
from kpipe_spark.queries import register
from kpipe_spark.queries._oracle_fragments import MINHASH_CTES


@register(
    "d54_incremental_dedup",
    oracle=f"""
    WITH {MINHASH_CTES},
    hits AS (
      SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_other
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket
       AND a.doc_id <> b.doc_id
      WHERE a.doc_id % 4 = 0
    )
    SELECT d.doc_id,
           CAST(sum(CASE WHEN h.id_other % 4 <> 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_corpus_dups,
           CAST(sum(CASE WHEN h.id_other % 4 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_batch_dups,
           min(h.id_other) AS min_dup_id
    FROM documents d LEFT JOIN hits h ON h.id_new = d.doc_id
    WHERE d.doc_id % 4 = 0
    GROUP BY d.doc_id
    """,
    description="incremental dedup: a NEW batch (doc_id % 4 == 0 models "
    "the arriving 25%) deduped against the already-indexed corpus plus "
    "itself — per new doc, how many band-collision partners exist in "
    "the corpus vs in the batch, and the lowest partner id (the "
    "keep-one survivor the batch admission would defer to). Scale: THE "
    "incremental production shape — signatures are computed for the "
    "batch only; the corpus side is its STORED band table "
    "(minhash_bands_df output, bucketed on (band, bucket) via "
    "write_bucketed), so admitting a batch shuffles batch-sized data "
    "into a shuffle-free corpus join instead of re-scanning 100 TB. "
    "The left join keeps no-dup docs as zero rows, so the output is "
    "the full batch admission ledger.",
    tags=("llm", "dedup", "minhash", "incremental"),
)
def d54_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    is_new = F.col("doc_id") % 4 == 0
    # in production this is spark.table("corpus_bands") — the bucketed
    # artifact; here it is derived inline so the query is self-contained
    corpus_bands = D.minhash_bands_df(
        D.minhash_signature_df(docs.filter(~is_new))
    )
    partners = D.incremental_minhash_partners(docs.filter(is_new), corpus_bands)
    in_corpus = F.col("id_other") % 4 != 0
    return (
        docs.filter(is_new)
        .select("doc_id")
        .join(partners, F.col("doc_id") == F.col("id_new"), "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(in_corpus, 1).otherwise(0)).alias("n_corpus_dups"),
            F.sum(F.when(~in_corpus, 1).otherwise(0)).alias("n_batch_dups"),
            F.min("id_other").alias("min_dup_id"),
        )
    )


@register(
    "m05_audio_frame_energy",
    oracle="""
    WITH spec AS (
      SELECT doc_id, CAST(64 + doc_id % 128 AS INT) AS ns
      FROM documents WHERE doc_id % 3 = 1
    ), fr AS (
      SELECT doc_id, ns, unnest(range((ns + 63) // 64)) AS f FROM spec
    )
    SELECT doc_id AS media_id,
           CAST(f AS INT) AS frame_idx,
           CAST(least(64, ns - 64 * f) AS INT) AS n_samples,
           CAST(list_sum(list_transform(range(64 * f, least(64 * (f + 1), ns)),
                i -> abs(((i * 13 + doc_id) % 201) - 100))) AS BIGINT)
             AS energy
    FROM fr
    """,
    description="per-frame audio energy: WAV rows decode (real RIFF "
    "chunk walk on the binary column) and fan out one row per 64-sample "
    "frame with the exact integer abs-amplitude energy — the framing "
    "pass a speech pipeline runs before VAD/segmentation. The oracle "
    "recomputes every frame from the content spec's closed forms, so a "
    "hash match certifies the decode AND the frame slicing. Scale: "
    "mapInPandas 1-in/N-out, Arrow-batched; integer energies keep "
    "Python out of the float surface (derive dB downstream in "
    "expressions); audio rows are filtered before the Python stage so "
    "only relevant blobs cross the Arrow boundary.",
    tags=("llm", "multimodal", "audio"),
)
def m05_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.queries.llm_ops2 import media_frame

    return M.audio_frame_energy(media_frame(spark, sf_dir), frame_size=64)
