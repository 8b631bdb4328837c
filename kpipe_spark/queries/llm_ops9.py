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
from kpipe_spark.functions.mixing import temperature_norm_sql
from kpipe_spark.queries import register
from kpipe_spark.queries._oracle_fragments import COMPONENTS_CTES, MINHASH_CTES


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
    "d55_dedup_adjusted_mixture",
    oracle=f"""
    WITH RECURSIVE {MINHASH_CTES},
    {COMPONENTS_CTES},
    tok AS (
      SELECT d.source,
             len(string_split(d.text, ' ')) AS n,
             CASE WHEN coalesce(c.cluster_id, d.doc_id) = d.doc_id
                  THEN 1 ELSE 0 END AS kept
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    ),
    s AS (
      SELECT source,
             count(*) AS raw_docs,
             CAST(sum(kept) AS BIGINT) AS kept_docs,
             CAST(sum(CASE WHEN kept = 1 THEN n ELSE 0 END) AS BIGINT)
               AS kept_tokens
      FROM tok GROUP BY source
    ),
    {temperature_norm_sql('s', 'kept_tokens')}
    SELECT source, raw_docs, kept_docs, kept_tokens,
           CAST(floor(pt / denom * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE)
             AS sample_prob
    FROM p, dn
    """,
    description="dedup-adjusted mixture weights — d44's temperature "
    "sampling computed over the tokens that SURVIVE keep-one near-dup "
    "dedup (d47's survivor set), per source: the raw-token weights a "
    "naive mix uses overweight duplicate-heavy sources, because their "
    "tokens vanish at dedup time; this is the number you actually "
    "train on. Scale: the dup-graph component table broadcasts onto "
    "one corpus scan, the per-source agg map-side-combines, and the "
    "T=0.5 normalizer is the same |sources|-row ordered sequential "
    "fold as d44 (cross-engine exact).",
    tags=("llm", "sampling", "dedup"),
)
def d55_dedup_adjusted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions.dedup_reports import dedup_adjusted_mixture

    docs = load_tables(spark, sf_dir).documents
    # graded self-contained form: components derived inline; the stored
    # form (ClusterIndex.components_df) feeds the same consumer body
    return dedup_adjusted_mixture(docs, D.dup_components(docs))


@register(
    "m06_image_patch_stats",
    oracle="""
    WITH spec AS (
      SELECT doc_id,
             CAST(8 + doc_id % 16 AS INT) AS w,
             CAST(8 + doc_id % 8 AS INT) AS h
      FROM documents WHERE doc_id % 3 = 0
    ), rows_ AS (
      SELECT doc_id, w, h, unnest(range((h + 13) // 14)) AS pr FROM spec
    ), grid AS (
      SELECT doc_id, w, h, pr, unnest(range((w + 13) // 14)) AS pc
      FROM rows_
    )
    SELECT doc_id AS media_id,
           CAST(pr AS INT) AS patch_row,
           CAST(pc AS INT) AS patch_col,
           CAST(least(14, h - 14 * pr) AS INT) AS patch_h,
           CAST(least(14, w - 14 * pc) AS INT) AS patch_w,
           CAST(list_sum(list_transform(range(14 * pr, least(14 * (pr + 1), h)),
                y -> list_sum(list_transform(
                     range(14 * pc, least(14 * (pc + 1), w)),
                     x -> ((y * w + x) * 7 + doc_id) % 256))))
                AS BIGINT) AS pixel_sum,
           CAST(NULL AS VARCHAR) AS decode_error
    FROM grid
    """,
    description="real per-ViT-patch pixel statistics: decode each PNG "
    "(CRC/inflate/defilter) and emit one row per 14-px patch with the "
    "exact integer pixel sum — the 2D content complement of m04's "
    "metadata-only patch budgeting. Edge patches clip (patch_h/patch_w "
    "report covered extent). Oracle recomputes every patch from the "
    "content spec, so a hash match certifies decode + 2D slicing. "
    "Scale: mapInPandas 1-in/N-out with numpy block slicing — no "
    "per-pixel Python; images filtered before the Arrow boundary.",
    tags=("llm", "multimodal"),
)
def m06_image_patch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.queries.llm_ops2 import media_frame

    # kinds filter BEFORE generation (see m05)
    return M.image_patch_stats(
        media_frame(spark, sf_dir, kinds=("image",)), patch=14
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
             AS energy,
           CAST(NULL AS VARCHAR) AS decode_error
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

    # kinds filter BEFORE generation: don't pay to encode every video
    # container just to discard it after the mapInPandas stage
    return M.audio_frame_energy(
        media_frame(spark, sf_dir, kinds=("audio",)), frame_size=64
    )


@register(
    "d56_contamination_spans",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS pos, array_to_string(ws[i:i+4], ' ') AS g
      FROM words, unnest(generate_series(1, len(ws)-4)) AS t(i)
      WHERE len(ws) >= 5
    ),
    eval_set AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
    hits AS (
      SELECT gr.doc_id, gr.pos
      FROM grams gr JOIN eval_set e USING (g)
      WHERE gr.doc_id % 50 <> 0
    ),
    isl AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS island
      FROM hits
    ),
    runs AS (
      SELECT doc_id, island, count(*) AS run_len, min(pos) AS run_start
      FROM isl GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(sum(run_len) AS BIGINT) AS n_hit_grams,
           min(run_start) AS first_hit_pos,
           CAST(max(run_len) AS BIGINT) AS max_run_len
    FROM runs GROUP BY doc_id
    """,
    description="contamination SPANS: d31 reports per-eval-doc overlap "
    "rates; this flips to the train side and reports WHERE — per "
    "contaminated train document, how many 5-gram positions carry an "
    "eval gram, where the first hit sits, and the longest CONTIGUOUS "
    "run of hit positions (gaps-and-islands: pos - row_number groups "
    "consecutive hits), which separates a verbatim quoted span from "
    "scattered common phrases — the signal that decides excise-the-"
    "span vs drop-the-document. Scale: the train scan semi-joins "
    "against the eval gram set (benchmark-sized in production — AQE "
    "broadcasts it from runtime stats; no hard hint, since this "
    "fixture derives it from a corpus slice) so only hit positions "
    "(doc, int) ever shuffle into the per-doc window — the corpus "
    "text never moves.",
    tags=("llm", "decontamination", "ngram", "window"),
)
def d56_contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = (
        load_tables(spark, sf_dir)
        .documents.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
        .filter(F.size("ws") >= 5)
    )
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(ws)-4),"
                " i -> concat_ws(' ', slice(ws, i, 5)))"
            )
        ).alias("_p", "g"),
    ).select("doc_id", (F.col("_p") + 1).alias("pos"), "g")
    is_eval = F.col("doc_id") % 50 == 0
    eval_set = grams.filter(is_eval).select("g").distinct()
    # no broadcast hint: a real eval suite is benchmark-sized and AQE
    # will broadcast it from runtime stats, but THIS fixture derives the
    # eval side from a corpus slice, so a hard hint would be the same
    # grows-with-the-corpus class the d48 hint fix removed (a >8 GB
    # operand at advertised scale). Hint-honesty is asserted registry-
    # wide by tests/test_plan_shapes.py's broadcast audit.
    hits = (
        grams.filter(~is_eval)
        .join(eval_set, "g", "left_semi")
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        hits.withColumn("_island", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "_island")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("pos").alias("run_start"),
        )
    )
    return runs.groupBy("doc_id").agg(
        F.sum("run_len").alias("n_hit_grams"),
        F.min("run_start").alias("first_hit_pos"),
        F.max("run_len").alias("max_run_len"),
    )
