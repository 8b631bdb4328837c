"""LLM-data-pipeline operators, part 4: train/eval decontamination and
source-mixing weights.

Reference parity note: kpipe has no text analytics (README.md:203-208
non-goals); these extend the north-star LLM surface (SURVEY.md §2.4)
on the synthetic documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kpipe_spark.catalog import load_tables
from kpipe_spark.queries import register


@register(
    "d31_contamination_check",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    grams AS (
      SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS g
      FROM words, unnest(generate_series(1, len(ws)-4)) AS t(i)
      WHERE len(ws) >= 5
    ),
    train AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 <> 0),
    eval_grams AS (
      SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 50 = 0
    )
    SELECT e.doc_id AS doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN t.g IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(round(sum(CASE WHEN t.g IS NOT NULL THEN 1 ELSE 0 END)
                      * 1.0 / count(*), 4) AS DOUBLE)
             AS contamination_rate
    FROM eval_grams e LEFT JOIN train t USING (g)
    GROUP BY e.doc_id
    """,
    description="Train/eval decontamination: per eval document (doc_id "
    "% 50 == 0 models a held-out benchmark), the fraction of its "
    "distinct word 5-grams that appear anywhere in the train split. "
    "Scale plan (the part that matters at 100 TB): the train-gram set "
    "is never globally distinct'd — the tiny eval-gram set is "
    "broadcast, the train side is SEMI-joined against it (so only "
    "grams that could match survive the scan, with partial-distinct "
    "map-side), and the resulting 'hit' set is broadcast back onto "
    "the eval grams. Train data is scanned once, shuffled never.",
    tags=("llm", "dedup", "ngram", "broadcast"),
)
def d31_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    docs = t.documents.select(
        "doc_id", F.split(F.col("text"), " ").alias("ws")
    ).filter(F.size("ws") >= 5)
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws)-4),"
                " i -> concat_ws(' ', slice(ws, i, 5)))"
            )
        ).alias("g"),
    )
    is_eval = F.col("doc_id") % 50 == 0
    eval_grams = grams.filter(is_eval).select("doc_id", "g").distinct()
    # hits = eval grams that occur in train; computed by semi-joining the
    # big train side against the broadcast eval-gram set (train is never
    # distinct'd or shuffled).
    hits = (
        grams.filter(~is_eval)
        .select("g")
        .join(F.broadcast(eval_grams.select("g").distinct()), "g", "left_semi")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        eval_grams.join(F.broadcast(hits), "g", "left_outer")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_contaminated"),
            F.round(
                F.coalesce(F.sum("hit"), F.lit(0)) * 1.0 / F.count(F.lit(1)), 4
            )
            .cast("double")
            .alias("contamination_rate"),
        )
    )


@register(
    "d32_source_mixing_weights",
    oracle="""
    WITH tok AS (
      SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS src_tokens
      FROM documents GROUP BY source
    )
    SELECT source, src_tokens,
           CAST(round(src_tokens * 1.0 / sum(src_tokens) OVER (), 6)
                AS DOUBLE) AS corpus_frac,
           CAST(round((sum(src_tokens) OVER () * 1.0
                       / count(*) OVER ()) / src_tokens, 6)
                AS DOUBLE) AS uniform_weight
    FROM tok
    """,
    description="Source-mixing budget: per-source token counts, each "
    "source's fraction of the corpus, and the sampling weight that "
    "would rebalance sources to a uniform token budget (the knob a "
    "pretraining data pipeline turns to up/down-sample domains). "
    "Scale: one map-side-combined groupBy(source) over the corpus; "
    "the global-window normalization runs on |sources| rows — "
    "driver-trivial no matter the corpus size.",
    tags=("llm", "sampling", "agg"),
)
def d32_source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    tok = (
        t.documents.select(
            "source", F.size(F.split(F.col("text"), " ")).alias("n_tok")
        )
        .groupBy("source")
        .agg(F.sum("n_tok").alias("src_tokens"))
    )
    w = Window.partitionBy()
    return tok.select(
        "source",
        "src_tokens",
        F.round(F.col("src_tokens") * 1.0 / F.sum("src_tokens").over(w), 6)
        .cast("double")
        .alias("corpus_frac"),
        F.round(
            (F.sum("src_tokens").over(w) * 1.0 / F.count(F.lit(1)).over(w))
            / F.col("src_tokens"),
            6,
        )
        .cast("double")
        .alias("uniform_weight"),
    )
