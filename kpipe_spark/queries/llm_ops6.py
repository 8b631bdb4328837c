"""LLM-pipeline operators, part 6: perplexity-bucket corpus
partitioning (the CCNet head/middle/tail split) and SemDeDup-style
embedding-cluster near-duplicate removal.

d36 composes d17's unigram LM score with an ntile bucket — the
standard "split the crawl into quality terciles, train on the head"
preprocessing move. d37 is the semantic face of near-dedup: cluster
embeddings coarsely (KMeans), then compare pairs only WITHIN a
cluster — the SemDeDup trick that turns an O(n²) cosine sweep into
per-cluster work (reference: kpipe has no such operator;
/root/reference/README.md:190-191 declares all analytics out of
scope — this is north-star surface from SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kpipe_spark.catalog import load_tables
from kpipe_spark.functions import similarity as S
from kpipe_spark.functions.text import tokens
from kpipe_spark.queries import register
from kpipe_spark.util import ensure_parallelism


@register(
    "d36_lm_quality_buckets",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      FROM documents
    ), freq AS (
      SELECT t, count(*) / (SELECT count(*) FROM tok) AS p
      FROM tok GROUP BY t
    ), score AS (
      SELECT tok.doc_id,
             round(avg(log10(freq.p)), 4) AS lp,
             count(*) AS n_tokens
      FROM tok JOIN freq ON tok.t = freq.t
      GROUP BY tok.doc_id
    ), bucketed AS (
      SELECT doc_id, n_tokens, lp,
             ntile(3) OVER (ORDER BY lp DESC, doc_id) AS bucket
      FROM score
    )
    SELECT bucket,
           count(*) AS n_docs,
           sum(n_tokens) AS total_tokens,
           CAST(round(avg(lp), 4) AS DOUBLE) AS avg_logprob
    FROM bucketed
    GROUP BY bucket
    """,
    description="CCNet-style quality terciles: per-doc unigram LM "
    "score (d17's two-pass shape), ntile(3) over the rounded score "
    "(doc_id tie-break), per-bucket doc/token tallies. Scale: the "
    "ntile is a global sort of DOC-LEVEL scalars (3 columns/doc), not "
    "the corpus — at 100 TB replace it with approx_percentile "
    "thresholds broadcast back (same bucket semantics, no single-"
    "partition sort); the corpus-sized stages are identical to d17.",
    tags=("llm", "quality", "window"),
)
def d36_lm_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    tok = ensure_parallelism(docs).select(
        "doc_id", F.explode(tokens("text")).alias("t")
    )
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("_n"))
    total = counts.agg(F.sum("_n").alias("_total"))
    freq = counts.crossJoin(F.broadcast(total)).select(
        "t", (F.col("_n") / F.col("_total")).alias("p")
    )
    score = (
        tok.join(F.broadcast(freq), "t")
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(F.log10("p")), 4).alias("lp"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    w = Window.orderBy(F.col("lp").desc(), "doc_id")
    return (
        score.withColumn("bucket", F.ntile(3).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("lp"), 4).cast("double").alias("avg_logprob"),
        )
    )


@register(
    "d37_semdedup_clusters",
    oracle=None,  # KMeans training is iterative — rows-only check
    description="SemDeDup: KMeans-cluster the embedding space (seeded, "
    "MLlib), assign each vector to its nearest centroid via the "
    "map-side max_by argmax, compare pairs only within a cluster, and "
    "flag the higher-id member of every pair with cosine >= 0.35 as a "
    "duplicate of its lowest-id partner. Scale: the pair join is keyed "
    "on cluster id — each cluster's block is independent, so the "
    "quadratic term is bounded by the largest cluster, not the corpus; "
    "skewed mega-clusters split via AQE skew-join (or raise k). "
    "Centroid table is k rows — broadcast to both sides.",
    tags=("llm", "dedup", "similarity", "kmeans"),
)
def d37_semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir).embeddings
    v = emb.select("vec_id", S.as_double_array("embedding").alias("_e"))
    cents = S.kmeans_centroids(v, "_e", k=8, seed=42)
    scored = v.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "_e",
        "centroid_id",
        S.cosine(F.col("_e"), F.col("_ce")).alias("_csim"),
    )
    key = F.struct(F.col("_csim"), (-F.col("centroid_id")).alias("_nc"))
    assigned = scored.groupBy("vec_id").agg(
        F.max_by("centroid_id", key).alias("centroid_id"),
        F.any_value(F.col("_e")).alias("_e"),
    )
    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        F.col("centroid_id"),
        F.col("_e").alias("_ea"),
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"),
        F.col("centroid_id"),
        F.col("_e").alias("_eb"),
    )
    pairs = (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "centroid_id",
            "id_a",
            "id_b",
            F.round(S.cosine(F.col("_ea"), F.col("_eb")), 4).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= 0.35)
    )
    return pairs.groupBy(F.col("id_b").alias("vec_id")).agg(
        F.min("id_a").alias("dup_of"),
        F.max("cosine_sim").alias("max_cosine"),
        F.any_value("centroid_id").alias("cluster_id"),
    )
