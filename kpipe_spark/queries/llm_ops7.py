"""North-star LLM-pipeline operators, part 7.

Information-theoretic quality signals (word-entropy, lexical
diversity) and an oracle-checked signed-random-projection near-dup
join over the embedding column. Complements d03/d17/d34 (quality) and
d05/d09/d11 (dedup/similarity): the reference's per-record transform
surface (`/root/reference/lib/kpipe-core/.../Operators.java:42-44,
96-98`) generalizes to corpus-level scoring ops here.

Shared scale discipline: every op is one corpus scan plus aggregations
keyed on (doc_id|vec_id|token) — no driver collect, no Python UDFs in
the scoring path, shuffles carry (id, token, count) or (id, bucket)
tuples only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kpipe_spark.catalog import load_tables
from kpipe_spark.functions import similarity as S
from kpipe_spark.queries import register

# Exact-rational hyperplanes (see similarity.srp_planes): bit-identical
# signs across Python / JVM / DuckDB, so the SRP join is oracle-checked.
_SRP_PLANES = S.srp_planes(8, 64)


def _token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, t, c) whitespace-token counts — the shared first stage.

    Scale: explode fans out to one row per token occurrence, but the
    groupBy partial-aggregates map-side, so the shuffle carries one
    (doc_id, token) row per DISTINCT token per doc, not per occurrence.
    """
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).filter(F.col("t") != "")
    return tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))


@register(
    "d41_word_entropy",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), cnt AS (
      SELECT doc_id, t, count(*) AS c FROM tok WHERE t <> '' GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS DOUBLE)
             AS entropy,
           CAST(round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) >= 2.8
                AS INTEGER) AS keep
    FROM cnt GROUP BY doc_id
    """,
    description="Shannon word-entropy quality filter: H = ln(n) - "
    "sum(c*ln c)/n per doc from one token-count pass; low-entropy docs "
    "(repetitive/degenerate text) flagged keep=0 at the 2.8-nat "
    "threshold, applied on the ROUNDED value so both engines agree. "
    "Scale: one scan, two map-side-combined aggs; shuffle is (doc, "
    "distinct-token) rows then one row per doc — never raw text.",
    tags=("llm", "text", "quality"),
)
def d41_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    cnt = _token_counts(load_tables(spark, sf_dir).documents)
    n = F.sum("c")
    slc = F.sum(F.col("c") * F.log(F.col("c").cast("double")))
    h = F.round(F.log(n.cast("double")) - slc / n, 4)
    return cnt.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        h.cast("double").alias("entropy"),
        (h >= 2.8).cast("integer").alias("keep"),
    )


@register(
    "d42_lexical_diversity",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), cnt AS (
      SELECT doc_id, t, count(*) AS c FROM tok WHERE t <> '' GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(round(count(*) / sum(c), 4) AS DOUBLE) AS ttr,
           CAST(round(count(*) FILTER (WHERE c = 1) / CAST(count(*) AS
                DOUBLE), 4) AS DOUBLE) AS hapax_frac
    FROM cnt GROUP BY doc_id
    """,
    description="lexical-diversity profile per doc: type-token ratio "
    "and hapax-legomenon fraction (tokens seen exactly once / distinct "
    "types) — the classic 'is this text degenerate or boilerplate' "
    "signals next to d22 repetition and d41 entropy. Scale: shares the "
    "d41 token-count stage shape; FILTER-agg is one pass.",
    tags=("llm", "text", "quality"),
)
def d42_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cnt = _token_counts(load_tables(spark, sf_dir).documents)
    n = F.sum("c")
    types = F.count(F.lit(1))
    hapax = F.count_if(F.col("c") == 1)
    return cnt.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        types.alias("n_types"),
        F.round(types / n, 4).cast("double").alias("ttr"),
        F.round(hapax / types.cast("double"), 4)
        .cast("double")
        .alias("hapax_frac"),
    )


@register(
    "d43_srp_near_dup",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), bits AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN list_sum(list_transform(range(64),
                 j -> v[j + 1] * (((k * 131 + j * 17) % 97 - 48) / 48.0)))
                 > 0 THEN 1 << k ELSE 0 END) AS INTEGER) AS bucket
      FROM e, range(8) t(k)
      GROUP BY vec_id
    ), b AS (
      SELECT e.vec_id, e.v, bits.bucket FROM e JOIN bits USING (vec_id)
    )
    SELECT a.vec_id AS id_a, c.vec_id AS id_b, a.bucket AS bucket,
           round(list_cosine_similarity(a.v, c.v), 4) AS cosine_sim
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE round(list_cosine_similarity(a.v, c.v), 4) >= 0.30
    """,
    description="signed-random-projection near-dup join, fully "
    "oracle-checked (vs d09's approximate top-k): 8 exact-rational "
    "hyperplanes give a 256-bucket SimHash-for-embeddings code; "
    "candidate pairs are generated by an equi-join on the bucket and "
    "verified with exact cosine >= 0.30 (on the rounded value, both "
    "engines). Scale: the self-join shuffles on bucket, so candidate "
    "work is sum(bucket_size^2), not corpus^2 — add planes to shrink "
    "buckets; the embedding arrays shuffle once, scoring is codegen'd "
    "fold, no Python.",
    tags=("llm", "similarity", "dedup", "lsh"),
)
def d43_srp_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir).embeddings
    # per-ROW norm once; the within-bucket pair verify pays ONE
    # interpreted dot fold (cosine_pre — bit-identical, similarity.py)
    b = (
        emb.select("vec_id", S.as_double_array("embedding").alias("_v"))
        .withColumn("_bucket", S.hyperplane_bucket(F.col("_v"), _SRP_PLANES))
        .withColumn("_n", S.norm(F.col("_v")))
    )
    a, c = b.alias("a"), b.alias("c")
    sim = F.round(
        S.cosine_pre(
            F.col("a._v"), F.col("c._v"), F.col("a._n"), F.col("c._n")
        ),
        4,
    )
    return (
        a.join(
            c,
            (F.col("a._bucket") == F.col("c._bucket"))
            & (F.col("a.vec_id") < F.col("c.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("c.vec_id").alias("id_b"),
            F.col("a._bucket").alias("bucket"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= 0.30)
    )
