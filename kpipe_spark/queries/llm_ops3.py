"""LLM-data-pipeline operators, part 3: corpus vocabulary construction
and TF-IDF keyword extraction — the tokenizer-training / doc-profiling
side of a training-data pipeline. Both fully SQL-expressible (DuckDB
oracles); both stay JVM-side (explode + aggregate, no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kpipe_spark.catalog import load_tables
from kpipe_spark.functions.text import tokens
from kpipe_spark.queries import register
from kpipe_spark.queries._oracle_fragments import (
    bpe_oracle_sql,
    ivf_lloyd_oracle_sql,
)

# mirrors text.tokens() ('' filtered) — see llm_ops._TOKS_SQL
_TOKS_SQL = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"


@register(
    "d25_vocab_build",
    oracle=f"""
    SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
    FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
    GROUP BY term
    HAVING count(*) >= 20
    """,
    description="corpus vocabulary construction: term frequency + "
    "document frequency with a min-count floor (the tokenizer-training "
    "input). One explode + one map-side-combined agg on term; the "
    "shuffle carries (term, partial counts) — Zipf skew on hot terms "
    "is exactly what partial aggregation absorbs (hot keys combine "
    "map-side, so no salting needed)",
    tags=("llm", "text", "vocab"),
)
def d25_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    return (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct("doc_id").alias("df"),
        )
        .filter(F.col("tf") >= 20)
    )


@register(
    "d26_tfidf_keywords",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, term, tfidf, rn FROM (
      SELECT t.doc_id, t.term,
             round(t.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 4) AS tfidf,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY t.tf * ln(CAST(n_docs AS DOUBLE) / df.df) DESC, t.term
             ) AS rn
      FROM tf t JOIN df ON t.term = df.term CROSS JOIN n
    ) WHERE rn <= 3 AND doc_id < 50
    """,
    description="TF-IDF keyword extraction, top-3 terms per document: "
    "per-(doc,term) TF agg, per-term DF agg, corpus size as a 1-row "
    "broadcast cross join, window top-k per doc. The DF side is "
    "vocabulary-sized -> broadcast onto the TF side, so the only big "
    "shuffles are the two aggregations; deterministic tie-break on term",
    tags=("llm", "text", "tfidf"),
)
def d26_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(score.desc(), "term")
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("doc_id") < 50))
        .select("doc_id", "term", F.round(score, 4).alias("tfidf"), "rn")
    )


@register(
    "d27_ivf_kmeans_topk",
    # round-11 (retiring the no_oracle asterisk): training moved from
    # MLlib KMeans — whose float partial-agg order makes centroids
    # bit-unstable run to run, the verify-skill flicker class applied
    # to TRAINING state — to the integer-exact fixed-point Lloyd
    # (similarity.lloyd_centroids_int), whose every step is exact
    # integer arithmetic and therefore SQL-expressible: the oracle
    # unrolls the 5 iterations as CTE rounds and runs d13's search
    # tail over the trained centroids.
    oracle=ivf_lloyd_oracle_sql(k=16, iters=5, nprobe=2, topk=5),
    description="IVF similarity search with TRAINED centroids — "
    "deterministic integer-exact Lloyd (fixed-point floor(x*2^20) "
    "coordinates, squared-L2 assignment with lowest-id ties, exact "
    "integer cell sums under any partial-agg order, floor-division "
    "means; 16 cells, 5 iterations, init = 16 lowest-id vectors): "
    "corpus assigned to nearest trained cell, probes scan nprobe=2 "
    "cells, exact cosine top-5 within candidates. The trained variant "
    "of d13's fixed-centroid IVF — recall floor pinned in pytest; "
    "per-round cost is one corpus x k-broadcast assignment plus a "
    "(cell, dim)-grouped integer sum, driver state is k x dim sums "
    "(the MLlib KMeans shape without its nondeterminism).",
    tags=("llm", "similarity", "ivf", "trained"),
)
def d27_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions import similarity as S

    emb = load_tables(spark, sf_dir).embeddings
    v = emb.select("vec_id", S.as_double_array("embedding").alias("_e"))
    cents = S.lloyd_centroids_int(v, "_e", "vec_id", k=16, iters=5)
    queries = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("_e").alias("_qe")
    )
    return S.ivf_topk(v, queries, cents, nprobe=2, k=5)


@register(
    "d28_bpe_train",
    # round-11 (retiring the no_oracle asterisk): the merge loop IS
    # SQL-expressible once unrolled — 8 chained CTE rounds, each with a
    # top-1 rule pick and a newline-framed string replace() whose
    # left-to-right non-overlap is exactly the BPE fold's semantics
    # (bpe_oracle_sql docstring carries the framing argument; the
    # Sennrich toy merges reproduce exactly).
    oracle=bpe_oracle_sql(num_merges=8),
    description="BPE tokenizer training (8 merge rules) on the corpus. "
    "One corpus pass builds the word-frequency table; every merge "
    "round then aggregates the VOCAB table (Zipf-small), not the "
    "corpus — pair counts map-side combined, top-1 via "
    "TakeOrdered(1), only the winning rule reaches the driver. "
    "Deterministic (weight desc, pair asc tie-break); exact toy-corpus "
    "merges pinned in pytest, full-corpus rules oracle-graded against "
    "an unrolled 8-round recursive-free CTE chain.",
    tags=("llm", "text", "bpe", "iterative"),
)
def d28_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions import bpe

    docs = load_tables(spark, sf_dir).documents
    rules = bpe.train_bpe(docs, num_merges=8)
    return spark.createDataFrame(
        rules, "rank int, left string, right string, pair_weight long"
    )


@register(
    "d29_column_profile",
    oracle="""
    SELECT 'o_orderstatus' AS "column", count(*) AS n_rows,
           count(*) - count(o_orderstatus) AS n_nulls,
           count(DISTINCT o_orderstatus) AS n_distinct FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice) FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority) FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey) FROM orders
    """,
    description="column profiling (null counts + exact cardinalities) "
    "in ONE scan: all per-column aggregates fused into a single "
    "map-side-combined aggregation, the 1-row result unpivoted to "
    "long form — profile cost is one pass regardless of column count",
    tags=("llm", "profiling", "quality"),
)
def d29_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions.profiling import profile_columns

    orders = load_tables(spark, sf_dir).orders
    return profile_columns(
        orders, ["o_orderstatus", "o_totalprice", "o_orderpriority", "o_custkey"]
    )


@register(
    "d30_k_anonymity",
    oracle="""
    SELECT c_mktsegment, c_nationkey, count(*) AS class_size,
           count(*) < 10 AS at_risk
    FROM customer
    GROUP BY c_mktsegment, c_nationkey
    """,
    description="k-anonymity audit over (mktsegment, nationkey) "
    "quasi-identifiers: equivalence-class sizes with an at-risk flag "
    "for classes below k=10 — the privacy release gate alongside d16's "
    "PII scrub; one shuffle on the QI tuple",
    tags=("llm", "privacy", "governance"),
)
def d30_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions.profiling import k_anonymity

    customer = load_tables(spark, sf_dir).customer
    return k_anonymity(customer, ["c_mktsegment", "c_nationkey"], k=10)
