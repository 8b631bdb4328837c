"""LLM-data-pipeline operator queries (north-star extensions).

Dedup / similarity / text-analysis over the documents and embeddings
tables. Every op here is oracle-checked: the hash-family ops
(MinHash/SimHash) build on md5 + integer affine rehash — bit-identical
across Spark and DuckDB (see functions/dedup.py module docstring) — and
the SRP top-k uses exact-rational hyperplanes; semantic pytest coverage
(tests/test_llm_ops.py: identical docs collide, unrelated docs don't)
guards the dedup contracts on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kpipe_spark.catalog import load_tables
from kpipe_spark.functions import dedup as D
from kpipe_spark.functions import similarity as S
from kpipe_spark.functions import text as T
from kpipe_spark.queries import register
from kpipe_spark.queries._oracle_fragments import MINHASH_CTES, SIMHASH_CTES

_FP_SQL = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
# mirrors text.tokens(): split on whitespace runs, '' filtered — so a
# tab-padded or whitespace-only document tokenizes identically in both
# engines (plain regexp_split of a trimmed string keeps '' entries for
# leading tabs, and [''] for empty text)
_TOKS_SQL = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"


@register(
    "d01_dedup_exact",
    oracle=f"""
    SELECT {_FP_SQL} AS text_hash,
           min(doc_id) AS doc_id,
           count(*) AS dup_count
    FROM documents
    GROUP BY 1
    """,
    description="exact dedup: normalized-content md5 fingerprint, min-id "
    "survivor; one shuffle on a 128-bit uniform key",
    tags=("llm", "dedup"),
)
def d01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    return (
        docs.select(F.col("doc_id"), T.fingerprint("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("dup_count"))
    )


@register(
    "d02_token_stats",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS_SQL}) AS n_tokens,
           len(list_distinct({_TOKS_SQL})) AS n_distinct_tokens,
           length(text) AS n_chars_actual
    FROM documents
    """,
    description="token counting: whitespace tokens + distinct tokens per "
    "document (pure projection, codegen end-to-end)",
    tags=("llm", "text"),
)
def d02_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.distinct_token_count("text").alias("n_distinct_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


_EN_STOP_SQL = "('the','a','of','and','to','in','is')"


@register(
    "d03_quality_score",
    oracle=f"""
    SELECT doc_id,
           -- null/whitespace-only text scores 0.0, mirroring
           -- quality_score's explicit guards (otherwise a token-less
           -- doc divides by zero here while Spark returns 0.0)
           CASE WHEN text IS NULL OR NOT regexp_matches(text, '\\S')
                THEN 0.0 ELSE
           floor((
             (len(list_distinct({_TOKS_SQL})) / len({_TOKS_SQL}))
             + least(len({_TOKS_SQL}) / 100.0, 1.0)
             + least((len(list_filter({_TOKS_SQL}, t -> t IN {_EN_STOP_SQL}))
                      / len({_TOKS_SQL})) * 5.0, 1.0)
           ) / 3.0 * 10000.0 + 0.5) / 10000.0 END AS quality
    FROM documents
    """,
    description="document quality scoring: lexical diversity + length + "
    "stopword-presence composite (pretraining pre-filter)",
    tags=("llm", "text"),
)
def d03_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    # tokens projected once per row: the single-expression form runs
    # the split+filter HOF 4× (quality_score_from_tokens docstring)
    base = docs.select("doc_id", "text", T.tokens("text").alias("_tk"))
    return base.select(
        "doc_id",
        T.quality_score_from_tokens(F.col("_tk"), F.col("text")).alias(
            "quality"
        ),
    )


def _lang_score_sql(lang: str) -> str:
    words = ",".join(f"'{w}'" for w in T.STOPWORDS[lang])
    return f"len(list_filter({_TOKS_SQL}, t -> t IN ({words})))"


_LANG_CASE_SQL = f"""
    CASE WHEN coalesce(greatest({_lang_score_sql('en')}, {_lang_score_sql('es')},
                       {_lang_score_sql('fr')}, {_lang_score_sql('de')},
                       {_lang_score_sql('zh')}), 0) = 0 THEN 'unknown'
         WHEN {_lang_score_sql('en')} = greatest({_lang_score_sql('en')}, {_lang_score_sql('es')}, {_lang_score_sql('fr')}, {_lang_score_sql('de')}, {_lang_score_sql('zh')}) THEN 'en'
         WHEN {_lang_score_sql('es')} = greatest({_lang_score_sql('en')}, {_lang_score_sql('es')}, {_lang_score_sql('fr')}, {_lang_score_sql('de')}, {_lang_score_sql('zh')}) THEN 'es'
         WHEN {_lang_score_sql('fr')} = greatest({_lang_score_sql('en')}, {_lang_score_sql('es')}, {_lang_score_sql('fr')}, {_lang_score_sql('de')}, {_lang_score_sql('zh')}) THEN 'fr'
         WHEN {_lang_score_sql('de')} = greatest({_lang_score_sql('en')}, {_lang_score_sql('es')}, {_lang_score_sql('fr')}, {_lang_score_sql('de')}, {_lang_score_sql('zh')}) THEN 'de'
         ELSE 'zh'
    END
"""


@register(
    "d04_lang_id",
    oracle=f"""
    SELECT {_LANG_CASE_SQL} AS predicted_lang,
           lang AS labeled_lang,
           count(*) AS n_docs
    FROM documents
    GROUP BY 1, 2
    """,
    description="n-gram/stopword-heuristic language ID, confusion counts "
    "vs the labeled lang column",
    tags=("llm", "text"),
)
def d04_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    # two-step projection: tokens once per row, then the 5 per-language
    # hit counts as COLUMNS — lang_id's single-expression form re-ran
    # the stopword filter HOF per reference (each score appears in
    # greatest + a when arm: ~15 evals per row instead of 5)
    base = docs.select("lang", "text", T.tokens("text").alias("_tk"))
    score_cols = T.lang_scores_from_tokens(F.col("_tk"))
    hits = base.select(
        "lang", *[c.alias(f"_h_{lang}") for lang, c in score_cols.items()]
    )
    pred = T.lang_id_from_scores(
        {lang: F.col(f"_h_{lang}") for lang in T.STOPWORDS}
    )
    return (
        hits.select(
            pred.alias("predicted_lang"),
            F.col("lang").alias("labeled_lang"),
        )
        .groupBy("predicted_lang", "labeled_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "d05_minhash_neardup",
    oracle=f"""
    WITH {MINHASH_CTES}
    SELECT id_a, id_b FROM cand
    """,
    description="MinHash-LSH near-duplicate candidate pairs "
    "(shingle -> md5-affine signature -> band -> bucket self-join; "
    "family = dedup.MINHASH_NUM_HASHES slots / MINHASH_BANDS bands, "
    "(24, 8) tuned via d48's calibration with the d07 verified set "
    "unchanged), oracle-checked bit-for-bit via the md5 + Mersenne-"
    "affine hash family. No global sort — candidate pairs stream out "
    "of the bucket join; the driver's comparator sorts, the engine "
    "never pays a full exchange for display order.",
    tags=("llm", "dedup", "minhash"),
)
def d05_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    return D.minhash_candidates(docs)


@register(
    "d06_simhash",
    oracle=f"""
    WITH {SIMHASH_CTES}
    SELECT doc_id, simhash64 FROM sim
    """,
    description="64-bit SimHash fingerprint per document (bit-vote over "
    "two 60-bit md5 lanes, one codegen projection) — oracle-checked "
    "bit-for-bit across engines.",
    tags=("llm", "dedup", "simhash"),
)
def d06_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    return D.simhash_df(docs)


@register(
    "d07_ngram_jaccard_pairs",
    oracle=f"""
    WITH {MINHASH_CTES},
    sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT p.id_a, p.id_b, count(*) AS i
      FROM cand p
      JOIN sh a ON a.doc_id = p.id_a
      JOIN sh b ON b.doc_id = p.id_b AND b.g = a.g
      GROUP BY p.id_a, p.id_b
    )
    SELECT i.id_a, i.id_b,
           round(i.i * 1.0 / (na.n + nb.n - i.i), 4) AS jaccard_sim
    FROM inter i
    JOIN sizes na ON na.doc_id = i.id_a
    JOIN sizes nb ON nb.doc_id = i.id_b
    WHERE round(i.i * 1.0 / (na.n + nb.n - i.i), 4) >= 0.8
    """,
    description="near-dup pairs verified by exact 3-gram Jaccard >= 0.8 "
    "over MinHash candidates (exact measure only on candidates; "
    "|A∪B| = |A|+|B|-|A∩B| on distinct-shingle sets, identical in both "
    "engines). Unsorted output — order is the comparator's job.",
    tags=("llm", "dedup", "jaccard"),
)
def d07_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    return D.ngram_jaccard_pairs(docs, threshold=0.8)


@register(
    "d08_similarity_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 8
    ), c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings
    ), scored AS (
      SELECT q.query_id, c.neighbor_id,
             list_cosine_similarity(qv, cv) AS sim
      FROM c, q WHERE c.neighbor_id <> q.query_id
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim, rn FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
    description="brute-force cosine top-5 neighbors for 8 probe vectors: "
    "broadcast probes, corpus scanned once, window shuffles only "
    "(query, neighbor, sim) tuples",
    tags=("llm", "similarity"),
)
def d08_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.brute_force_topk(emb, queries, k=5)


@register(
    "d09_lsh_similarity_topk",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), bits AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN list_sum(list_transform(range(64),
                 j -> v[j + 1] * (((k * 131 + j * 17) % 97 - 48) / 48.0)))
                 > 0 THEN 1 << k ELSE 0 END) AS INTEGER) AS bucket
      FROM e, range(4) t(k)
      GROUP BY vec_id
    ), b AS (
      SELECT e.vec_id, e.v, bits.bucket FROM e JOIN bits USING (vec_id)
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, c.v) AS sim
      FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id < 8
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim, rn FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
    description="LSH-bucketed approximate top-k (4 exact-rational "
    "hyperplanes — see similarity.srp_planes): each probe scores only "
    "its bucket — the 100 TB path where brute force is a full corpus "
    "scan per probe batch. Oracle-checked: the rational planes make "
    "the bucket assignment bit-identical across engines, so the "
    "'approximate' result is still deterministic and verifiable.",
    tags=("llm", "similarity", "lsh"),
)
def d09_lsh_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.lsh_topk(emb, queries, S.srp_planes(4, 64), k=5)


@register(
    "d10_embedding_norms",
    oracle="""
    SELECT vec_id, label,
           round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x))), 4) AS l2_norm,
           len(embedding) AS dim
    FROM embeddings
    """,
    description="embedding column hygiene: L2 norms + dimensionality "
    "(array ops, JVM-side)",
    tags=("llm", "similarity"),
)
def d10_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir).embeddings
    v = S.as_double_array("embedding")
    return emb.select(
        "vec_id",
        "label",
        F.round(S.norm(v), 4).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    )
