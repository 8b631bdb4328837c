"""LLM-pipeline operators, part 8: sampling (temperature, quality-
weighted), sequence-length/packing profiling, cross-source
contamination, dedup survivor accounting, MinHash estimator
calibration, semantic decontamination, and the leakage-safe split.

Reference parity note: kpipe declares analytics out of scope
(/root/reference/README.md:190-208); these extend the north-star LLM
surface (SURVEY.md §2.4) over the synthetic documents table.

Cross-engine determinism notes (the repo's oracle discipline):
- temperature weights use T=0.5, i.e. ``sqrt`` — IEEE-754 sqrt is
  correctly rounded, so Spark and DuckDB agree bit-for-bit where a
  ``pow(x, 0.7)`` could differ by 1 ulp between libm implementations;
- length buckets are ``length(bin(n))`` = floor(log2 n)+1 — pure
  integer/string semantics, no float log at bucket boundaries;
- every integer sum is CAST to BIGINT in the oracle (DuckDB hugeint
  -> pandas float64 otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kpipe_spark.catalog import load_tables
from kpipe_spark.functions import dedup as D
from kpipe_spark.queries import register
from kpipe_spark.functions.mixing import temperature_norm_sql
from kpipe_spark.queries._oracle_fragments import (
    COMPONENTS_CTES,
    MINHASH_CTES,
    SIMHASH_CTES,
)


@register(
    "d44_temperature_sampling_weights",
    oracle=f"""
    WITH tok AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n
      FROM documents GROUP BY source
    ), {temperature_norm_sql('tok', 'n')}
    SELECT source,
           n AS src_tokens,
           CAST(floor(pt / denom * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE)
             AS sample_prob,
           CAST(floor((pt / denom)
                / (n * 1.0 / t) * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE)
             AS upsample_factor
    FROM p, dn
    """,
    description="temperature-based source sampling (T=0.5, the "
    "multilingual-rebalance move): sample_prob_i ∝ p_i^T flattens the "
    "source distribution so low-resource sources are seen more often; "
    "upsample_factor is the repeat rate vs natural frequency. sqrt IS "
    "pow(x, 0.5) and is correctly rounded in IEEE-754, so both engines "
    "agree exactly; the pt normalizer is an explicit SEQUENTIAL fold "
    "over the source-sorted pt list (Spark F.aggregate / DuckDB "
    "list_reduce) — an ordered window SUM is not enough, since an "
    "engine may evaluate framed aggregates pairwise (segment tree) and "
    "drift 1 ulp from a sequential fold. Rounding is the ieee floor "
    "form. Scale: one map-side-combined groupBy(source); the fold runs "
    "on |sources| values in one 1-row aggregate that broadcasts back.",
    tags=("llm", "sampling", "agg"),
)
def d44_temperature_sampling_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from kpipe_spark.functions.mixing import temperature_normalize
    from kpipe_spark.util import ieee_round

    docs = load_tables(spark, sf_dir).documents
    tok = (
        docs.select("source", F.size(F.split("text", " ")).alias("_n"))
        .groupBy("source")
        .agg(F.sum("_n").alias("src_tokens"))
    )
    p = temperature_normalize(tok, "src_tokens")
    prob = F.col("_pt") / F.col("_denom")
    return p.select(
        "source",
        "src_tokens",
        ieee_round(prob, 6).alias("sample_prob"),
        ieee_round(
            prob / (F.col("src_tokens") * 1.0 / F.col("_t")), 6
        ).alias("upsample_factor"),
    )


@register(
    "d45_sequence_length_histogram",
    oracle="""
    WITH t AS (
      SELECT source, len(string_split(text, ' ')) AS n FROM documents
    )
    SELECT source,
           length(bin(n)) AS len_bucket,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           min(n) AS min_tokens,
           max(n) AS max_tokens
    FROM t GROUP BY source, length(bin(n))
    """,
    description="power-of-two sequence-length histogram per source — "
    "the profile that sizes packing bins (d39) and flags truncation "
    "loss before training. Bucket = floor(log2 n)+1 computed as the "
    "BINARY-STRING length: integer-exact in both engines, no float "
    "log at bucket boundaries. Scale: one projection + one "
    "map-side-combined groupBy on (source, bucket) — domain is "
    "|sources| × ~20 buckets.",
    tags=("llm", "profiling", "tokenize"),
)
def d45_sequence_length_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    n = F.size(F.split("text", " "))
    return (
        docs.select(
            "source",
            n.alias("_n"),
            F.length(F.bin(n.cast("long"))).alias("len_bucket"),
        )
        .groupBy("source", "len_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("total_tokens"),
            F.min("_n").alias("min_tokens"),
            F.max("_n").alias("max_tokens"),
        )
    )


@register(
    "d46_cross_source_overlap",
    oracle=f"""
    WITH {SIMHASH_CTES},
    labeled AS (
      SELECT s.doc_id, s.simhash64, d.source
      FROM sim s JOIN documents d USING (doc_id)
      WHERE s.simhash64 <> 0
    )
    SELECT a.source AS source_a, b.source AS source_b,
           count(*) AS n_pairs,
           count(DISTINCT a.doc_id) AS n_docs_a
    FROM labeled a JOIN labeled b
      ON a.simhash64 = b.simhash64 AND a.source < b.source
    GROUP BY a.source, b.source
    """,
    description="cross-source content overlap: pairs of documents from "
    "DIFFERENT sources with identical 64-bit simhash — the 'which "
    "sources mirror each other' matrix that catches a crawl ingesting "
    "the same site twice under two names. Scale: groupBy(fingerprint) "
    "with within-group pair expansion instead of a fingerprint "
    "self-join — Spark plans a self-join's two inputs independently "
    "(the corpus-side simhash would compute TWICE; verified in the "
    "physical plan), while the group-expand shape computes it once and "
    "confines the quadratic term to duplicate-group size. Same move as "
    "minhash_candidates. The per-(source,source) agg domain is "
    "|sources|^2.",
    tags=("llm", "dedup", "profiling", "simhash"),
)
def d46_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    # fingerprint 0 = token-less doc (simhash_df's degenerate default):
    # excluded, else every empty doc in source A "overlaps" every empty
    # doc in source B. Payload carried through the vote groupBy and the
    # zero join-back skipped (simhash_df docstring — the d59 shape):
    # two corpus-order shuffle joins removed, identical rows.
    labeled = D.simhash_df(
        docs, payload_cols=("source",), include_empty=False
    ).filter(F.col("simhash64") != 0)
    groups = (
        labeled.groupBy("simhash64")
        .agg(
            F.sort_array(
                F.collect_set(F.struct(F.col("source"), F.col("doc_id")))
            ).alias("_m")
        )
        .filter(F.size("_m") > 1)
    )
    n = F.size("_m")
    pairs = F.flatten(
        F.transform(
            F.col("_m"),
            lambda x, i: F.transform(
                F.slice(F.col("_m"), i + 2, n),
                lambda y: F.struct(
                    x["source"].alias("source_a"),
                    x["doc_id"].alias("id_a"),
                    y["source"].alias("source_b"),
                ),
            ),
        )
    )
    return (
        groups.select(F.explode(pairs).alias("p"))
        .filter(F.col("p.source_a") < F.col("p.source_b"))
        .groupBy(
            F.col("p.source_a").alias("source_a"),
            F.col("p.source_b").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("p.id_a").alias("n_docs_a"),
        )
    )


@register(
    "d47_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE {MINHASH_CTES},
    {COMPONENTS_CTES}
    SELECT d.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN coalesce(c.cluster_id, d.doc_id) = d.doc_id
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN coalesce(c.cluster_id, d.doc_id) = d.doc_id
                    THEN d.n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
           CAST(sum(d.n_chars) AS BIGINT) AS total_chars
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    GROUP BY d.source
    """,
    description="keep-one dedup OUTPUT accounting: per source, how many "
    "documents (and bytes) survive MinHash-component dedup "
    "(is_canonical = lowest doc id of the near-dup component keeps; "
    "d24 reports the clusters, this reports what a training mix "
    "actually retains). Scale: only the COMPONENT table (dup-graph ids "
    "+ labels, never a per-document row set) is broadcast; the corpus "
    "scan left-joins it, singletons default to their own id, and the "
    "per-source agg reuses one shuffle.",
    tags=("llm", "dedup", "sampling"),
)
def d47_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions.dedup_reports import survivors_by_source

    docs = load_tables(spark, sf_dir).documents
    # graded self-contained form: components derived inline; the stored
    # form (ClusterIndex.components_df) feeds the same consumer body
    return survivors_by_source(docs, D.dup_components(docs))


@register(
    "d48_minhash_estimator_calibration",
    oracle=f"""
    WITH {MINHASH_CTES},
    agree AS (
      SELECT c.id_a, c.id_b,
             sum(CASE WHEN sa.slot = sb.slot THEN 1 ELSE 0 END) AS eq_slots
      FROM cand c
      JOIN slots sa ON sa.doc_id = c.id_a
      JOIN slots sb ON sb.doc_id = c.id_b AND sb.k = sa.k
      GROUP BY c.id_a, c.id_b
    ),
    sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ),
    exact AS (
      SELECT p.id_a, p.id_b, count(*) AS i
      FROM cand p
      JOIN sh a ON a.doc_id = p.id_a
      JOIN sh b ON b.doc_id = p.id_b AND b.g = a.g
      GROUP BY p.id_a, p.id_b
    )
    SELECT ag.id_a, ag.id_b,
           CAST(round(ag.eq_slots / {D.MINHASH_NUM_HASHES}.0, 4) AS DOUBLE)
             AS est_jaccard,
           CAST(round(coalesce(e.i, 0) * 1.0
                      / (na.n + nb.n - coalesce(e.i, 0)), 4) AS DOUBLE)
             AS exact_jaccard
    FROM agree ag
    LEFT JOIN exact e ON e.id_a = ag.id_a AND e.id_b = ag.id_b
    JOIN sizes na ON na.doc_id = ag.id_a
    JOIN sizes nb ON nb.doc_id = ag.id_b
    """,
    description="MinHash estimator calibration over the candidate "
    "pairs: signature-agreement fraction (eq_slots/num_hashes — the "
    "unbiased Jaccard estimator) next to the exact shingle Jaccard, "
    "the table that tunes bands/rows for a target precision/recall "
    "before a 100 TB run — it picked the default (24, 8) family "
    "(dedup.MINHASH_NUM_HASHES comment has the measured sweep). "
    "Scale: the signature aggregate runs ONCE — signatures "
    "ride through the band-bucket expansion as struct members and the "
    "slot-agreement count is computed inside the pair lambda (joining "
    "the signature frame back per side would re-plan the whole "
    "aggregate per join input); only the exact-Jaccard verify joins "
    "back, against a cheap shingle PROJECTION of the scan.",
    tags=("llm", "dedup", "minhash", "profiling"),
)
def d48_minhash_estimator_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    sig = D.minhash_signature_df(docs)

    rows_per_band = D.MINHASH_ROWS_PER_BAND
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                ).alias("bucket"),
            )
            for b in range(D.MINHASH_BANDS)
        ]
    )
    bucketed = sig.select(
        "doc_id", "sig", F.explode(band_structs).alias("bb")
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    buckets = (
        bucketed.groupBy("band", "bucket")
        .agg(
            F.sort_array(
                F.collect_set(F.struct(F.col("doc_id").alias("id"), F.col("sig")))
            ).alias("_m")
        )
        .filter(F.size("_m") > 1)
    )
    n = F.size("_m")
    pairs = F.flatten(
        F.transform(
            F.col("_m"),
            lambda x, i: F.transform(
                F.slice(F.col("_m"), i + 2, n),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    F.size(
                        F.filter(
                            F.zip_with(x["sig"], y["sig"], lambda p, q: p == q),
                            lambda v: v,
                        )
                    ).alias("eq_slots"),
                ),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b", "p.eq_slots")
        .distinct()
    )

    # No broadcast hint on the shingle projections: they are roughly
    # text-sized (corpus-scale), so a hint would exceed the 8 GB
    # broadcast limit at the scale this op advertises. AQE broadcasts
    # the (small) candidate side or falls back to shuffle join.
    # Spread + materialize once: both join sides consume the shingle
    # table (the d07 shape — unmaterialized, every document's shingles
    # computed twice on a single task).
    from kpipe_spark.util import ensure_parallelism, materialize

    from kpipe_spark.functions.text import tokens

    sh = materialize(
        ensure_parallelism(docs)
        .select("doc_id", tokens("text").alias("_tk"))
        .select(
            "doc_id", D.shingles_from_tokens(F.col("_tk")).alias("_sh")
        ),
        scale="corpus",
    )
    jac = D.jaccard(F.col("_ga"), F.col("_gb"))
    return (
        cand.join(
            sh.select(F.col("doc_id").alias("id_a"), F.col("_sh").alias("_ga")),
            "id_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("id_b"), F.col("_sh").alias("_gb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(F.col("eq_slots") / float(D.MINHASH_NUM_HASHES), 4)
            .cast("double")
            .alias("est_jaccard"),
            F.round(jac, 4).cast("double").alias("exact_jaccard"),
        )
    )


@register(
    "d49_semantic_decontamination",
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
    ), hits AS (
      SELECT t.vec_id AS train_id, q.vec_id AS eval_id,
             round(list_cosine_similarity(t.v, q.v), 4) AS cosine_sim
      FROM b t JOIN b q
        ON t.bucket = q.bucket
       AND q.vec_id % 50 = 0 AND t.vec_id % 50 <> 0
      WHERE round(list_cosine_similarity(t.v, q.v), 4) >= 0.35
    )
    SELECT train_id,
           count(*) AS n_eval_matches,
           min(eval_id) AS first_eval_id,
           max(cosine_sim) AS max_cosine
    FROM hits GROUP BY train_id
    """,
    description="SEMANTIC decontamination (the embedding-space "
    "complement of d31's n-gram overlap): train vectors whose cosine "
    "similarity to any held-out eval vector (vec_id % 50 == 0 models "
    "the benchmark set) clears the threshold — the SemDeDup-style "
    "paraphrase-contamination catch that n-grams miss. Scale: both "
    "sides bucket on 8 exact-rational SRP hyperplanes, so candidate "
    "scoring is per-bucket work, and the eval side is a ~2%% sliver "
    "that AQE broadcasts; the train corpus is scanned once and never "
    "shuffled on vectors. Threshold applied to the ieee-stable rounded "
    "cosine in BOTH engines; max/count aggregates over exact-rational "
    "candidates are order-independent.",
    tags=("llm", "dedup", "similarity", "decontamination"),
)
def d49_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions import similarity as S

    emb = load_tables(spark, sf_dir).embeddings
    # per-ROW norm once; bucket-join pairs pay ONE interpreted dot
    # fold (cosine_pre — bit-identical, similarity.py)
    b = (
        emb.select("vec_id", S.as_double_array("embedding").alias("_v"))
        .withColumn(
            "_bucket", S.hyperplane_bucket(F.col("_v"), S.srp_planes(8, 64))
        )
        .withColumn("_n", S.norm(F.col("_v")))
    )
    is_eval = F.col("vec_id") % 50 == 0
    train = b.filter(~is_eval).select(
        F.col("vec_id").alias("train_id"),
        F.col("_v").alias("_tv"),
        F.col("_n").alias("_tn"),
        "_bucket",
    )
    evals = b.filter(is_eval).select(
        F.col("vec_id").alias("eval_id"),
        F.col("_v").alias("_qv"),
        F.col("_n").alias("_qn"),
        "_bucket",
    )
    sim = F.round(
        S.cosine_pre(F.col("_tv"), F.col("_qv"), F.col("_tn"), F.col("_qn")), 4
    )
    return (
        train.join(F.broadcast(evals), "_bucket")
        .select("train_id", "eval_id", sim.alias("_sim"))
        .filter(F.col("_sim") >= 0.35)
        .groupBy("train_id")
        .agg(
            F.count(F.lit(1)).alias("n_eval_matches"),
            F.min("eval_id").alias("first_eval_id"),
            F.max("_sim").alias("max_cosine"),
        )
    )


@register(
    "d50_quality_weighted_sampling",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens,
             -- null/whitespace-only text scores 0.0 and toks are
             -- ''-filtered, mirroring quality_score()/text.tokens()
             CASE WHEN text IS NULL OR NOT regexp_matches(text, '\\S')
                  THEN 0.0 ELSE
             floor((
               (len(list_distinct({{toks}})) / len({{toks}}))
               + least(len({{toks}}) / 100.0, 1.0)
               + least((len(list_filter({{toks}},
                        t -> t IN ('the','a','of','and','to','in','is')))
                        / len({{toks}})) * 5.0, 1.0)
             ) / 3.0 * 10000.0 + 0.5) / 10000.0 END AS quality
      FROM documents
    ), m AS (
      SELECT max(quality * quality) AS max_w FROM q
    )
    SELECT doc_id, source, quality,
           floor(quality * quality / max_w * 1000000.0 + 0.5) / 1000000.0
             AS keep_prob,
           CAST(floor(quality * quality / max_w * n_tokens) AS BIGINT)
             AS expected_tokens
    FROM q, m
    """.replace(
        "{toks}",
        "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')",
    ),
    description="quality-weighted sampling plan: per-doc keep "
    "probability proportional to quality^2 (squaring sharpens the "
    "gate; multiplication is IEEE-exact where a pow() could differ by "
    "1 ulp between libm implementations), normalized by the corpus max "
    "— the per-document acceptance table a weighted-sampling pass "
    "consumes, with the expected token yield per doc. Scale: one "
    "projection + a 1-row broadcast max; nothing shuffles but the "
    "scalar max.",
    tags=("llm", "sampling", "quality"),
)
def d50_quality_weighted_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions.text import quality_score_from_tokens, tokens
    from kpipe_spark.util import ieee_round

    docs = load_tables(spark, sf_dir).documents
    # tokens projected once per row (quality_score_from_tokens); the
    # n_tokens column keeps its original RAW split(' ') definition
    base = docs.select(
        "doc_id", "source", "text", tokens("text").alias("_tk")
    )
    q = base.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
        quality_score_from_tokens(F.col("_tk"), F.col("text")).alias(
            "quality"
        ),
    )
    w = F.col("quality") * F.col("quality")
    m = q.agg(F.max(w).alias("max_w"))
    return q.crossJoin(F.broadcast(m)).select(
        "doc_id",
        "source",
        "quality",
        ieee_round(w / F.col("max_w"), 6).alias("keep_prob"),
        F.floor(w / F.col("max_w") * F.col("n_tokens"))
        .cast("long")
        .alias("expected_tokens"),
    )


@register(
    "d51_packing_efficiency",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT source, n_tokens,
             CAST(floor((sum(n_tokens) OVER (
                     PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tokens) / 512.0)
                  AS BIGINT) AS seq_id
      FROM t
    ), bins AS (
      SELECT source, seq_id, CAST(sum(n_tokens) AS BIGINT) AS fill
      FROM packed GROUP BY source, seq_id
    )
    SELECT source,
           count(*) AS n_bins,
           CAST(sum(fill) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN fill >= 512 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_full_bins,
           min(fill) AS min_fill,
           max(fill) AS max_fill
    FROM bins GROUP BY source
    """,
    description="packing-efficiency audit over d39's 512-token bins: "
    "per source, how many bins the concat-then-chunk packer produces, "
    "how many reach the full sequence length, and the fill spread — "
    "the number that says whether the packer wastes compute on pad "
    "tokens. Scale: bin assignment via prefix.ranged_prefix_sum's "
    "two-phase shape (see d39) — no per-source single-task window; "
    "the per-bin and per-source aggs ride the (source, range) "
    "partitioning.",
    tags=("llm", "tokenize", "profiling"),
)
def d51_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions.prefix import ranged_prefix_sum

    docs = load_tables(spark, sf_dir).documents
    n_tokens = F.size(F.split("text", " "))
    t = docs.select("source", "doc_id", n_tokens.alias("n_tokens"))
    packed = ranged_prefix_sum(
        t, ["source"], "doc_id", F.col("n_tokens")
    ).withColumn(
        "seq_id",
        F.when(
            F.col("n_tokens").isNotNull(),
            F.floor(F.col("_before") / 512.0),
        ),
    )
    bins = packed.groupBy("source", "seq_id").agg(
        F.sum("n_tokens").alias("fill")
    )
    return bins.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("fill").alias("total_tokens"),
        F.sum(F.when(F.col("fill") >= 512, 1).otherwise(0)).alias("n_full_bins"),
        F.min("fill").alias("min_fill"),
        F.max("fill").alias("max_fill"),
    )


@register(
    "d52_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE {MINHASH_CTES},
    {COMPONENTS_CTES},
    assigned AS (
      SELECT d.doc_id,
             coalesce(c.cluster_id, d.doc_id) AS cluster_id,
             CAST(concat('0x', substr(md5(CAST(coalesce(c.cluster_id,
                  d.doc_id) AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS h
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    )
    SELECT CASE WHEN h < 80 THEN 'train'
                WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs,
           count(DISTINCT cluster_id) AS n_clusters
    FROM assigned GROUP BY 1
    """,
    description="leakage-safe train/val/test split: the split hash is "
    "computed on the near-dup CLUSTER id, not the document id, so every "
    "member of a duplicate component lands in the SAME split — the "
    "guard against a near-copy of a test document leaking into train "
    "(a plain content-hash split, d20, does not give this). 80/10/10 "
    "by md5(cluster_id) mod 100 — deterministic, rebalance-stable, "
    "cross-engine exact. Scale: only the COMPONENT table (dup-graph "
    "ids + labels) is broadcast; the corpus scan left-joins it and "
    "singletons default to their own id, so split assignment stays a "
    "projection over the scan.",
    tags=("llm", "sampling", "split", "dedup"),
)
def d52_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions.dedup_reports import leakage_safe_split

    docs = load_tables(spark, sf_dir).documents
    # graded self-contained form: components derived inline; the stored
    # form (ClusterIndex.components_df) feeds the same consumer body
    return leakage_safe_split(docs, D.dup_components(docs))


@register(
    "m04_resize_plan",
    oracle="""
    WITH img AS (
      SELECT doc_id AS media_id,
             CAST(320 + (doc_id * 37) % 1600 AS INT) AS width,
             CAST(240 + (doc_id * 53) % 900 AS INT) AS height
      FROM documents WHERE doc_id % 3 = 0
    ), resized AS (
      SELECT media_id, width, height,
             CASE WHEN greatest(width, height) <= 512 THEN width
                  WHEN width >= height THEN 512
                  ELSE greatest(1, (width * 512) // height) END AS new_w,
             CASE WHEN greatest(width, height) <= 512 THEN height
                  WHEN width >= height
                  THEN greatest(1, (height * 512) // width)
                  ELSE 512 END AS new_h
      FROM img
    )
    SELECT media_id, width, height, new_w, new_h,
           CAST(((new_w + 13) // 14) * (( new_h + 13) // 14) AS BIGINT)
             AS n_patches
    FROM resized
    """,
    description="multimodal resize/patch planning (the pre-decode step "
    "of a vision-language data pipeline): fit each image inside a "
    "512-px max dimension preserving aspect ratio, then count 14-px "
    "ViT patches after padding — the token-budget number a multimodal "
    "packer consumes. ALL integer arithmetic (floor division, no "
    "float scale factor), so the plan is oracle-exact; the synthetic "
    "per-media dimensions stand in for the codec-read ones (no image "
    "libs in this container — the real deployment swaps the dims "
    "source, not the planning math). Pure projection: zero shuffle.",
    tags=("llm", "multimodal", "profiling"),
)
def m04_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    img = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("media_id"),
        (320 + (F.col("doc_id") * 37) % 1600).cast("int").alias("width"),
        (240 + (F.col("doc_id") * 53) % 900).cast("int").alias("height"),
    )
    w, h = F.col("width"), F.col("height")
    fits = F.greatest(w, h) <= 512
    landscape = w >= h
    new_w = (
        F.when(fits, w)
        .when(landscape, F.lit(512))
        .otherwise(F.greatest(F.lit(1), F.floor(w * 512 / h).cast("int")))
    )
    new_h = (
        F.when(fits, h)
        .when(landscape, F.greatest(F.lit(1), F.floor(h * 512 / w).cast("int")))
        .otherwise(F.lit(512))
    )
    out = img.select("media_id", "width", "height", new_w.alias("new_w"), new_h.alias("new_h"))
    patches = (
        F.floor((F.col("new_w") + 13) / 14) * F.floor((F.col("new_h") + 13) / 14)
    ).cast("long")
    return out.withColumn("n_patches", patches)


@register(
    "d53_cdc_chunk_dedup",
    oracle=r"""
    WITH toks AS (
      -- '' filtered to mirror text.tokens() (positions are ordinal
      -- only, so the 1-based/0-based offset vs posexplode is harmless)
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '') AS arr
      FROM documents
    ), pos_tok AS (
      SELECT doc_id, t.pos, t.tok FROM toks,
      LATERAL (SELECT unnest(arr) AS tok,
                      generate_subscripts(arr, 1) AS pos) t
    ), marked AS (
      SELECT doc_id, pos, tok,
             CASE WHEN CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT)
                       % 32 = 0 THEN 1 ELSE 0 END AS boundary
      FROM pos_tok
    ), chunked AS (
      SELECT doc_id, pos, tok,
             CAST(sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS UNBOUNDED PRECEDING) - boundary AS BIGINT) AS chunk_id
      FROM marked
    ), chunks AS (
      SELECT doc_id, chunk_id,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_fp,
             count(*) AS n_tokens
      FROM chunked GROUP BY doc_id, chunk_id
    )
    SELECT chunk_fp,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_occurrences,
           min(n_tokens) AS chunk_tokens
    FROM chunks
    GROUP BY chunk_fp
    HAVING count(DISTINCT doc_id) > 1
    """,
    description="content-defined chunking (CDC) + sub-document dedup: "
    "chunk boundaries fall where the md5-derived token hash lands in a "
    "1/32 band (Rabin-style — boundaries are CONTENT-anchored, so an "
    "insertion shifts at most one chunk, unlike fixed windows), then "
    "chunks occurring in more than one document are the shared "
    "boilerplate at sub-document granularity — between d01's whole-doc "
    "fingerprint and d33's fixed n-grams. Scale: one posexplode + one "
    "window shuffle on doc_id (same partitioning reused by the chunk "
    "agg), then a groupBy on the 128-bit chunk fingerprint — "
    "uniformly distributed, no hot keys.",
    tags=("llm", "dedup", "text", "chunking"),
)
def d53_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions.dedup import md5_hash60
    from kpipe_spark.functions.text import tokens
    from kpipe_spark.util import ensure_parallelism

    docs = load_tables(spark, sf_dir).documents
    pos_tok = ensure_parallelism(docs).select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "tok")
    )
    boundary = F.when(md5_hash60("tok") % 32 == 0, 1).otherwise(0)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = pos_tok.withColumn("_b", boundary).withColumn(
        "chunk_id", (F.sum("_b").over(w) - F.col("_b")).cast("long")
    )
    chunks = (
        chunked.groupBy("doc_id", "chunk_id")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                        ),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("chunk_fp"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    return (
        chunks.groupBy("chunk_fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("n_tokens").alias("chunk_tokens"),
        )
        .filter(F.col("n_docs") > 1)
    )
