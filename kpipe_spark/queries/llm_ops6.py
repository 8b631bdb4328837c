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
from kpipe_spark.util import ensure_parallelism, ieee_round, materialize


@register(
    "d36_lm_quality_buckets",
    oracle=r"""
    WITH tok AS (
      -- '' filtered to mirror text.tokens()
      SELECT doc_id, t FROM (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        FROM documents) WHERE t <> ''
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
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(round(avg(lp), 4) AS DOUBLE) AS avg_logprob
    FROM bucketed
    GROUP BY bucket
    """,
    description="CCNet-style quality terciles: per-doc unigram LM "
    "score (d17's two-pass shape), ntile(3) over the rounded score "
    "(doc_id tie-break), per-bucket doc/token tallies. Scale: the "
    "naive ntile is a GLOBAL sort of doc-level scalars — one task "
    "holding every document's score. Because lp is round(.,4)-"
    "quantized, the exact rank decomposes d57-style: a per-lp-value "
    "histogram (domain = the 4-decimal grid, bounded ~1e5 rows "
    "regardless of corpus size) prefix-summed and broadcast back, "
    "plus a row_number partitioned BY lp value for the tie-break — "
    "parallelism is |distinct lp|, no partition holds more than one "
    "score's ties. The ntile bucket is then a closed-form function of "
    "the exact global position; bit-identical to the oracle's ntile.",
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
    # exact global position without a global sort: lp's 4-decimal grid
    # bounds the histogram domain, so the single-task window runs over
    # the HISTOGRAM; the row-level window partitions by lp value
    hist = score.groupBy("lp").agg(F.count(F.lit(1)).alias("_c"))
    w_h = Window.orderBy(F.col("lp").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    hist = hist.withColumn(
        "_above", F.coalesce(F.sum("_c").over(w_h), F.lit(0))
    ).select("lp", "_above")
    n = score.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    w_in = Window.partitionBy("lp").orderBy("doc_id")
    pos = F.col("_above") + F.row_number().over(w_in)
    # ntile(k) closed form at k=3: q=n//3, r=n%3; the first r buckets
    # hold q+1 rows. floor-of-double division is exact for n < 2^52.
    q_ = F.floor(F.col("_n") / 3)
    r_ = F.col("_n") % 3
    bucket = F.when(
        pos <= r_ * (q_ + 1), F.floor((pos - 1) / (q_ + 1)) + 1
    ).otherwise(r_ + F.floor((pos - r_ * (q_ + 1) - 1) / q_) + 1)
    return (
        score.join(F.broadcast(hist), "lp")
        .crossJoin(F.broadcast(n))
        .withColumn("bucket", bucket.cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("lp"), 4).cast("double").alias("avg_logprob"),
        )
    )


@register(
    "d37_semdedup_clusters",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), cents AS (
      SELECT vec_id AS centroid_id, e AS ce FROM v WHERE vec_id < 8
    ), assigned AS (
      SELECT vec_id, e, centroid_id FROM (
        SELECT v.vec_id, v.e, c.centroid_id,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(v.e, c.ce) DESC,
                          c.centroid_id
               ) AS crn
        FROM v, cents c
      ) WHERE crn = 1
    ), pairs AS (
      -- floor(x*1e4+0.5)/1e4, not round(x,4): engine-native round
      -- diverges at half-way points (util.ieee_round contract)
      SELECT a.centroid_id, a.vec_id AS id_a, b.vec_id AS id_b,
             floor(list_cosine_similarity(a.e, b.e) * 10000.0 + 0.5)
               / 10000.0 AS cosine_sim
      FROM assigned a JOIN assigned b
        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
      WHERE floor(list_cosine_similarity(a.e, b.e) * 10000.0 + 0.5)
              / 10000.0 >= 0.35
    )
    SELECT id_b AS vec_id,
           min(id_a) AS dup_of,
           max(cosine_sim) AS max_cosine,
           min(centroid_id) AS cluster_id
    FROM pairs GROUP BY id_b
    """,
    description="SemDeDup: cluster the embedding space coarsely, assign "
    "each vector to its nearest centroid via the map-side max_by "
    "argmax, compare pairs only within a cluster, and flag the "
    "higher-id member of every pair with cosine >= 0.35 as a duplicate "
    "of its lowest-id partner. Centroids are DETERMINISTIC (the first "
    "8 vectors — d13's trick) so the op is oracle-checkable end to "
    "end; swap in ``semdedup_mllib_pairs`` for trained KMeans cells "
    "(identical plan shape, MLlib-seeded centroids). Scale: the pair "
    "join is keyed on cluster id — each cluster's block is "
    "independent, so the quadratic term is bounded by the largest "
    "cluster, not the corpus; skewed mega-clusters split via AQE "
    "skew-join (or raise k). Centroid table is k rows — broadcast to "
    "both sides. cluster_id is single-valued per vec_id (assignment is "
    "unique), so min() is a deterministic pick.",
    tags=("llm", "dedup", "similarity", "kmeans"),
)
def d37_semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir).embeddings
    v = emb.select("vec_id", S.as_double_array("embedding").alias("_e"))
    cents = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("_e").alias("_ce")
    )
    return _semdedup_pairs(v, cents)


def _semdedup_pairs(v: DataFrame, cents: DataFrame) -> DataFrame:
    """Shared SemDeDup plan: nearest-centroid assignment (max_by argmax
    — one row per vector ships through the shuffle), within-cluster
    pair expansion, cosine-threshold flagging of the higher id."""
    # norms are per-ROW quantities: fold once per vector/centroid here
    # so the corpus×k assignment pays ONE interpreted fold per pair
    # (cosine_pre) instead of ~5 — bit-identical (similarity.cosine_pre)
    vn = v.withColumn("_n", S.norm(F.col("_e")))
    cn = cents.withColumn("_cn", S.norm(F.col("_ce")))
    scored = vn.crossJoin(F.broadcast(cn)).select(
        "vec_id",
        "_e",
        "_n",
        "centroid_id",
        S.cosine_pre(
            F.col("_e"), F.col("_ce"), F.col("_n"), F.col("_cn")
        ).alias("_csim"),
    )
    key = F.struct(F.col("_csim"), (-F.col("centroid_id")).alias("_nc"))
    # materialized once: the within-cluster self-join plans its two
    # inputs independently (the d46 trap — the whole assignment
    # pipeline would run twice), and the per-ROW norm rides along so
    # each PAIR costs one interpreted dot fold instead of three
    # (same fold, same bits as cosine() — norms are row quantities)
    assigned = materialize(
        scored.groupBy("vec_id").agg(
            F.max_by("centroid_id", key).alias("centroid_id"),
            F.any_value(F.col("_e")).alias("_e"),
            F.any_value(F.col("_n")).alias("_n"),
        ),
        scale="corpus",
    )
    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        F.col("centroid_id"),
        F.col("_e").alias("_ea"),
        F.col("_n").alias("_na"),
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"),
        F.col("centroid_id"),
        F.col("_e").alias("_eb"),
        F.col("_n").alias("_nb"),
    )
    den = F.col("_na") * F.col("_nb")
    pair_sim = F.when(den > 0, S.dot(F.col("_ea"), F.col("_eb")) / den)
    pairs = (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "centroid_id",
            "id_a",
            "id_b",
            ieee_round(pair_sim, 4).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= 0.35)
    )
    return pairs.groupBy(F.col("id_b").alias("vec_id")).agg(
        F.min("id_a").alias("dup_of"),
        F.max("cosine_sim").alias("max_cosine"),
        F.min("centroid_id").alias("cluster_id"),
    )


def semdedup_mllib_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained-centroid SemDeDup variant (seeded MLlib KMeans, k=8)
    — the one a production run uses when cluster quality matters more
    than cross-engine reproducibility. Not registered: MLlib's training
    path isn't bit-stable across environments, so it gets semantic
    pytest coverage (subset-of-brute-force) instead of a DuckDB hash.
    """
    emb = load_tables(spark, sf_dir).embeddings
    v = emb.select("vec_id", S.as_double_array("embedding").alias("_e"))
    cents = S.kmeans_centroids(v, "_e", k=8, seed=42)
    return _semdedup_pairs(v, cents)


@register(
    "d38_key_skew_profile",
    oracle="""
    WITH hh AS (
      SELECT l_suppkey AS key, count(*) AS n FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (SELECT sum(n) AS total FROM hh)
    SELECT key, n,
           CAST(round(n * 1.0 / total, 6) AS DOUBLE) AS share
    FROM hh, tot
    ORDER BY n DESC, key
    LIMIT 20
    """,
    description="join-key skew profiler: top-20 heavy-hitter keys with "
    "corpus share — the diagnostic that sizes the salting factor for "
    "`util.salted_join` (a key at share s needs ~s×parallelism salts). "
    "Scale: one map-side-combined count per key (domain = key "
    "cardinality, not corpus), total derived from the counts table "
    "(no second corpus pass), broadcast 1-row total, TakeOrdered "
    "top-20 — never a global sort. At 100 TB swap the exact count "
    "for a sampled scan or count-min sketch if the key domain itself "
    "explodes (e.g. URLs).",
    tags=("llm", "profiling", "skew"),
)
def d38_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir).lineitem
    hh = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = hh.agg(F.sum("n").alias("total"))
    return (
        hh.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("total"), 6).cast("double").alias("share"),
        )
        .orderBy(F.col("n").desc(), "key")
        .limit(20)
    )


@register(
    "d39_sequence_packing",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT source, doc_id, n_tokens,
             CAST(floor((sum(n_tokens) OVER (
                     PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tokens) / 512.0)
                  AS BIGINT) AS seq_id
      FROM t
    )
    SELECT source, seq_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM packed
    GROUP BY source, seq_id
    """,
    description="training-sequence packing (concat-then-chunk): docs "
    "concatenated per source in doc_id order, assigned to 512-token "
    "bins by the cumulative token count BEFORE each doc — the standard "
    "GPT-style pretraining packer. Scale: the naive per-source "
    "cumulative window serializes each source into ONE task (a real "
    "corpus is dominated by one web-crawl source), so the running sum "
    "is computed with prefix.ranged_prefix_sum's two-phase shape — "
    "per-(source, doc-id-range) totals via ordinary partial agg, an "
    "exclusive prefix over that range LEDGER, and a within-range "
    "window whose parallelism is sources × ranges with ≤ range_width "
    "rows per task. Value-identical to the one-window formulation "
    "(the oracle keeps the naive statement).",
    tags=("llm", "tokenize", "window"),
)
def d39_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions.prefix import ranged_prefix_sum

    docs = load_tables(spark, sf_dir).documents
    n_tokens = F.size(F.split("text", " "))
    t = docs.select("source", "doc_id", n_tokens.alias("n_tokens"))
    packed = ranged_prefix_sum(
        t, ["source"], "doc_id", F.col("n_tokens")
    ).withColumn(
        # NULL n_tokens (null text) must give a NULL seq_id exactly as
        # the oracle's (cum - n_tokens) does — the prefix itself is
        # non-NULL (SUM-skip), so gate on the weight
        "seq_id",
        F.when(
            F.col("n_tokens").isNotNull(),
            F.floor(F.col("_before") / 512.0),
        ),
    )
    return packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


@register(
    "d40_corpus_card",
    oracle="""
    SELECT coalesce(lang, 'ALL') AS lang,
           coalesce(source, 'ALL') AS source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(round(avg(n_chars), 2) AS DOUBLE) AS avg_chars,
           max(n_chars) AS max_chars
    FROM documents
    GROUP BY GROUPING SETS ((lang), (source), (lang, source), ())
    """,
    description="dataset-card rollup: corpus composition by language, "
    "by source, by the cross, and overall, in one GROUPING SETS pass "
    "— the summary table a training-mix decision reads. Scale: "
    "Catalyst expands grouping sets into a single shuffle whose key "
    "includes the grouping-set id (one corpus scan, partial aggs per "
    "set); domain is |lang|×|source| — tiny.",
    tags=("llm", "profiling", "grouping"),
)
def d40_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    docs.createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT coalesce(lang, 'ALL') AS lang,
               coalesce(source, 'ALL') AS source,
               count(*) AS n_docs,
               sum(n_chars) AS total_chars,
               CAST(round(avg(n_chars), 2) AS DOUBLE) AS avg_chars,
               max(n_chars) AS max_chars
        FROM documents
        GROUP BY GROUPING SETS ((lang), (source), (lang, source), ())
        """
    )
