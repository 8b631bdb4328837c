"""LLM-pipeline operators, part 11: data-selection scoring and ANN
quality evaluation — the round-4 additions on top of the corpus-
assembly layer.

Reference parity note: kpipe declares analytics out of scope
(/root/reference/README.md:190-208); these extend the north-star LLM
surface (SURVEY.md §2.4) over the synthetic documents/embeddings
tables. All are public-literature methods: DSIR hashed-n-gram
importance resampling (Xie et al. 2023), interpolated-bigram LM
perplexity filtering (the CCNet/KenLM move one order up from d17's
unigram), recall@k evaluation of an IVF index against exact search
(the FAISS-style index health check), first-occurrence n-gram
novelty (dedup-aware selection scoring), per-source hashed-bigram KL
drift and per-label embedding-centroid drift (distribution-shift
monitoring in token and vector space), a Zipf rank-frequency fit
(corpus-health fingerprint), a vocabulary coverage curve
(tokenizer-budget planning), per-document OOV rate (tokenizer
fit / noise outlier gate), a snapshot reconciliation ledger
(added/removed/changed/unchanged + token deltas between crawl
snapshots via content fingerprints), per-source near-dup
participation rate (spam-influx detection, star-expanded), and
canonical NFC + whitespace text normalization (the curation
pipeline's first transform, as an Arrow-batched pandas UDF).

Scale discipline shared by the text ops here: every join is keyed on
a gram/bucket/doc hash (no cartesian anywhere), model-side tables are
either provably bounded (the 4096-row DSIR bucket table, 1-row
totals) and broadcast, or vocabulary-sized and left to a keyed
shuffle join that AQE can convert — never a corpus-scaled broadcast
hint (the d48/d56 honesty rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kpipe_spark.catalog import load_tables
from kpipe_spark.functions import dedup as D
from kpipe_spark.functions import similarity as S
from kpipe_spark.functions import text as T
from kpipe_spark.queries import register
from kpipe_spark.queries._oracle_fragments import MINHASH_CTES
from kpipe_spark.util import ensure_parallelism, materialize

# DSIR feature-hash buckets. Fixed and small: the bucket table is
# B rows regardless of corpus size, which is the whole point of the
# hashed-feature formulation — the "model" side of the score join is
# broadcastable at any scale.
_DSIR_BUCKETS = 4096
# Sources whose bigram distribution defines the DSIR target. In a real
# pipeline this is the trusted domain (wiki/books); the synthetic
# corpus spreads content uniformly over srcN, so any fixed subset
# exercises the math.
_DSIR_TARGET = ("src0", "src1")
# Rendered explicitly so the oracle SQL stays valid for ANY non-empty
# tuple — Python's tuple repr of a 1-element tuple ("src0",) is not SQL
assert len(_DSIR_TARGET) >= 1, "DSIR needs a non-empty target set"
_DSIR_TARGET_SQL = "(" + ", ".join(repr(s) for s in _DSIR_TARGET) + ")"

_BIGRAM_TOK_CTE = r"""
    toks AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '') AS t
      FROM documents
      WHERE text IS NOT NULL AND regexp_matches(text, '\S')
    ), bg AS (
      -- bigram OCCURRENCES (not distinct): importance/logprob weights
      -- count every position, mirroring zip_with(slice,slice) which
      -- emits n-1 pairs for n tokens (>=2-token docs only)
      SELECT doc_id, source,
             unnest(list_transform(range(1, len(t)),
                    i -> concat_ws(' ', t[i], t[i+1]))) AS g
      FROM toks WHERE len(t) >= 2
    )
"""


@register(
    "d68_dsir_importance",
    oracle=rf"""
    WITH {_BIGRAM_TOK_CTE.strip()},
    cnt AS (
      SELECT doc_id, any_value(source) AS source,
             CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)
               % {_DSIR_BUCKETS} AS bucket,
             count(*) AS c
      FROM bg GROUP BY doc_id,
             CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)
               % {_DSIR_BUCKETS}
    ), stats AS (
      SELECT bucket,
             sum(c) AS cr,
             coalesce(sum(c) FILTER (WHERE source IN {_DSIR_TARGET_SQL}), 0) AS ct
      FROM cnt GROUP BY bucket
    ), tot AS (
      SELECT sum(cr) AS nr, sum(ct) AS nt FROM stats
    )
    SELECT cnt.doc_id,
           CAST(sum(cnt.c) AS BIGINT) AS n_bigrams,
           round(sum(cnt.c * (log10((stats.ct + 1) / (tot.nt + {_DSIR_BUCKETS}))
                            - log10((stats.cr + 1) / (tot.nr + {_DSIR_BUCKETS})))),
                 4) AS logw
    FROM cnt JOIN stats USING (bucket) CROSS JOIN tot
    GROUP BY cnt.doc_id
    """,
    description="DSIR importance weights (Data Selection via Importance "
    "Resampling): hash every bigram occurrence into 4096 buckets "
    "(md5-lane, cross-engine exact), fit target (src0/src1 documents) "
    "and raw bag-of-hashed-bigram distributions with Laplace "
    "smoothing, and score each document by its summed log importance "
    "ratio — the standard cheap way to steer a crawl toward a trusted "
    "domain without training a classifier. Scale: the explode feeds "
    "ONE per-(doc,bucket) partial aggregate; the model side collapses "
    "to a 4096-row bucket table plus a 1-row total, both broadcast "
    "back, so the only corpus-sized exchange is the (doc,bucket) "
    "aggregation — no vocabulary-sized join anywhere.",
    tags=("llm", "selection", "tokenize"),
)
def d68_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions.selection import dsir_log_weights

    docs = load_tables(spark, sf_dir).documents
    return dsir_log_weights(docs, _DSIR_TARGET, _DSIR_BUCKETS)


@register(
    "d69_bigram_interp_logprob",
    oracle=rf"""
    WITH {_BIGRAM_TOK_CTE.strip()},
    tok AS (
      SELECT doc_id, unnest(t) AS w FROM toks
    ), uni AS (
      SELECT w, count(*) AS cu FROM tok GROUP BY w
    ), n AS (
      SELECT sum(cu) AS n FROM uni
    ), cnt AS (
      SELECT doc_id, g, count(*) AS c
      FROM bg GROUP BY doc_id, g
    ), bigf AS (
      SELECT g, sum(c) AS cbg FROM cnt GROUP BY g
    )
    SELECT cnt.doc_id,
           CAST(sum(cnt.c) AS BIGINT) AS n_bigrams,
           round(sum(cnt.c * log10(0.7 * bigf.cbg / u1.cu
                                 + 0.3 * u2.cu / n.n))
                 / sum(cnt.c), 4) AS avg_logprob
    FROM cnt
    JOIN bigf USING (g)
    JOIN uni u1 ON split_part(cnt.g, ' ', 1) = u1.w
    JOIN uni u2 ON split_part(cnt.g, ' ', 2) = u2.w
    CROSS JOIN n
    GROUP BY cnt.doc_id
    """,
    description="interpolated-bigram LM quality score — d17's KenLM-"
    "style perplexity pre-filter one order up: p = 0.7*p(w2|w1) + "
    "0.3*p(w2), with p(w2|w1) = c(w1 w2)/c(w1) fit on the corpus "
    "itself, per-document occurrence-weighted mean log10 p over its "
    "bigram positions. Repetitive template text scores HIGH (its "
    "bigrams are predictable), rare-word soup scores LOW — the signal "
    "the CCNet head/middle/tail split keys on. Scale: gram-keyed "
    "shuffle joins only; the bigram and unigram model tables are "
    "vocabulary-sized so they are NOT broadcast-hinted (the d48/d56 "
    "honesty rule) — AQE may still choose broadcast at benchmark "
    "scale. The per-doc count and unigram tables each feed multiple "
    "branches and are materialized once (localCheckpoint; swap for a "
    "stored model table in production) — the optimizer does NOT "
    "reuse an aggregation exchange across a model branch and a "
    "scoring join, so without materialization the corpus explode "
    "re-runs per consumer.",
    tags=("llm", "quality", "tokenize"),
)
def d69_bigram_interp_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    content = F.col("text").isNotNull() & F.col("text").rlike(r"\S")
    toks = docs.filter(content).select("doc_id", T.tokens("text").alias("t"))
    n = F.size("t")
    bigrams = F.zip_with(
        F.slice("t", 1, n - 1),
        F.slice("t", 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = toks.select("doc_id", F.explode(bigrams).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    # consumed by the bigram-model aggregate AND the scoring join —
    # materialize once (the docstring's ReuseExchange hope did not
    # survive contact with the optimizer: the model branch's exchange
    # never matches the join's requirement, measured 0 reuses).
    # doc_id-keyed = corpus-scaled: the injectable strategy
    # (util.set_materializer) redirects this to a stored feature
    # table on clusters instead of executor block storage
    cnt = materialize(
        bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("c")),
        scale="corpus",
    )
    bigf = cnt.groupBy("w1", "w2").agg(F.sum("c").alias("cbg"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
        # vocab-sized, consumed THREE times (w1 join, w2 join, total);
        # without this each consumer re-runs the token explode
        .localCheckpoint(eager=False)
    )
    ntot = uni.agg(F.sum("cu").alias("n"))
    p = 0.7 * F.col("cbg") / F.col("cu1") + 0.3 * F.col("cu2") / F.col("n")
    return (
        cnt.join(bigf, ["w1", "w2"])
        .join(uni.select(F.col("w").alias("w1"), F.col("cu").alias("cu1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("cu").alias("cu2")), "w2")
        .crossJoin(F.broadcast(ntot))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(F.col("c") * F.log10(p)) / F.sum("c"), 4
            ).alias("avg_logprob"),
        )
    )


_RECALL_K = 10
_RECALL_ORACLE = """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), q AS (
      -- FIXED-size eval panel (<=20 queries at any corpus size): the
      -- broadcast on the Spark side is honest only because this is
      -- bounded by construction, not a corpus-scaled sample
      SELECT vec_id AS query_id, e AS qe
      FROM v WHERE vec_id % 25 = 0 AND vec_id < 500
    ), exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, v.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qe, v.e) DESC, v.vec_id
               ) AS rn
        FROM q JOIN v ON v.vec_id <> q.query_id
      ) WHERE rn <= 10
    ), cents AS (
      SELECT vec_id AS centroid_id, e AS ce FROM v WHERE vec_id < 16
    ), assigned AS (
      SELECT vec_id, e, centroid_id FROM (
        SELECT v.vec_id, v.e, c.centroid_id,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(v.e, c.ce) DESC, c.centroid_id
               ) AS crn
        FROM v, cents c
      ) WHERE crn = 1
    ), probes AS (
      SELECT query_id, qe, centroid_id FROM (
        SELECT q.query_id, q.qe, c.centroid_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qe, c.ce) DESC, c.centroid_id
               ) AS crn
        FROM q, cents c
      ) WHERE crn <= 2
    ), cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             list_cosine_similarity(p.qe, a.e) AS sim
      FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
      WHERE a.vec_id <> p.query_id
    ), ncand AS (
      SELECT query_id, count(*) AS n_candidates FROM cand GROUP BY query_id
    ), ivf AS (
      SELECT query_id, neighbor_id, 1 AS hit FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rn
        FROM cand
      ) WHERE rn <= 10
    )
    SELECT exact.query_id,
           CAST(count(ivf.hit) AS BIGINT) AS n_hits,
           round(count(ivf.hit) / 10.0, 4) AS recall,
           CAST(any_value(ncand.n_candidates) AS BIGINT) AS n_candidates
    FROM exact
    LEFT JOIN ivf USING (query_id, neighbor_id)
    JOIN ncand USING (query_id)
    GROUP BY exact.query_id
"""


@register(
    "d70_ann_recall_eval",
    oracle=_RECALL_ORACLE,
    description="ANN index health check: recall@10 of the d13 IVF "
    "configuration (16 deterministic centroids, nprobe=2) against "
    "exact brute-force cosine top-10, per query (every 25th of the "
    "first 500 vectors — a fixed-size eval panel), "
    "plus the candidate count the IVF probe actually scanned — the "
    "two numbers (recall, scan fraction) that decide whether an index "
    "is usable before pointing a 100 TB embedding join at it. Scale: "
    "the exact side broadcasts only the QUERY sample (bounded by "
    "construction — an eval panel, not the corpus) against one corpus "
    "scan; the IVF side reuses d13's shape (argmax cell assignment "
    "via max_by partial agg, cell-keyed candidate join); the final "
    "recall join is per-(query,neighbor) — k rows per query.",
    tags=("llm", "similarity", "eval"),
)
def d70_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = _RECALL_K
    emb = load_tables(spark, sf_dir).embeddings
    # per-ROW norms once; every scored PAIR below pays ONE interpreted
    # dot fold instead of ~5 (cosine_pre — bit-identical, similarity.py)
    v = emb.select(
        "vec_id", S.as_double_array("embedding").alias("_e")
    ).withColumn("_n", S.norm(F.col("_e")))
    q = v.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 500)).select(
        F.col("vec_id").alias("query_id"),
        F.col("_e").alias("_qe"),
        F.col("_n").alias("_qn"),
    )

    # exact top-k: one corpus scan x broadcast query panel
    wq = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), "vec_id")
    exact = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            S.cosine_pre(
                F.col("_qe"), F.col("_e"), F.col("_qn"), F.col("_n")
            ).alias("_sim"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )

    cents = v.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("_e").alias("_ce"),
        F.col("_n").alias("_cn"),
    )
    assign_key = F.struct(F.col("_csim"), (-F.col("centroid_id")).alias("_nc"))
    assigned = (
        v.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "_e",
            "_n",
            "centroid_id",
            S.cosine_pre(
                F.col("_e"), F.col("_ce"), F.col("_n"), F.col("_cn")
            ).alias("_csim"),
        )
        .groupBy("vec_id")
        .agg(
            F.max_by("centroid_id", assign_key).alias("centroid_id"),
            F.any_value("_e").alias("_e"),
            F.any_value("_n").alias("_n"),
        )
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("_csim").desc(), F.col("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "_qe",
            "_qn",
            "centroid_id",
            S.cosine_pre(
                F.col("_qe"), F.col("_ce"), F.col("_qn"), F.col("_cn")
            ).alias("_csim"),
        )
        .withColumn("crn", F.row_number().over(wp))
        .filter(F.col("crn") <= 2)
        .select("query_id", "_qe", "_qn", "centroid_id")
    )
    cand = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            S.cosine_pre(
                F.col("_qe"), F.col("_e"), F.col("_qn"), F.col("_n")
            ).alias("_sim"),
        )
    )
    ncand = cand.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_candidates"))
    wr = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), "neighbor_id")
    ivf = (
        cand.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.lit(1).alias("_hit"))
    )
    return (
        exact.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("_hit").cast("long").alias("n_hits"),
            F.round(F.count("_hit") / F.lit(float(k)), 4).alias("recall"),
        )
        .join(ncand.select("query_id", F.col("n_candidates").cast("long")), "query_id")
    )


@register(
    "d71_ngram_novelty",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '') AS t
      FROM documents
      WHERE text IS NOT NULL AND regexp_matches(text, '\S')
    ), grams AS (
      SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
             i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS g
      FROM toks WHERE len(t) >= 3
      UNION ALL
      SELECT doc_id, array_to_string(t, ' ') AS g
      FROM toks WHERE len(t) < 3
    ), sh AS (
      SELECT DISTINCT doc_id, g FROM grams
    ), first AS (
      SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g
    )
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           round(coalesce(sum(CASE WHEN first.first_doc = sh.doc_id
                                   THEN 1 END), 0)
                 / count(*), 4) AS novel_frac
    FROM sh JOIN first USING (g)
    GROUP BY sh.doc_id
    """,
    description="first-occurrence n-gram novelty: per document, the "
    "fraction of its distinct 3-word shingles (d05's shingle "
    "semantics, including the <3-token whole-text fallback) whose "
    "corpus-wide FIRST occurrence (min doc_id — ingestion order) is "
    "this document. Exact duplicates of earlier docs score 0.0, "
    "fresh content scores 1.0, boilerplate-heavy pages land in "
    "between — the dedup-aware selection signal used to prefer novel "
    "text once near-dup clusters are known. Scale: one shingle "
    "explode whose gram-keyed exchange feeds BOTH the min-doc "
    "aggregate and the score join (d17's ReuseExchange shape); "
    "everything after is (doc, scalar) rows.",
    tags=("llm", "selection", "tokenize"),
)
def d71_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    content = F.col("text").isNotNull() & F.col("text").rlike(r"\S")
    # spread the interpreted-HOF shingle explode across cores (the
    # 1-split scan ran it single-task: 2.5 s alone at sf0.1), then
    # materialize ONCE: both aggregates below consume it, and the
    # original join formulation (sh ⋈ first ON g) re-computed the
    # explode AND shuffled the full shingle stream by gram a second
    # time. Counting winners per doc instead of joining them back
    # needs only map-side-combined aggregates after this — no
    # gram-keyed join at all (5.5 s -> 2.0 s at sf0.1; the remainder
    # is small-data task overhead that amortizes at scale).
    from kpipe_spark.functions.text import tokens

    # tokens projected once per row (shingles_from_tokens)
    sh = materialize(
        ensure_parallelism(docs.filter(content))
        .select("doc_id", tokens("text").alias("_tk"))
        .select(
            "doc_id",
            F.explode(D.shingles_from_tokens(F.col("_tk"), 3)).alias("g"),
        ),
        scale="corpus",
    )
    tot = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    # one row per gram (its first doc), then winners-per-doc: a doc's
    # novel count is the number of grams whose min doc_id it is
    nov = (
        sh.groupBy("g")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return tot.join(nov, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.round(
            F.coalesce(F.col("n_novel"), F.lit(0)) / F.col("n_shingles"), 4
        ).alias("novel_frac"),
    )


@register(
    "d72_source_kl_drift",
    oracle=rf"""
    WITH {_BIGRAM_TOK_CTE.strip()},
    cnt AS (
      SELECT source,
             CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)
               % {_DSIR_BUCKETS} AS bucket,
             count(*) AS c
      FROM bg GROUP BY source,
             CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)
               % {_DSIR_BUCKETS}
    ), stot AS (
      SELECT source, sum(c) AS ns FROM cnt GROUP BY source
    ), corp AS (
      SELECT bucket, sum(c) AS cq FROM cnt GROUP BY bucket
    ), tot AS (
      SELECT sum(cq) AS n FROM corp
    )
    SELECT cnt.source,
           CAST(any_value(stot.ns) AS BIGINT) AS n_bigrams,
           round(sum((cnt.c / stot.ns)
                     * log2((cnt.c / stot.ns) / (corp.cq / tot.n))), 4)
             AS kl_bits
    FROM cnt
    JOIN stot USING (source)
    JOIN corp USING (bucket)
    CROSS JOIN tot
    GROUP BY cnt.source
    """,
    description="per-source distribution drift: KL divergence (bits) "
    "of each source's hashed-bigram distribution from the corpus-wide "
    "distribution, over the same 4096-bucket md5 feature space d68 "
    "uses — the monitoring number that flags a crawl source whose "
    "content shifted (spam influx, template change, language drift) "
    "before it pollutes the mix. No smoothing needed: the corpus "
    "marginal dominates every source (q[b] >= c_s[b]/N > 0 wherever "
    "p_s[b] > 0), so the sum is over the source's own support. Scale: "
    "ONE corpus-sized partial aggregate (explode -> (source,bucket) "
    "counts, <= |sources| x 4096 rows out); everything downstream is "
    "bucket-table-sized joins.",
    tags=("llm", "monitoring", "tokenize"),
)
def d72_source_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions.monitoring import (
        bigram_bucket_counts,
        source_kl_bits,
    )

    docs = load_tables(spark, sf_dir).documents
    return source_kl_bits(bigram_bucket_counts(docs, _DSIR_BUCKETS))


_ZIPF_TOP = 1000


@register(
    "d73_zipf_fit",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '') AS t
      FROM documents
      WHERE text IS NOT NULL AND regexp_matches(text, '\S')
    ), tok AS (
      SELECT unnest(t) AS w FROM toks
    ), freq AS (
      SELECT w, count(*) AS c FROM tok GROUP BY w
    ), vocab AS (
      SELECT count(*) AS n_vocab, sum(c) AS n_tokens FROM freq
    ), top AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r
      FROM (SELECT w, c FROM freq ORDER BY c DESC, w LIMIT {_ZIPF_TOP})
    ), pts AS (
      SELECT log10(CAST(r AS DOUBLE)) AS x, log10(CAST(c AS DOUBLE)) AS y
      FROM top
    ), fit AS (
      SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts
    )
    SELECT CAST(vocab.n_vocab AS BIGINT) AS n_vocab,
           CAST(vocab.n_tokens AS BIGINT) AS n_tokens,
           round((fit.k * fit.sxy - fit.sx * fit.sy)
                 / (fit.k * fit.sxx - fit.sx * fit.sx), 4) AS zipf_slope,
           round((fit.sy - ((fit.k * fit.sxy - fit.sx * fit.sy)
                            / (fit.k * fit.sxx - fit.sx * fit.sx)) * fit.sx)
                 / fit.k, 4) AS zipf_intercept
    FROM fit CROSS JOIN vocab
    """,
    description="Zipf's-law fit as a corpus-health gate: least-squares "
    "slope/intercept of log10(frequency) on log10(rank) over the top-"
    "1000 tokens, plus vocab/token totals. Natural text sits near "
    "slope -1; template spam and word-soup generators drift far off "
    "it — a one-row fingerprint to trend per crawl snapshot. Scale: "
    "the top-1000 selection compiles to TakeOrderedAndProject (per-"
    "partition heap + merge, NO global vocab sort); the rank window "
    "then runs on a 1000-row frame, and the regression is a 5-number "
    "aggregate of that frame — nothing vocabulary-sized is ever "
    "sorted or single-tasked.",
    tags=("llm", "monitoring", "tokenize"),
)
def d73_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    content = F.col("text").isNotNull() & F.col("text").rlike(r"\S")
    freq = (
        docs.filter(content)
        .select(F.explode(T.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        # vocab-sized; feeds both the totals row and the top-1000 —
        # materialize once instead of exploding the corpus twice
        .localCheckpoint(eager=False)
    )
    vocab = freq.agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
    top = freq.orderBy(F.col("c").desc(), "w").limit(_ZIPF_TOP)
    pts = top.select(
        F.log10(
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), "w"))
            .cast("double")
        ).alias("x"),
        F.log10(F.col("c").cast("double")).alias("y"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return fit.crossJoin(F.broadcast(vocab)).select(
        "n_vocab",
        "n_tokens",
        F.round(slope, 4).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("k"), 4).alias(
            "zipf_intercept"
        ),
    )


# Fixed-point scale for embedding aggregation: float32 payloads cast
# exactly to double, then scaled by 2^24 (the float32 mantissa width)
# and rounded onto an integer grid. Cross-row sums become exact BIGINT
# arithmetic — immune to partial-aggregation order — on both engines;
# the scale cancels in cosine and divides out exactly for means.
_EMB_FP = float(1 << 24)


@register(
    "d74_embedding_drift",
    oracle=f"""
    WITH comp AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS pos,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * {_EMB_FP!r})
                  AS BIGINT) AS q
      FROM embeddings
    ), cent AS (
      SELECT label, pos, sum(q) AS s, count(*) AS n
      FROM comp GROUP BY label, pos
    ), gl AS (
      SELECT pos, sum(s) AS gs, sum(n) AS gn FROM cent GROUP BY pos
    ), j AS (
      SELECT label, cent.pos, CAST(s AS DOUBLE) AS s,
             CAST(gs AS DOUBLE) AS gs, n, gn
      FROM cent JOIN gl USING (pos)
    ), per AS (
      SELECT label, max(n) AS n_vecs,
             list(s ORDER BY pos) AS ls,
             list(gs ORDER BY pos) AS lg,
             list(s / (n * {_EMB_FP!r}) - gs / (gn * {_EMB_FP!r})
                  ORDER BY pos) AS ld
      FROM j GROUP BY label
    )
    , den AS (
      SELECT label, n_vecs, ls, lg, ld,
             sqrt(list_reduce(list_transform(range(1, len(ls) + 1),
                                             i -> ls[i] * ls[i]),
                              (a, b) -> a + b)) AS nl,
             sqrt(list_reduce(list_transform(range(1, len(lg) + 1),
                                             i -> lg[i] * lg[i]),
                              (a, b) -> a + b)) AS ng
      FROM per
    )
    SELECT label, CAST(n_vecs AS BIGINT) AS n_vecs,
           -- NULL, not NaN/error, for a degenerate zero centroid
           -- (mirrors Spark's guarded division under ANSI mode)
           CASE WHEN nl = 0 OR ng = 0 THEN NULL
                ELSE round(list_reduce(list_transform(range(1, len(ls) + 1),
                                                      i -> ls[i] * lg[i]),
                                       (a, b) -> a + b) / (nl * ng), 6)
           END AS centroid_cosine,
           round(sqrt(list_reduce(list_transform(ld, d -> d * d),
                                  (a, b) -> a + b)), 6) AS centroid_l2
    FROM den
    """,
    description="embedding-space drift monitor (the vector analogue of "
    "d72): per label, the cosine between the label's centroid and the "
    "corpus-wide centroid, plus the L2 distance between the two mean "
    "vectors — flags an embedding shard whose distribution wandered "
    "(model-version mix-up, corrupted batch, domain shift) before it "
    "poisons ANN indexes built on top. Determinism: per-dimension sums "
    "use 2^24 fixed-point BIGINTs (exact under any partial-agg order); "
    "the per-label dim-wise folds run over pos-sorted arrays so both "
    "engines add in the same sequence. Scale: ONE corpus-sized "
    "posexplode partial aggregate (map-side combine to |labels| x dim "
    "rows); everything downstream is centroid-table-sized.",
    tags=("llm", "monitoring", "embedding"),
)
def d74_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir).embeddings
    comp = emb.select(
        "label", F.posexplode(S.as_double_array("embedding")).alias("pos", "x")
    ).select(
        "label", "pos", F.round(F.col("x") * _EMB_FP).cast("long").alias("q")
    )
    cent = comp.groupBy("label", "pos").agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )
    gl = cent.groupBy("pos").agg(F.sum("s").alias("gs"), F.sum("n").alias("gn"))
    j = cent.join(F.broadcast(gl), "pos")
    per = j.groupBy("label").agg(
        F.max("n").alias("n_vecs"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("pos"),
                    F.col("s").cast("double").alias("s"),
                    F.col("gs").cast("double").alias("gs"),
                    (
                        F.col("s") / (F.col("n") * _EMB_FP)
                        - F.col("gs") / (F.col("gn") * _EMB_FP)
                    ).alias("d"),
                )
            )
        ).alias("L"),
    )
    # left folds seeded with 0.0 match DuckDB's list_reduce (seedless)
    # exactly: 0.0 + x1 == x1 in IEEE double (mixing.py:34 precedent)
    dot = F.aggregate(
        F.col("L"), F.lit(0.0), lambda a, r: a + r["s"] * r["gs"]
    )
    nl = F.sqrt(
        F.aggregate(F.col("L"), F.lit(0.0), lambda a, r: a + r["s"] * r["s"])
    )
    ng = F.sqrt(
        F.aggregate(F.col("L"), F.lit(0.0), lambda a, r: a + r["gs"] * r["gs"])
    )
    l2 = F.sqrt(
        F.aggregate(F.col("L"), F.lit(0.0), lambda a, r: a + r["d"] * r["d"])
    )
    return per.select(
        "label",
        F.col("n_vecs").cast("long").alias("n_vecs"),
        # guarded division: a degenerate zero centroid yields NULL (the
        # when() keeps ANSI mode from throwing DIVIDE_BY_ZERO; the
        # oracle's CASE mirrors it — DuckDB would give NaN, not NULL)
        F.when(
            (nl != 0) & (ng != 0), F.round(dot / (nl * ng), 6)
        ).alias("centroid_cosine"),
        F.round(l2, 6).alias("centroid_l2"),
    )


_TOK_FREQ_CTE = r"""
    toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '') AS t
      FROM documents
      WHERE text IS NOT NULL AND regexp_matches(text, '\S')
    ), tok AS (
      SELECT doc_id, unnest(t) AS w FROM toks
    ), freq AS (
      SELECT w, count(*) AS c FROM tok GROUP BY w
    )
"""

# Coverage-curve budgets: what fraction of the corpus token mass the
# top-K vocabulary covers, per candidate K. Doubling grid — the curve's
# knee is what a tokenizer-budget decision reads.
_COVERAGE_KS = (1, 2, 4, 8, 16, 32)

# Vocabulary size for the per-document OOV gate (d76). The synthetic
# corpus has ~31 distinct tokens, so 16 exercises real in/out-of-vocab
# splits; in production this is the tokenizer's vocab (30k-100k) and
# the broadcast side stays vocab-sized by construction.
_OOV_VOCAB_K = 16


@register(
    "d75_vocab_coverage",
    oracle=rf"""
    WITH {_TOK_FREQ_CTE.strip()},
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r
      FROM (SELECT w, c FROM freq ORDER BY c DESC, w
            LIMIT {max(_COVERAGE_KS)})
    ), tot AS (
      SELECT sum(c) AS t FROM freq
    ), ks AS (
      SELECT unnest({list(_COVERAGE_KS)}) AS k
    )
    SELECT CAST(ks.k AS INTEGER) AS k,
           CAST(sum(ranked.c) AS BIGINT) AS covered_tokens,
           round(sum(ranked.c) * 1.0 / any_value(tot.t), 4) AS coverage_frac
    FROM ks JOIN ranked ON ranked.r <= ks.k CROSS JOIN tot
    GROUP BY ks.k
    """,
    description="vocabulary coverage curve: for each candidate vocab "
    "budget K (1,2,4,...,32), the fraction of total corpus token "
    "occurrences covered by the top-K tokens — the knee of this curve "
    "is the tokenizer-budget planning number (and a degenerate curve "
    "is itself a corpus-health flag: template spam covers ~1.0 at tiny "
    "K). Scale: one corpus-sized token count (map-side combine), then "
    "the top-K selection compiles to TakeOrderedAndProject (per-"
    "partition heap, no global vocab sort); the curve itself is a "
    "K_max-row frame joined to a literal K grid.",
    tags=("llm", "monitoring", "tokenize"),
)
def d75_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    content = F.col("text").isNotNull() & F.col("text").rlike(r"\S")
    freq = (
        docs.filter(content)
        .select(F.explode(T.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        # vocab-sized; feeds the corpus total and the top-K ranking —
        # materialize once instead of exploding the corpus twice
        .localCheckpoint(eager=False)
    )
    tot = freq.agg(F.sum("c").alias("t"))
    top = freq.orderBy(F.col("c").desc(), "w").limit(max(_COVERAGE_KS))
    ranked = top.select(
        "c",
        F.row_number().over(Window.orderBy(F.col("c").desc(), "w")).alias("r"),
    )
    ks = spark.createDataFrame([(k,) for k in _COVERAGE_KS], "k int")
    return (
        F.broadcast(ks)
        .join(ranked, F.col("r") <= F.col("k"))
        .crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.sum("c").cast("long").alias("covered_tokens"),
            F.round(F.sum("c") / F.any_value("t"), 4).alias("coverage_frac"),
        )
    )


@register(
    "d76_oov_rate",
    oracle=rf"""
    WITH {_TOK_FREQ_CTE.strip()},
    vocab16 AS (
      SELECT w FROM freq ORDER BY c DESC, w LIMIT {_OOV_VOCAB_K}
    )
    SELECT tok.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN vocab16.w IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oov,
           round(sum(CASE WHEN vocab16.w IS NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS oov_frac
    FROM tok LEFT JOIN vocab16 ON tok.w = vocab16.w
    GROUP BY tok.doc_id
    """,
    description="per-document out-of-vocabulary rate against the "
    "corpus top-16 vocabulary: token count, OOV occurrences, and OOV "
    "fraction — the cheap proxy for 'will this doc fragment badly "
    "under the tokenizer' and a language/noise outlier flag (vocab "
    "K=16 because the synthetic corpus has ~31 distinct tokens; in "
    "production the vocab side is the tokenizer's 30k-100k list and "
    "stays broadcast-sized by construction). Scale: vocab via "
    "TakeOrderedAndProject, broadcast to a corpus-sized token explode "
    "(no shuffle on the join), then one per-doc aggregate.",
    tags=("llm", "quality", "tokenize"),
)
def d76_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    content = F.col("text").isNotNull() & F.col("text").rlike(r"\S")
    tok = docs.filter(content).select(
        "doc_id", F.explode(T.tokens("text")).alias("w")
    )
    # the vocab derivation would otherwise re-run tok's corpus explode
    # under the broadcast branch; vocab-sized, materialize once
    freq = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    vocab16 = (
        freq.orderBy(F.col("c").desc(), "w")
        .limit(_OOV_VOCAB_K)
        .select("w", F.lit(1).alias("_in"))
    )
    miss = F.col("_in").isNull()
    return (
        tok.join(F.broadcast(vocab16), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(miss, 1).otherwise(0)).cast("long").alias("n_oov"),
            F.round(
                F.sum(F.when(miss, 1).otherwise(0)) / F.count(F.lit(1)), 4
            ).alias("oov_frac"),
        )
    )


@register(
    "d77_snapshot_diff",
    oracle=r"""
    WITH h AS (
      SELECT doc_id, source, text,
             CAST(concat('0x', substr(md5(concat('snap_',
                  CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 5 AS hs,
             CAST(concat('0x', substr(md5(concat('rev_',
                  CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 7 AS hr
      FROM documents
    ), old AS (
      SELECT doc_id, source, text FROM h WHERE hs <> 0
    ), new AS (
      SELECT doc_id, source,
             CASE WHEN hr = 0 AND text IS NOT NULL
                  THEN text || ' revised edition' ELSE text END AS text
      FROM h WHERE hs <> 1
    ), j AS (
      SELECT coalesce(o.source, n.source) AS source,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN md5(coalesce(o.text, ''))
                       <> md5(coalesce(n.text, '')) THEN 'changed'
                  ELSE 'unchanged' END AS verdict,
             coalesce(len(list_filter(regexp_split_to_array(n.text, '\s+'),
                                      x -> x <> '')), 0)
             - coalesce(len(list_filter(regexp_split_to_array(o.text, '\s+'),
                                        x -> x <> '')), 0) AS tok_delta
      FROM old o FULL JOIN new n USING (doc_id)
    )
    SELECT source, verdict,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tok_delta) AS BIGINT) AS token_delta
    FROM j GROUP BY source, verdict
    """,
    description="snapshot reconciliation ledger: diff two crawl "
    "snapshots (old = stable-hash partition of the corpus, new = an "
    "overlapping partition with a deterministic subset re-crawled to "
    "changed content) into per-(source, verdict) doc counts and token "
    "deltas — added / removed / changed (md5 content fingerprint "
    "mismatch) / unchanged; the per-snapshot data-ops report that "
    "tells you what a new crawl actually did to the corpus before you "
    "re-run curation on it. Scale: ONE full outer equi-join on doc_id "
    "(co-partitionable; fingerprints are scan-local projections, no "
    "text ever shuffles beyond its own row), then a "
    "|sources| x 4-row aggregate.",
    tags=("llm", "monitoring", "cdc", "tokenize"),
)
def d77_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    did = F.col("doc_id").cast("string")
    base = docs.select(
        "doc_id",
        "source",
        "text",
        (D.md5_hash60(F.concat(F.lit("snap_"), did)) % 5).alias("hs"),
        (D.md5_hash60(F.concat(F.lit("rev_"), did)) % 7).alias("hr"),
    )
    old = base.filter(F.col("hs") != 0).select("doc_id", "source", "text")
    new = base.filter(F.col("hs") != 1).select(
        "doc_id",
        "source",
        F.when(
            (F.col("hr") == 0) & F.col("text").isNotNull(),
            F.concat(F.col("text"), F.lit(" revised edition")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    o, nn = old.alias("o"), new.alias("n")
    j = o.join(nn, "doc_id", "full")
    verdict = (
        F.when(F.col("o.source").isNull(), F.lit("added"))
        .when(F.col("n.source").isNull(), F.lit("removed"))
        .when(
            F.md5(F.coalesce(F.col("o.text"), F.lit("")))
            != F.md5(F.coalesce(F.col("n.text"), F.lit(""))),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    ntok = lambda c: F.coalesce(  # noqa: E731
        F.size(T.tokens(F.col(c))), F.lit(0)
    )
    return (
        j.select(
            F.coalesce(F.col("o.source"), F.col("n.source")).alias("source"),
            verdict.alias("verdict"),
            (ntok("n.text") - ntok("o.text")).alias("tok_delta"),
        )
        .groupBy("source", "verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok_delta").cast("long").alias("token_delta"),
        )
    )


@register(
    "d78_source_dup_rate",
    oracle=rf"""
    WITH {MINHASH_CTES.strip()},
    dup_ids AS (
      SELECT id_a AS doc_id FROM cand
      UNION
      SELECT id_b AS doc_id FROM cand
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(dd.doc_id) AS BIGINT) AS n_dup_docs,
           round(count(dd.doc_id) * 1.0 / count(*), 4) AS dup_rate
    FROM documents d LEFT JOIN dup_ids dd USING (doc_id)
    GROUP BY d.source
    """,
    description="per-source duplicate participation: for each source, "
    "the fraction of its documents that appear in ANY MinHash "
    "candidate pair — the spam-influx detector (a source whose dup "
    "rate jumps between snapshots started shipping boilerplate or "
    "re-crawls; trend it next to d72's KL drift). Scale: the Spark "
    "side expands candidates with the STAR shape (m-1 edges per "
    "bucket, linear in a hot bucket) — legitimate here because "
    "membership in the candidate graph is expansion-invariant (every "
    "bucket member appears as hub or spoke), and the all-pairs oracle "
    "proves exactly that equivalence on every run. The oracle derives "
    "from the same family constants as d05/d54, so tuning can't "
    "desync it. Contentless docs count in the denominator (they "
    "cannot near-dup anything).",
    tags=("llm", "monitoring", "dedup", "minhash", "tokenize"),
)
def d78_source_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    cand = D.minhash_candidates(docs, expand="star")
    dup_ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .unionByName(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        docs.select("doc_id", "source")
        .join(dup_ids, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0)))
            .cast("long")
            .alias("n_dup_docs"),
            F.round(
                F.sum(F.coalesce(F.col("_dup"), F.lit(0)))
                / F.count(F.lit(1)),
                4,
            ).alias("dup_rate"),
        )
    )


def _nfc_normalize_udf():
    """Arrow-batched NFC + whitespace canonicalization.

    The whitespace class is the EXPLICIT ASCII set [ \\t\\n\\r\\f\\v] —
    NOT Python's ``\\s``, which (unlike Java's and RE2's) also matches
    Unicode spaces such as NBSP; the repo-wide tokenization contract
    is that NBSP stays inside a token (test_oracle_dirty.py rows
    18-19), and the normalizer must not disagree with the tokenizer.
    NFC itself needs Python (Spark has no builtin normalizer);
    unicodedata and DuckDB's utf8proc implement the same Unicode
    normalization algorithm, which the oracle compare pins.
    """
    import pandas as pd  # noqa: F401 (type only)
    import re
    import unicodedata

    ws = re.compile(r"[ \t\n\r\f\v]+")

    @F.pandas_udf("string")
    def nfc_norm(s):  # type: ignore[no-untyped-def]
        return s.map(
            lambda t: None
            if t is None
            else unicodedata.normalize("NFC", ws.sub(" ", t).strip())
        )

    return nfc_norm


@register(
    "d79_text_normalization",
    oracle=r"""
    SELECT doc_id,
           CAST(norm <> text AS INTEGER) AS changed,
           CAST(len(norm) AS BIGINT) AS n_chars_norm,
           md5(norm) AS norm_fp
    FROM (
      SELECT doc_id, text,
             nfc_normalize(trim(regexp_replace(text,
                 '[ \t\n\r\f\v]+', ' ', 'g'))) AS norm
      FROM documents WHERE text IS NOT NULL
    )
    """,
    description="canonical text normalization — the first transform "
    "of every curation pipeline: collapse ASCII whitespace runs to "
    "single spaces, strip ends, Unicode-NFC compose (é as e+combining-"
    "acute becomes one code point, so dedup fingerprints stop "
    "splitting on encoding accidents). Emits per-doc changed flag, "
    "normalized length, and the md5 fingerprint OF THE NORMALIZED "
    "text (the key exact dedup should group on). Spark side is an "
    "Arrow-batched pandas UDF (NFC has no Catalyst builtin); the "
    "oracle pins Python's unicodedata against DuckDB's utf8proc — "
    "same Unicode algorithm, checked byte-for-byte through the md5. "
    "Scale: scan-local projection, perfectly partition-parallel; the "
    "UDF is the one legitimate Python hot-path class (vectorized, "
    "no shuffle).",
    tags=("llm", "text", "normalize"),
)
def d79_text_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    nfc = _nfc_normalize_udf()
    norm = F.col("_norm")
    return (
        docs.filter(F.col("text").isNotNull())
        .withColumn("_norm", nfc(F.col("text")))
        .select(
            "doc_id",
            (norm != F.col("text")).cast("int").alias("changed"),
            F.length(norm).cast("long").alias("n_chars_norm"),
            F.md5(norm).alias("norm_fp"),
        )
    )
