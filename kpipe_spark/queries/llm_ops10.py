"""LLM-pipeline operators, part 10: corpus assembly — the decisions a
pipeline makes AFTER filtering and dedup have scored every document.

Reference parity note: kpipe declares analytics out of scope
(/root/reference/README.md:190-208); these extend the north-star LLM
surface (SURVEY.md §2.4) over the synthetic documents table.

The unifying scale discipline here is avoiding the global ordered
cumulative sum. Three of these ops (budget selection, shard planning,
the funnel) are naturally stated as "walk the corpus in order and
accumulate" — a formulation whose Spark translation is a
single-partition window, i.e. one task touching 100 TB. Each op
instead uses the two-phase shape: a small exact aggregate (a
10k-bucket histogram, a 5-row stage table, an 8-row shard ledger)
computed with ordinary partial aggregation, then a broadcast of that
small table back across the corpus. Only d57's boundary bucket — the
budget-remainder-sized sliver where the exact greedy order matters —
ever sees an ordered window, and it is partitioned down to one quality
bucket before the window runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kpipe_spark.catalog import load_tables
from kpipe_spark.functions import dedup as D
from kpipe_spark.functions import text as T
from kpipe_spark.queries import register
from kpipe_spark.queries._oracle_fragments import (
    COMPONENTS_CTES,
    MINHASH_CTES,
    SIMHASH_CTES,
)

_SW = ("the", "a", "of", "and", "to", "in", "is")

# the d50 quality expression, verbatim — d57 orders the corpus by it,
# so the fragment must stay bit-identical to quality_score(): tokens
# are ''-filtered like text.tokens(), and null/whitespace-only text
# scores 0.0 (quality_score's explicit guards)
_QUALITY_SQL = r"""
             CASE WHEN text IS NULL OR NOT regexp_matches(text, '\S')
                  THEN 0.0 ELSE
             floor((
               (len(list_distinct({toks})) / len({toks}))
               + least(len({toks}) / 100.0, 1.0)
               + least((len(list_filter({toks},
                        t -> t IN ('the','a','of','and','to','in','is')))
                        / len({toks})) * 5.0, 1.0)
             ) / 3.0 * 10000.0 + 0.5) / 10000.0 END
""".replace(
    "{toks}", "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
)


@register(
    "d57_token_budget_selection",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, source,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x <> '')) AS n_tokens,
             {_QUALITY_SQL} AS quality
      FROM documents
    ), tot AS (
      SELECT CAST(floor(sum(n_tokens) * 0.25) AS BIGINT) AS budget FROM q
    ), o AS (
      SELECT *,
             coalesce(sum(n_tokens) OVER (
               ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM q
    ), adm AS (
      SELECT * FROM o, tot WHERE before < budget
    ), st AS (
      SELECT source, count(*) AS n_admitted,
             CAST(sum(n_tokens) AS BIGINT) AS admitted_tokens
      FROM adm GROUP BY source
    ), src AS (
      SELECT source, CAST(sum(n_tokens) AS BIGINT) AS source_tokens
      FROM q GROUP BY source
    )
    SELECT s.source, n_admitted, admitted_tokens, source_tokens,
           CAST(floor((admitted_tokens * 1.0 / source_tokens) * 10000.0
                      + 0.5) / 10000.0 AS DOUBLE) AS admitted_share
    FROM st s JOIN src USING (source)
    """,
    description="token-budget corpus selection: greedily admit the "
    "highest-quality documents (quality desc, doc_id asc) until 25% of "
    "the corpus's tokens are taken — the 'best N tokens' cut every "
    "budgeted pretraining run makes — reported per source. Scale: the "
    "naive formulation is ONE ordered cumulative sum over the whole "
    "corpus (a single-partition window = one task walking 100 TB). "
    "This runs the exact-quantile two-phase instead: quality is "
    "already round4-quantized, so a <=10001-row bucket histogram "
    "(ordinary partial agg) locates the boundary bucket exactly; "
    "whole buckets above it admit with no ordering at all, and only "
    "the boundary bucket's docs — a budget-remainder-sized sliver — "
    "flow through an ordered window (partitioned to that bucket). "
    "Result is bit-identical to the oracle's global greedy scan.",
    tags=("llm", "sampling", "quality", "mixing"),
)
def d57_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.util import ieee_round

    docs = load_tables(spark, sf_dir).documents
    # n_tokens uses the same ''-filtered tokens() definition as the
    # quality ranking key (and as examples/corpus_assembly.py): raw
    # split(' ') would bill phantom '' tokens against the budget while
    # ranking on the filtered count — internally consistent but a wrong
    # denomination, flagged by round-3 ADVICE.
    # Tokens projected ONCE per row (quality_score_from_tokens — the
    # single-expression form re-runs the split+filter HOF 5×), and the
    # narrow (id, source, n_tokens, quality) projection MATERIALIZED
    # once: it feeds five plan branches (the budget total, the
    # histogram, both budget_select admission filters, and the
    # per-source totals), each of which would otherwise re-run the
    # corpus tokenize (measured 3.08 s → 1.06 s at sf0.1, identical
    # rows). Corpus-scaled, so the injectable strategy applies
    # (util.set_materializer — the stored quality-feature table
    # production keeps anyway).
    from kpipe_spark.util import materialize

    base = docs.select(
        "doc_id", "source", "text", T.tokens("text").alias("_tk")
    )
    q = materialize(
        base.select(
            "doc_id",
            "source",
            F.size("_tk").cast("long").alias("n_tokens"),
            T.quality_score_from_tokens(
                F.col("_tk"), F.col("text")
            ).alias("quality"),
        ).withColumn(
            # quality is ieee_round(x, 4): multiplying back recovers the
            # integer rank exactly (fp error << 0.5), giving an
            # equi-joinable bucket key where the double itself could not
            # be trusted
            "qint",
            F.floor(F.col("quality") * 10000.0 + F.lit(0.5)).cast("long"),
        ),
        scale="corpus",
    )
    from kpipe_spark.functions.selection import budget_select

    tot = q.agg(
        F.floor(F.sum("n_tokens") * 0.25).cast("long").alias("budget")
    )
    admitted = budget_select(
        q.crossJoin(F.broadcast(tot)),
        bucket=F.col("qint"),
        weight=F.col("n_tokens"),
        budget=F.col("budget"),
    )
    st = admitted.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_admitted"),
        F.sum("n_tokens").alias("admitted_tokens"),
    )
    src = q.groupBy("source").agg(F.sum("n_tokens").alias("source_tokens"))
    return st.join(src, "source").select(
        "source",
        "n_admitted",
        "admitted_tokens",
        "source_tokens",
        ieee_round(
            F.col("admitted_tokens") / F.col("source_tokens"), 4
        ).alias("admitted_share"),
    )


@register(
    "d58_shard_plan",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 8 AS shard
      FROM documents
    ), tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens FROM t
    )
    SELECT shard,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           max(n_tokens) AS max_doc_tokens,
           CAST(floor((sum(n_tokens) * 1.0 / corpus_tokens) * 10000.0
                      + 0.5) / 10000.0 AS DOUBLE) AS token_share
    FROM t, tot GROUP BY shard, corpus_tokens
    """,
    description="output-shard planning: assign every document to one of "
    "8 training shards by a content-independent hash of its id, and "
    "audit the balance the plan achieves (docs, tokens, share, and the "
    "largest single doc per shard — the straggler bound). Scale: the "
    "tempting alternative — round-robin by global row_number for "
    "perfect balance — is a total order, i.e. one task. Hash "
    "assignment is embarrassingly parallel, stable under reruns and "
    "appends (a doc's shard never changes when others arrive), and "
    "law-of-large-numbers balanced: the audit this op emits is how a "
    "pipeline VERIFIES that claim instead of assuming it. md5-derived "
    "so the assignment is reproducible cross-engine (dedup.md5_hash60 "
    "contract), not tied to Spark's xxhash64.",
    tags=("llm", "sharding", "profiling"),
)
def d58_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.util import ieee_round

    docs = load_tables(spark, sf_dir).documents
    t = docs.select(
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        (D.md5_hash60(F.col("doc_id").cast("string")) % 8).alias("shard"),
    )
    tot = t.agg(F.sum("n_tokens").alias("corpus_tokens"))
    return (
        t.crossJoin(F.broadcast(tot))
        .groupBy("shard", "corpus_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("n_tokens").alias("max_doc_tokens"),
        )
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            "max_doc_tokens",
            ieee_round(
                F.col("total_tokens") / F.col("corpus_tokens"), 4
            ).alias("token_share"),
        )
    )


@register(
    "d59_priority_source_dedup",
    oracle=f"""
    WITH {SIMHASH_CTES},
    f AS (
      SELECT d.doc_id, d.source, d.n_chars, s.simhash64,
             coalesce(TRY_CAST(regexp_extract(d.source, '(\\d+)$', 1)
                               AS INTEGER), 2147483647) AS pri
      FROM documents d JOIN sim s USING (doc_id)
      WHERE s.simhash64 <> 0
    ), r AS (
      SELECT *, row_number() OVER (
               PARTITION BY simhash64 ORDER BY pri, doc_id) AS rn
      FROM f
    ), win AS (
      SELECT simhash64, source AS winner_source FROM r WHERE rn = 1
    )
    SELECT winner_source, r.source AS loser_source,
           count(*) AS n_docs_lost,
           CAST(sum(n_chars) AS BIGINT) AS chars_lost
    FROM r JOIN win USING (simhash64) WHERE rn > 1
    GROUP BY winner_source, loser_source
    """,
    description="priority-source dedup: when the same content appears "
    "in multiple sources, keep the copy from the most-trusted source "
    "(lowest source index; doc_id breaks ties) and account for what "
    "each source loses to whom — the winner/loser matrix that tells a "
    "curation team which feeds are shadowed by better ones. Content "
    "identity is an identical 64-bit SimHash (d46's cross-source "
    "overlap key — same token multiset modulo tiny noise; fingerprint "
    "0 = token-less doc, excluded). Scale: group-expand, not "
    "winner-join — ONE groupBy on the 8-byte fingerprint collects "
    "each duplicate group's (pri, id, source, chars) tuples sorted, "
    "head = winner, tail explodes to losers. A winners-then-join-back "
    "formulation plans the simhash pipeline TWICE (Spark plans "
    "self-join inputs independently — the d46 trap; verified: 9 "
    "exchanges vs this shape's 3 shuffles + 2 broadcasts). Group "
    "payloads are dup-group-sized scalar tuples; text never shuffles.",
    tags=("llm", "dedup", "mixing"),
)
def d59_priority_source_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    # payload carried THROUGH the vote groupBy and the zero join-back
    # skipped (simhash_df docstring): the previous shape paid two
    # corpus-order shuffle joins — one to re-admit token-less docs this
    # filter immediately drops, one to re-attach (source, n_chars)
    # after the aggregate. Votes/bit-fold arithmetic unchanged →
    # identical rows.
    f = (
        D.simhash_df(
            docs,
            payload_cols=("source", "n_chars"),
            include_empty=False,
        )
        .filter(F.col("simhash64") != 0)
        .withColumn(
            # unnumbered sources (no trailing digits) must be the LEAST
            # trusted, not the most: regexp_extract gives '' there, and a
            # NULL pri would sort FIRST inside sort_array's struct order
            # while the oracle's plain CAST('') would throw. try_cast +
            # INT_MAX sentinel gives nulls-LAST semantics on both engines.
            "pri",
            F.coalesce(
                F.regexp_extract("source", r"(\d+)$", 1).try_cast("int"),
                F.lit(2147483647),
            ),
        )
    )
    groups = (
        f.groupBy("simhash64")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("pri", "doc_id", "source", "n_chars")
                )
            ).alias("_m")
        )
        .filter(F.size("_m") > 1)
    )
    losers = groups.select(
        F.element_at("_m", 1)["source"].alias("winner_source"),
        F.explode(F.slice("_m", 2, F.size("_m") - 1)).alias("_l"),
    )
    return losers.groupBy(
        "winner_source", F.col("_l.source").alias("loser_source")
    ).agg(
        F.count(F.lit(1)).alias("n_docs_lost"),
        F.sum("_l.n_chars").alias("chars_lost"),
    )


@register(
    "d60_curation_funnel",
    oracle=f"""
    WITH {MINHASH_CTES},
    base AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             (lang = 'en') AS f1,
             (lang = 'en'
              AND len(string_split(text, ' ')) >= 30
              AND ((len(text) - (len(string_split(text, ' ')) - 1)) * 1.0
                   / len(string_split(text, ' '))) BETWEEN 3 AND 6
              AND (len(list_filter(string_split(text, ' '),
                       x -> x IN {_SW!r})) * 1.0
                   / len(string_split(text, ' '))) >= 0.01
              AND (len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' '))) >= 0.35) AS f2,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
      FROM documents
    ), keeper AS (
      SELECT fp, min(doc_id) AS keep_id FROM base WHERE f2 GROUP BY fp
    ), s3 AS (
      SELECT b.*, (b.f2 AND b.doc_id = k.keep_id) AS f3
      FROM base b LEFT JOIN keeper k ON b.fp = k.fp
    ), drop4 AS (
      SELECT DISTINCT c.id_b AS doc_id
      FROM cand c JOIN s3 a ON a.doc_id = c.id_a AND a.f3
    ), s4 AS (
      SELECT s3.*, (f3 AND d.doc_id IS NULL) AS f4
      FROM s3 LEFT JOIN drop4 d ON s3.doc_id = d.doc_id
    ), stagecnt AS (
      SELECT (CASE WHEN f4 THEN 4 WHEN f3 THEN 3 WHEN f2 THEN 2
                   WHEN f1 THEN 1 ELSE 0 END) AS max_stage,
             count(*) AS cnt, CAST(sum(n_tokens) AS BIGINT) AS tok
      FROM s4 GROUP BY 1
    ), stages AS (SELECT unnest(range(5)) AS stage)
    SELECT s.stage,
           CASE s.stage WHEN 0 THEN 'raw' WHEN 1 THEN 'lang_en'
                WHEN 2 THEN 'gopher_gate' WHEN 3 THEN 'exact_dedup'
                ELSE 'near_dedup' END AS stage_name,
           CAST(coalesce((SELECT sum(cnt) FROM stagecnt
                          WHERE max_stage >= s.stage), 0) AS BIGINT)
             AS n_docs,
           CAST(coalesce((SELECT sum(tok) FROM stagecnt
                          WHERE max_stage >= s.stage), 0) AS BIGINT)
             AS n_tokens
    FROM stages s
    """,
    description="end-to-end curation funnel: per-stage survivor counts "
    "and token yields through raw -> English -> Gopher quality gate -> "
    "exact dedup (min-id per content fingerprint among gate survivors) "
    "-> near-dedup (drop docs with a lower-id MinHash band partner "
    "that itself survived exact dedup) — the attrition ledger every "
    "dataset card publishes. The near-dedup stage is the PAIRWISE "
    "rule, deliberately: it needs no transitive closure (d24 computes "
    "that when cluster identity matters) and over-drops only when a "
    "chain's middle link was itself removed. Scale: each stage is a "
    "flag column; the whole funnel reduces to one corpus scan plus the "
    "dedup shuffles the stages already own (md5 fingerprint, "
    "(band,bucket)); the final cumulative walk runs over a 5-row "
    "stage histogram, not the corpus.",
    tags=("llm", "dedup", "quality", "profiling"),
)
def d60_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.util import materialize

    docs = load_tables(spark, sf_dir).documents
    # token array projected ONCE per row (the gate referenced the
    # split(' ') HOF 5×), and the narrow flag frame MATERIALIZED once:
    # it feeds both sides of the keeper join plus the s4 ledger —
    # self-join inputs plan independently, so the unmaterialized form
    # ran the whole gate+fingerprint scan twice (the d46 trap)
    raw = docs.select(
        "doc_id", "lang", "text", F.split("text", " ").alias("_ts")
    )
    n = F.size("_ts")
    mwl = (F.length("text") - (n - 1)) / n
    swf = F.size(F.filter(F.col("_ts"), lambda x: x.isin(*_SW))) / n
    dr = F.size(F.array_distinct("_ts")) / n
    f1 = F.col("lang") == "en"
    f2 = f1 & (n >= 30) & mwl.between(3, 6) & (swf >= 0.01) & (dr >= 0.35)
    base = materialize(
        raw.select(
            "doc_id",
            n.cast("long").alias("n_tokens"),
            f1.alias("f1"),
            f2.alias("f2"),
            T.fingerprint("text").alias("fp"),
        ),
        scale="corpus",
    )
    keeper = base.filter("f2").groupBy("fp").agg(
        F.min("doc_id").alias("keep_id")
    )
    s3 = base.join(keeper, "fp", "left").withColumn(
        "f3", F.col("f2") & (F.col("doc_id") == F.col("keep_id"))
    )
    surv = s3.filter("f3").select(F.col("doc_id").alias("id_a"))
    drop4 = (
        D.minhash_candidates(docs)
        .join(surv, "id_a")
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    s4 = s3.join(drop4, "doc_id", "left").withColumn(
        "f4", F.col("f3") & F.col("_dropped").isNull()
    )
    max_stage = (
        F.when(F.col("f4"), 4)
        .when(F.col("f3"), 3)
        .when(F.col("f2"), 2)
        .when(F.col("f1"), 1)
        .otherwise(0)
    )
    g = s4.groupBy(max_stage.alias("max_stage")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("n_tokens").alias("tok")
    )
    stages = spark.range(5).select(F.col("id").alias("stage"))
    names = F.array(
        *[
            F.lit(s)
            for s in ("raw", "lang_en", "gopher_gate", "exact_dedup",
                      "near_dedup")
        ]
    )
    joined = stages.join(
        F.broadcast(g), stages.stage == g.max_stage, "left"
    ).select(
        "stage",
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
        F.coalesce("tok", F.lit(0)).alias("tok"),
    )
    # 5-row frame: the single-task window is over the stage histogram
    w = Window.orderBy(F.col("stage").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "stage",
        F.element_at(names, F.col("stage").cast("int") + 1).alias(
            "stage_name"
        ),
        F.sum("cnt").over(w).cast("long").alias("n_docs"),
        F.sum("tok").over(w).cast("long").alias("n_tokens"),
    )


@register(
    "m07_multimodal_packing",
    oracle="""
    WITH img AS (
      SELECT doc_id,
             CAST(320 + (doc_id * 37) % 1600 AS INT) AS width,
             CAST(240 + (doc_id * 53) % 900 AS INT) AS height
      FROM documents WHERE doc_id % 3 = 0
    ), resized AS (
      SELECT doc_id,
             CASE WHEN greatest(width, height) <= 512 THEN width
                  WHEN width >= height THEN 512
                  ELSE greatest(1, (width * 512) // height) END AS new_w,
             CASE WHEN greatest(width, height) <= 512 THEN height
                  WHEN width >= height
                  THEN greatest(1, (height * 512) // width)
                  ELSE 512 END AS new_h
      FROM img
    ), patch AS (
      SELECT doc_id,
             CAST(((new_w + 13) // 14) * ((new_h + 13) // 14) AS BIGINT)
               AS n_patches
      FROM resized
    ), samp AS (
      SELECT d.doc_id, d.source,
             CAST(len(string_split(d.text, ' ')) AS BIGINT) AS text_toks,
             CAST(coalesce(p.n_patches, 0) AS BIGINT) AS image_toks
      FROM documents d LEFT JOIN patch p USING (doc_id)
    ), packed AS (
      SELECT source, text_toks, image_toks,
             text_toks + image_toks AS sample_toks,
             CAST((sum(text_toks + image_toks) OVER (
                     PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING)
                   - (text_toks + image_toks)) // 2048 AS BIGINT) AS seq_id
      FROM samp
    )
    SELECT source, seq_id,
           count(*) AS n_samples,
           CAST(sum(text_toks) AS BIGINT) AS text_tokens,
           CAST(sum(image_toks) AS BIGINT) AS image_tokens,
           CAST(sum(sample_toks) AS BIGINT) AS total_tokens
    FROM packed GROUP BY source, seq_id
    """,
    description="multimodal sequence packing: each sample's token cost "
    "is its text tokens PLUS its image's post-resize ViT patch count "
    "(m04's integer plan; docs without an image cost text only), "
    "packed per source into 2048-token training sequences with d39's "
    "concat-then-chunk rule — the packing a vision-language trainer "
    "runs, where images are the token budget's dominant and lumpiest "
    "consumer. Emits per-sequence sample counts and the text/image "
    "token split (the modality-balance number batch composition "
    "monitoring watches). Scale: the resize plan is a pure projection; "
    "bin assignment uses prefix.ranged_prefix_sum's two-phase shape "
    "(see d39) — parallelism is sources × doc-id ranges, so a single "
    "dominant source no longer serializes into one task.",
    tags=("llm", "multimodal", "packing"),
)
def m07_multimodal_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    w_, h_ = F.col("width"), F.col("height")
    img = docs.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        (320 + (F.col("doc_id") * 37) % 1600).cast("int").alias("width"),
        (240 + (F.col("doc_id") * 53) % 900).cast("int").alias("height"),
    )
    fits = F.greatest(w_, h_) <= 512
    landscape = w_ >= h_
    new_w = (
        F.when(fits, w_)
        .when(landscape, F.lit(512))
        .otherwise(F.greatest(F.lit(1), F.floor(w_ * 512 / h_).cast("int")))
    )
    new_h = (
        F.when(fits, h_)
        .when(landscape, F.greatest(F.lit(1), F.floor(h_ * 512 / w_).cast("int")))
        .otherwise(F.lit(512))
    )
    patch = img.select(
        "doc_id",
        (
            F.floor((new_w + 13) / 14) * F.floor((new_h + 13) / 14)
        ).cast("long").alias("n_patches"),
    )
    samp = (
        docs.select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("long").alias("text_toks"),
        )
        .join(patch, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "text_toks",
            F.coalesce("n_patches", F.lit(0)).alias("image_toks"),
        )
    )
    from kpipe_spark.functions.prefix import ranged_prefix_sum

    st = F.col("text_toks") + F.col("image_toks")
    packed = ranged_prefix_sum(
        samp.withColumn("sample_toks", st), ["source"], "doc_id",
        F.col("sample_toks"),
    ).withColumn(
        "seq_id",
        F.when(
            F.col("sample_toks").isNotNull(),
            F.floor(F.col("_before") / 2048.0),
        ).cast("long"),
    )
    return packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum("text_toks").alias("text_tokens"),
        F.sum("image_toks").alias("image_tokens"),
        F.sum("sample_toks").alias("total_tokens"),
    )


@register(
    "d61_dup_substring_spans",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS pos,
             CAST(concat('0x', substr(md5(array_to_string(ws[i:i+4], ' ')),
                  1, 15)) AS BIGINT) AS h
      FROM words, unnest(generate_series(1, len(ws)-4)) AS t(i)
      WHERE len(ws) >= 5
    ),
    dup AS (
      SELECT h FROM grams GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (h)),
    fl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (
                    PARTITION BY doc_id ORDER BY pos) > 5
                  THEN 1 ELSE 0 END AS brk
      FROM hits
    ),
    isl AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM fl
    ),
    spans AS (
      SELECT doc_id, island, count(*) AS n_grams,
             max(pos) - min(pos) + 5 AS span_len
      FROM isl GROUP BY doc_id, island
    ),
    agg AS (
      SELECT doc_id, CAST(sum(n_grams) AS BIGINT) AS n_dup_grams,
             count(*) AS n_spans,
             CAST(max(span_len) AS BIGINT) AS longest_span_tokens,
             CAST(sum(span_len) AS BIGINT) AS covered
      FROM spans GROUP BY doc_id
    )
    SELECT a.doc_id, n_dup_grams, n_spans, longest_span_tokens,
           CAST(floor(covered * 1.0 / len(w.ws) * 10000.0 + 0.5)
                / 10000.0 AS DOUBLE) AS dup_token_frac
    FROM agg a JOIN words w USING (doc_id)
    """,
    description="cross-document duplicated SUBSTRING spans: positions "
    "whose 5-gram also appears in another document, merged into "
    "maximal spans (two dup-gram starts within 5 positions overlap or "
    "touch as token ranges), reporting per doc the span count, the "
    "longest span and the fraction of tokens covered — the "
    "sub-document exact-duplication signal (the substring-dedup "
    "family: whole-doc dedup misses a page whose middle third is a "
    "syndicated boilerplate block). d53 chunks content-defined and "
    "dedups chunks; this is position-exact and gap-merged, the "
    "excise-these-byte-ranges ledger. Scale: grams travel as 60-bit "
    "md5 keys (8 B), never text; the dup set comes from one "
    "partial-agg countDistinct and is JOINED (not broadcast — it is "
    "corpus-sized) back on the hash, so both shuffles key on "
    "well-spread 8-byte hashes; span merging windows per doc. Hash "
    "collisions affect both engines identically, so the oracle "
    "equality is exact by construction.",
    tags=("llm", "dedup", "ngram", "window"),
)
def d61_dup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.util import ieee_round

    docs = load_tables(spark, sf_dir).documents.select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    grams = (
        docs.filter(F.size("ws") >= 5)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(1, size(ws)-4),"
                    " i -> concat_ws(' ', slice(ws, i, 5)))"
                )
            ).alias("_p", "g"),
        )
        .select(
            "doc_id",
            (F.col("_p") + 1).alias("pos"),
            D.md5_hash60(F.col("g")).alias("h"),
        )
    )
    # ONE pass over the grams: grouping by hash and carrying each
    # gram's (doc, pos) occurrence list computes the explode+md5 stage
    # once, where a dup-set semi-join would plan it twice (self-join
    # inputs plan independently — the d46/d59 trap) for the SAME
    # shuffle volume (the probe side ships every gram row on h anyway).
    # Occurrence lists are per-unique-gram sized; a mega-boilerplate
    # gram's list is the same hot key the join's hot bucket would be.
    hits = (
        grams.groupBy("h")
        .agg(
            F.countDistinct("doc_id").alias("_nd"),
            F.collect_list(F.struct("doc_id", "pos")).alias("_occ"),
        )
        .filter(F.col("_nd") >= 2)
        .select(F.explode("_occ").alias("_o"))
        .select(F.col("_o.doc_id").alias("doc_id"), F.col("_o.pos").alias("pos"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w) > 5, F.lit(1)
    ).otherwise(F.lit(0))
    isl = hits.withColumn(
        "island",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = isl.groupBy("doc_id", "island").agg(
        F.count(F.lit(1)).alias("n_grams"),
        (F.max("pos") - F.min("pos") + 5).alias("span_len"),
    )
    agg = spans.groupBy("doc_id").agg(
        F.sum("n_grams").alias("n_dup_grams"),
        F.count(F.lit(1)).alias("n_spans"),
        F.max("span_len").alias("longest_span_tokens"),
        F.sum("span_len").alias("_covered"),
    )
    return agg.join(docs, "doc_id").select(
        "doc_id",
        "n_dup_grams",
        "n_spans",
        "longest_span_tokens",
        ieee_round(F.col("_covered") / F.size("ws"), 4).alias(
            "dup_token_frac"
        ),
    )


@register(
    "d62_ivf_cell_profile",
    oracle="""
    WITH v AS (
      -- zero-norm vectors (failed embed runs) are not indexable:
      -- S.cosine returns NULL for them while DuckDB's
      -- list_cosine_similarity returns -1.0, so they are excluded on
      -- BOTH sides rather than profiled divergently
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      WHERE list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                    x -> x * x)) > 0
    ), cents AS (
      SELECT vec_id AS centroid_id, e AS ce FROM v WHERE vec_id < 16
    ), assigned AS (
      SELECT vec_id, centroid_id, sim FROM (
        SELECT v.vec_id, c.centroid_id,
               list_cosine_similarity(v.e, c.ce) AS sim,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(v.e, c.ce) DESC,
                          c.centroid_id
               ) AS crn
        FROM v, cents c
      ) WHERE crn = 1
    ), tot AS (SELECT count(*) AS n FROM assigned)
    SELECT centroid_id,
           count(*) AS n_vectors,
           CAST(floor(count(*) * 1.0 / n * 10000.0 + 0.5) / 10000.0
                AS DOUBLE) AS cell_share,
           CAST(floor(min(sim) * 10000.0 + 0.5) / 10000.0 AS DOUBLE)
             AS min_sim,
           CAST(floor(max(sim) * 10000.0 + 0.5) / 10000.0 AS DOUBLE)
             AS max_sim
    FROM assigned, tot GROUP BY centroid_id, n
    """,
    description="IVF index-health profile: per coarse cell (d13's "
    "deterministic first-16 centroids), how many vectors it holds, its "
    "corpus share, and the min/max cosine to its centroid — the audit "
    "that decides re-clustering: a cell owning 30% of the corpus is "
    "the query-time straggler (probing it scans 30% of 100 TB), and a "
    "low min_sim says the cell's tail is closer to some other "
    "centroid's territory. Statistics are deliberately order-safe "
    "(count/min/max — no float SUM whose partial-agg order Spark "
    "schedules nondeterministically), so the op hash-checks without a "
    "sequential-fold workaround. Scale: same one-pass max_by "
    "assignment as d13 (k candidate rows collapse map-side, one row "
    "per vector shuffles); the profile is a k-row aggregate.",
    tags=("llm", "similarity", "ivf", "profiling"),
)
def d62_ivf_cell_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions import similarity as S
    from kpipe_spark.util import ieee_round

    emb = load_tables(spark, sf_dir).embeddings
    # _n computed once per row (same fold as the filter's norm, so the
    # predicate is unchanged); the corpus×k assignment then pays ONE
    # interpreted dot fold per pair (cosine_pre — bit-identical)
    v = (
        emb.select("vec_id", S.as_double_array("embedding").alias("_e"))
        .withColumn("_n", S.norm(F.col("_e")))
        .filter(F.col("_n") > 0)
    )
    cents = v.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("_e").alias("_ce"),
        F.col("_n").alias("_cn"),
    )
    scored = v.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        S.cosine_pre(
            F.col("_e"), F.col("_ce"), F.col("_n"), F.col("_cn")
        ).alias("_csim"),
    )
    key = F.struct(
        F.col("_csim").alias("_csim"), (-F.col("centroid_id")).alias("_nc")
    )
    assigned = scored.groupBy("vec_id").agg(
        F.max_by("centroid_id", key).alias("centroid_id"),
        F.max(key).getField("_csim").alias("_sim"),
    )
    tot = assigned.agg(F.count(F.lit(1)).alias("_n"))
    return (
        assigned.crossJoin(F.broadcast(tot))
        .groupBy("centroid_id", "_n")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("_sim").alias("_min"),
            F.max("_sim").alias("_max"),
        )
        .select(
            "centroid_id",
            "n_vectors",
            ieee_round(F.col("n_vectors") / F.col("_n"), 4).alias(
                "cell_share"
            ),
            ieee_round(F.col("_min"), 4).alias("min_sim"),
            ieee_round(F.col("_max"), 4).alias("max_sim"),
        )
    )


@register(
    "d63_tokenizer_fertility",
    oracle="""
    WITH t AS (
      SELECT source,
             CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+'))
                  AS BIGINT) AS n_subwords
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(sum(n_subwords) AS BIGINT) AS total_subwords,
           -- explicit NULL for an all-contentless source: ANSI Spark
           -- would otherwise throw DIVIDE_BY_ZERO where DuckDB nulls
           CAST(CASE WHEN sum(n_words) = 0 THEN NULL
                ELSE floor(sum(n_subwords) * 1.0 / sum(n_words) * 10000.0
                           + 0.5) / 10000.0 END AS DOUBLE) AS fertility
    FROM t GROUP BY source
    """,
    description="tokenizer fertility per source: subword tokens (the "
    "BPE-ish pre-tok of d18/d28) emitted per whitespace word — THE "
    "standard metric for how well a tokenizer fits a corpus slice "
    "(fertility near 1 = vocabulary covers the text; high fertility = "
    "the source pays more context budget per word, which skews every "
    "token-denominated decision upstream: mixing weights, packing, "
    "budget admission). Both token counts are integer sums (exact, "
    "order-independent); only the final ratio is floating, rounded "
    "with the ieee floor form. Scale: one projection + one map-side-"
    "combined groupBy(source) — nothing else moves.",
    tags=("llm", "tokenize", "profiling"),
)
def d63_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.util import ieee_round

    docs = load_tables(spark, sf_dir).documents
    t = docs.select(
        "source",
        F.size(T.tokens("text")).cast("long").alias("n_words"),
        F.size(T.bpe_ish_tokens("text")).cast("long").alias("n_subwords"),
    )
    return t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_subwords").alias("total_subwords"),
        F.when(
            F.sum("n_words") == 0, F.lit(None).cast("double")
        ).otherwise(
            ieee_round(F.sum("n_subwords") / F.sum("n_words"), 4)
        ).alias("fertility"),
    )


_BLOCKLIST = ("merge", "crash", "drop")  # stand-in unsafe-term list


@register(
    "d64_blocklist_gate",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), s AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(toks, x -> x IN {_BLOCKLIST!r}))
                  AS BIGINT) AS n_blocked
      FROM t
    )
    SELECT doc_id, n_tokens, n_blocked,
           CAST(CASE WHEN n_tokens = 0 THEN 0.0
                ELSE floor(n_blocked * 1.0 / n_tokens * 10000.0 + 0.5)
                     / 10000.0 END AS DOUBLE) AS blocked_frac,
           CAST(n_tokens > 0 AND n_blocked * 50 <= n_tokens AS INTEGER)
             AS keep
    FROM s
    """,
    description="safety blocklist gate: per-doc fraction of lowercased "
    "tokens in a deny list, keep iff <= 2% (the threshold written as "
    "integer algebra — n_blocked*50 <= n_tokens — so the gate never "
    "sits on a float comparison two engines could round differently). "
    "The 3-term list stands in for a real lexicon (swap the literal "
    "for a broadcast table at production vocabulary sizes); the "
    "surviving plumbing — token normalization, membership count, "
    "ratio gate, contentless docs auto-rejected — is the real "
    "contract. Scale: pure projection, zero shuffle; a large lexicon "
    "becomes a broadcast hash lookup instead of an IN literal.",
    tags=("llm", "quality", "safety"),
)
def d64_blocklist_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.util import ieee_round

    docs = load_tables(spark, sf_dir).documents
    toks = F.filter(
        F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit("")
    )
    n = F.size(toks).cast("long")
    blocked = F.size(
        F.filter(toks, lambda x: x.isin(*_BLOCKLIST))
    ).cast("long")
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        n.alias("n_tokens"),
        blocked.alias("n_blocked"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(ieee_round(blocked / n, 4))
        .cast("double")
        .alias("blocked_frac"),
        ((n > 0) & (blocked * 50 <= n)).cast("int").alias("keep"),
    )


@register(
    "d65_cluster_size_histogram",
    oracle=f"""
    WITH RECURSIVE {{MINHASH}},
    {{COMPONENTS}},
    sizes AS (
      SELECT cluster_id, count(*) AS cluster_size FROM comp
      GROUP BY cluster_id
    ),
    hist AS (
      SELECT cluster_size, count(*) AS n_clusters FROM sizes
      GROUP BY cluster_size
    ),
    singles AS (
      SELECT 1 AS cluster_size,
             (SELECT count(*) FROM documents)
             - (SELECT count(*) FROM comp) AS n_clusters
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(n_clusters AS BIGINT) AS n_clusters,
           CAST(cluster_size * n_clusters AS BIGINT) AS n_docs
    FROM (SELECT * FROM hist UNION ALL SELECT * FROM singles)
    """.replace("{MINHASH}", MINHASH_CTES).replace(
        "{COMPONENTS}", COMPONENTS_CTES
    ),
    description="duplicate-cluster size histogram: how many near-dup "
    "clusters exist at each size, plus the singleton row (documents in "
    "no candidate pair — including contentless docs, which never "
    "enter candidacy). The shape a dedup report leads with: a corpus "
    "of many size-2 clusters dedups very differently from one with a "
    "thousand-doc boilerplate cluster (which also predicts the "
    "within-bucket expansion cost). Scale: components via the bounded "
    "min-label propagation (dedup.connected_components); the "
    "histogram is two tiny aggregates over cluster-count-sized "
    "frames; the singleton count is two scalar aggregates.",
    tags=("llm", "dedup", "profiling", "minhash"),
)
def d65_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions.dedup_reports import cluster_size_histogram

    docs = load_tables(spark, sf_dir).documents
    # graded self-contained form: components derived inline; the stored
    # form (ClusterIndex.components_df) feeds the same consumer body
    return cluster_size_histogram(docs, D.dup_components(docs))


@register(
    "d66_shared_prefix_templates",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '') AS toks
      FROM documents
      WHERE text IS NOT NULL AND regexp_matches(text, '\S')
    ), pre AS (
      SELECT doc_id, source,
             CAST(concat('0x', substr(md5(array_to_string(toks[1:5], ' ')),
                  1, 15)) AS BIGINT) AS prefix_hash
      FROM t
    )
    SELECT prefix_hash,
           count(*) AS n_docs,
           count(DISTINCT source) AS n_sources,
           min(doc_id) AS min_doc_id
    FROM pre GROUP BY prefix_hash HAVING count(*) >= 3
    """,
    description="shared-prefix template detection: documents opening "
    "with the SAME first-5-token prefix (>= 3 of them) are template "
    "instances — the position-anchored complement of d33's anywhere-"
    "boilerplate and d61's anywhere-spans; real corpora grow these "
    "from scraped page headers and generated-report preambles, and "
    "the per-prefix source spread says whether the template is one "
    "site's or ecosystem-wide. Scale: pure projection to an 8-byte "
    "prefix hash + one map-side-combined groupBy; the HAVING filter "
    "keeps the output template-count-sized.",
    tags=("llm", "dedup", "ngram", "profiling"),
)
def d66_shared_prefix_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    content = F.col("text").isNotNull() & F.col("text").rlike(r"\S")
    prefix = F.concat_ws(" ", F.slice(T.tokens("text"), 1, 5))
    return (
        docs.filter(content)
        .select(
            "doc_id",
            "source",
            D.md5_hash60(prefix).alias("prefix_hash"),
        )
        .groupBy("prefix_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") >= 3)
    )


@register(
    "d67_passage_chunks",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), base AS (
      SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 1
    ), ks AS (
      SELECT doc_id, t, n,
             unnest(range(0, 1 + CAST(CASE WHEN n <= 128 THEN 0
                    ELSE ceil((n - 128) / 96.0) END AS BIGINT))) AS k
      FROM base
    )
    SELECT doc_id,
           CAST(k AS BIGINT) AS chunk_id,
           CAST(k * 96 + 1 AS BIGINT) AS start_pos,
           CAST(len(t[k*96+1 : k*96+128]) AS BIGINT) AS chunk_tokens,
           md5(array_to_string(t[k*96+1 : k*96+128], ' ')) AS chunk_hash
    FROM ks
    """,
    description="sliding-window passage chunking: every document is "
    "split into 128-token windows at stride 96 (25% overlap, the "
    "standard RAG / long-context pretraining chunker) — complementary "
    "to d39, which packs whole docs into sequences; this SPLITS docs "
    "into retrieval passages. Emits the chunk table itself (doc, "
    "chunk ordinal, 1-based token start, actual length — the tail "
    "chunk may be short — and the md5 content hash that downstream "
    "chunk-level dedup/embedding joins key on). Scale: zero shuffles "
    "— tokenize, a per-doc sequence explode, and slice/hash "
    "projections are all scan-local; the token array never crosses a "
    "stage boundary, so the plan is pure whole-stage-codegen map "
    "work at any corpus size.",
    tags=("llm", "chunking", "tokenize"),
)
def d67_passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    W, S = 128, 96
    docs = load_tables(spark, sf_dir).documents
    base = docs.select(
        "doc_id", T.tokens("text").alias("t")
    ).withColumn("n", F.size("t")).filter(F.col("n") >= 1)
    kmax = (
        F.when(F.col("n") <= W, F.lit(0))
        .otherwise(F.ceil((F.col("n") - W) / S))
        .cast("long")
    )
    ks = base.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(0).cast("long"), kmax)).alias("k"),
    )
    sl = F.slice("t", (F.col("k") * S + 1).cast("int"), W)
    return ks.select(
        "doc_id",
        F.col("k").alias("chunk_id"),
        (F.col("k") * S + 1).alias("start_pos"),
        F.size(sl).cast("long").alias("chunk_tokens"),
        F.md5(F.concat_ws(" ", sl)).alias("chunk_hash"),
    )
