"""LLM-pipeline operators, part 15: fixed-memory sketch primitives —
count-min heavy-hitters and a Bloom-filter dedup gate. The two
classic streaming/monitoring sketches re-expressed as DataFrame ops
with DETERMINISTIC md5-lane hashing, so both are oracle-checkable
bit-for-bit (unlike library sketches, whose seeds/implementations
differ across engines).

Public literature: Cormode & Muthukrishnan, "An improved data stream
summary: the count-min sketch and its applications" (J. Algorithms
2005); Bloom, "Space/time trade-offs in hash coding with allowable
errors" (CACM 1970).

Why these matter at 100 TB: both sketches are FIXED-SIZE regardless
of corpus size — the CMS table is lanes×width rows and the Bloom bit
table is ≤ m rows, so the "model" side of every join is broadcastable
forever, where the exact alternatives (a vocabulary count table, a
corpus fingerprint set) grow with the data. The CMS is the
heavy-hitter monitor a streaming ingest keeps when the vocab table
won't fit; the Bloom gate is the cheap admission pre-filter in front
of CorpusIndex's band join — most NOVEL documents are rejected by a
broadcast bitmap probe without ever touching the stored index, and
only Bloom-positive docs (true dups + the measured false-positive
fraction) pay the join.

Reference parity note: kpipe declares analytics out of scope
(/root/reference/README.md:190-208); north-star LLM surface
(SURVEY.md §2.4).

Determinism discipline: every hash lane is a substring of the md5
hex digest (identical in Spark/DuckDB/Python for identical UTF-8
bytes) cast through hex→decimal and reduced mod a power of two —
integer arithmetic end to end; counts are integer sums. There is no
floating point anywhere in either op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kpipe_spark.catalog import load_tables
from kpipe_spark.functions import text as T

# lane hashing + Bloom geometry live in functions/sketches.py (shared
# with the BloomGate stored artifact — the streaming-maintained form
# of d97); the queries here stay the self-contained oracle-graded
# derivations
from kpipe_spark.functions.sketches import (
    BLOOM_K as _BLOOM_K,
    BLOOM_M as _BLOOM_M,
    bloom_bits,
    md5_lane as _md5_lane,
    md5_lane_sql as _md5_lane_sql,
)
from kpipe_spark.queries import register

# CMS geometry: 4 independent lanes × 1024 cells = 4096 counters —
# fixed, whatever the corpus. Width trades overestimate for memory:
# E[overestimate] ≤ total_occurrences / width per lane, and the min
# over 4 lanes concentrates sharply.
_CMS_LANES = 4
_CMS_WIDTH = 1024
_CMS_TOPK = 20


@register(
    "d96_cms_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                x -> x <> '')) AS t
      FROM documents
      WHERE text IS NOT NULL AND regexp_matches(text, '\\S')
    ), cells AS (
      SELECT lane,
             CASE lane
               {" ".join(f"WHEN {i} THEN {_md5_lane_sql('t', i, _CMS_WIDTH)}" for i in range(_CMS_LANES))}
             END AS cell
      FROM tok CROSS JOIN range({_CMS_LANES}) AS l(lane)
    ), cms AS (
      SELECT lane, cell, CAST(count(*) AS BIGINT) AS c
      FROM cells GROUP BY lane, cell
    ), exact AS (
      SELECT t, CAST(count(*) AS BIGINT) AS exact_count
      FROM tok GROUP BY t ORDER BY exact_count DESC, t LIMIT {_CMS_TOPK}
    ), probes AS (
      SELECT exact.t, exact.exact_count, l.lane,
             CASE l.lane
               {" ".join(f"WHEN {i} THEN {_md5_lane_sql('exact.t', i, _CMS_WIDTH)}" for i in range(_CMS_LANES))}
             END AS cell
      FROM exact CROSS JOIN range({_CMS_LANES}) AS l(lane)
    )
    SELECT p.t AS token, any_value(p.exact_count) AS exact_count,
           CAST(min(cms.c) AS BIGINT) AS cms_estimate,
           CAST(min(cms.c) - any_value(p.exact_count) AS BIGINT)
             AS overestimate
    FROM probes p JOIN cms USING (lane, cell)
    GROUP BY p.t
    """,
    description="count-min-sketch heavy hitters (Cormode & "
    "Muthukrishnan 2005): every token occurrence increments one cell "
    "per lane (4 md5-derived lanes × 1024 cells — 4096 counters, "
    "FIXED whatever the corpus size), a token's estimate is the min "
    "over its lanes' cells, reported here against the exact top-20 "
    "with the per-token overestimate (≥0 by the CMS guarantee, "
    "pinned in tests). The monitoring primitive for when the exact "
    "vocab table won't fit: at 100 TB the sketch is still 4096 rows "
    "— broadcastable forever — and updates via one map-side-combined "
    "aggregate per micro-batch. Deterministic md5 lanes make it the "
    "rare sketch an oracle can hash-verify. Scale: one corpus token "
    "explode into a 4096-key aggregate (the ONLY corpus-sized "
    "exchange, and far smaller-keyed than a vocab count); the top-20 "
    "exact side compiles to TakeOrderedAndProject.",
    tags=("llm", "monitoring", "sketch"),
)
def d96_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    content = F.col("text").isNotNull() & F.col("text").rlike(r"\S")
    tok = docs.filter(content).select(
        F.explode(T.tokens("text")).alias("t")
    )
    lanes = F.array(
        *[
            F.struct(
                F.lit(i).alias("lane"),
                _md5_lane(F.col("t"), i, _CMS_WIDTH).alias("cell"),
            )
            for i in range(_CMS_LANES)
        ]
    )
    cms = (
        tok.select(F.explode(lanes).alias("lc"))
        .select("lc.lane", "lc.cell")
        .groupBy("lane", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), "t")
        .limit(_CMS_TOPK)
    )
    probes = exact.select(
        "t", "exact_count", F.explode(lanes).alias("lc")
    ).select("t", "exact_count", "lc.lane", "lc.cell")
    # cms is 4096 rows by construction — the broadcastable sketch is
    # the entire point of the op
    return (
        probes.join(F.broadcast(cms), ["lane", "cell"])
        .groupBy("t")
        .agg(
            F.any_value("exact_count").alias("exact_count"),
            F.min("c").alias("cms_estimate"),
            (F.min("c") - F.any_value("exact_count")).alias(
                "overestimate"
            ),
        )
        .select(
            F.col("t").alias("token"),
            "exact_count",
            "cms_estimate",
            "overestimate",
        )
    )


_BLOOM_FP_SQL = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"


@register(
    "d97_bloom_dedup_gate",
    oracle=f"""
    WITH corpus AS (
      SELECT DISTINCT {_BLOOM_FP_SQL} AS fp FROM documents
      WHERE text IS NOT NULL AND doc_id % 4 <> 0
    ), batch AS (
      SELECT doc_id, {_BLOOM_FP_SQL} AS fp FROM documents
      WHERE text IS NOT NULL AND doc_id % 4 = 0
    ), bits AS (
      SELECT DISTINCT
             CASE l.lane
               {" ".join(f"WHEN {i} THEN {_md5_lane_sql('fp', i, _BLOOM_M)}" for i in range(_BLOOM_K))}
             END AS bit
      FROM corpus CROSS JOIN range({_BLOOM_K}) AS l(lane)
    ), probe AS (
      SELECT b.doc_id, b.fp,
             CASE l.lane
               {" ".join(f"WHEN {i} THEN {_md5_lane_sql('fp', i, _BLOOM_M)}" for i in range(_BLOOM_K))}
             END AS bit
      FROM batch b CROSS JOIN range({_BLOOM_K}) AS l(lane)
    ), gated AS (
      SELECT p.doc_id, any_value(p.fp) AS fp,
             CAST(sum(CASE WHEN bits.bit IS NULL THEN 0 ELSE 1 END)
                  = {_BLOOM_K} AS INTEGER) AS bloom_positive
      FROM probe p LEFT JOIN bits ON p.bit = bits.bit
      GROUP BY p.doc_id
    )
    SELECT g.doc_id,
           g.bloom_positive,
           CAST(corpus.fp IS NOT NULL AS INTEGER) AS exact_dup,
           CAST(g.bloom_positive = 1 AND corpus.fp IS NULL AS INTEGER)
             AS false_positive
    FROM gated g LEFT JOIN corpus ON g.fp = corpus.fp
    """,
    description="Bloom-filter admission gate (Bloom 1970): the corpus' "
    "exact-dedup fingerprints set k=3 md5-derived bits in an m=2^14 "
    "bitmap (a ≤16384-row bit table, FIXED whatever the corpus — "
    "broadcastable forever), and an arriving batch probes it: a doc "
    "is Bloom-positive iff all 3 of its bits are set. Per batch doc "
    "the op reports the gate verdict, the exact-dup ground truth, and "
    "the false-positive flag — the measured FP rate (~0.12 at sf0.1's "
    "~50% fill) IS the gate's sizing audit. The 100 TB admission "
    "shape this buys: most NOVEL documents are rejected by the "
    "broadcast bitmap probe and never pay CorpusIndex's band join; "
    "only true dups + the FP fraction proceed. No false negatives by "
    "construction (pinned in tests). Scale: the fingerprint hash is "
    "hashed ONCE per md5 (bits derive from the fp string's own md5 "
    "lanes); the bit table and the probe set are the only joined "
    "frames, both bounded; integer/md5 arithmetic end to end.",
    tags=("llm", "dedup", "sketch"),
)
def d97_bloom_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    has_text = F.col("text").isNotNull()
    corpus = (
        docs.filter(has_text & (F.col("doc_id") % 4 != 0))
        .select(T.fingerprint("text").alias("fp"))
        .distinct()
    )
    batch = docs.filter(has_text & (F.col("doc_id") % 4 == 0)).select(
        "doc_id", T.fingerprint("text").alias("fp")
    )

    bits = (
        corpus.select(F.explode(bloom_bits(F.col("fp"))).alias("bit"))
        .distinct()
        .withColumn("_set", F.lit(1))
    )
    probe = batch.select(
        "doc_id", "fp", F.explode(bloom_bits(F.col("fp"))).alias("bit")
    )
    gated = (
        probe.join(F.broadcast(bits), "bit", "left")
        .groupBy("doc_id")
        .agg(
            F.any_value("fp").alias("fp"),
            (F.sum(F.coalesce("_set", F.lit(0))) == _BLOOM_K)
            .cast("int")
            .alias("bloom_positive"),
        )
    )
    return (
        gated.join(
            corpus.withColumn("_dup", F.lit(1)), "fp", "left"
        )
        .select(
            "doc_id",
            "bloom_positive",
            F.coalesce("_dup", F.lit(0)).cast("int").alias("exact_dup"),
            (
                (F.col("bloom_positive") == 1)
                & F.col("_dup").isNull()
            )
            .cast("int")
            .alias("false_positive"),
        )
    )
