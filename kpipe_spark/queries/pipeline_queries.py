"""Oracle-checked queries that run THROUGH the kpipe pipeline engine.

These exercise the outcome semantics (Result.java:31-103) end-to-end on
the events table and verify them against plain SQL: the pipeline's
status column must partition rows exactly as the equivalent CASE
expression — kpipe's rule that operators evaluate left-to-right with
first-transition-wins short-circuiting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kpipe_spark.catalog import load_tables
from kpipe_spark.pipeline import Pipeline, STATUS_COL
from kpipe_spark.queries import register


def _events_pipeline() -> Pipeline:
    """The canonical demo pipeline (README.md:61-72 shape): parse the
    schema-less JSON payload, fail poison records, require a field,
    filter on a business rule, enrich."""
    return (
        Pipeline()
        .pipe("k_val", F.get_json_object("props", "$.k").cast("int"))
        # simulated poison records: kpipe's deserialize-failure path
        .fail_when(F.col("event_type") == "error", "DeserializationException")
        .require_field("k_val")
        .filter(F.col("value") > 50.0)
        .add_field("pipeline_version", "v1")
    )


@register(
    "p01_outcome_accounting",
    oracle="""
    SELECT status, count(*) AS n
    FROM (
      SELECT CASE
        WHEN event_type = 'error' THEN 'failed'
        WHEN json_extract_string(props, '$.k') IS NULL THEN 'filtered'
        WHEN value <= 50.0 THEN 'filtered'
        ELSE 'passed'
      END AS status
      FROM events
    )
    GROUP BY status
    """,
    description="pipeline outcome accounting: passed/filtered/failed "
    "counts match the left-to-right short-circuit contract "
    "(TypedPipelineBuilder.java:150-162)",
    tags=("pipeline", "outcome"),
)
def p01_outcome_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    applied = _events_pipeline().apply(e)
    return (
        applied.groupBy(F.col(STATUS_COL).alias("status"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "p02_passed_enriched",
    oracle="""
    SELECT event_id, user_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           'v1' AS pipeline_version
    FROM events
    WHERE event_type <> 'error'
      AND json_extract_string(props, '$.k') IS NOT NULL
      AND value > 50.0
    """,
    description="the Passed branch of the same pipeline: survivors with "
    "the added field (addField, Operators.java:217-223)",
    tags=("pipeline", "transform"),
)
def p02_passed_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    passed, _, _ = _events_pipeline().split(e)
    return passed.select("event_id", "user_id", "k_val", "pipeline_version")


@register(
    "p03_field_surgery",
    oracle="""
    SELECT event_id AS eid, event_type,
           round(value * 1.1, 4) AS value_adj,
           'enriched' AS stage
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    """,
    description="rename + removeFields + addField + when-branch "
    "(Operators.java:147-223) compiled into one projection",
    tags=("pipeline", "transform"),
)
def p03_field_surgery(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    pipe = (
        Pipeline()
        .filter(F.col("event_type").isin("purchase", "signup"))
        .pipe("value_adj", F.round(F.col("value") * 1.1, 4))
        .rename("event_id", "eid")
        .remove_fields("props", "ts", "user_id", "value")
        .add_field("stage", "enriched")
    )
    passed, _, _ = pipe.split(e)
    return passed.select("eid", "event_type", "value_adj", "stage")


# stopword list shared with the Gopher gate ops (llm_ops5._STOPWORDS)
_SW = ("the", "a", "of", "and", "to", "in", "is")


def _p04_oracle() -> str:
    from kpipe_spark.queries._oracle_fragments import minhash_ctes

    # The arriving batch passes the d79 NFC front door BEFORE gating
    # and signing (production curation normalizes first — SURVEY §2.4
    # text-analysis row); the already-curated corpus side stays as
    # indexed. src_docs is the post-front-door view both the band
    # CTEs and the gate read.
    return f"""
    WITH src_docs AS (
      SELECT doc_id, lang, source,
             CASE WHEN doc_id % 4 = 0
                  THEN nfc_normalize(trim(regexp_replace(text,
                       '[ \\t\\n\\r\\f\\v]+', ' ', 'g')))
                  ELSE text END AS text
      FROM documents
    ),
    {minhash_ctes(table="src_docs")},
    flags AS (
      SELECT doc_id,
             (doc_id % 4 = 0) AS is_new,
             (lang = 'en'
              AND len(string_split(text, ' ')) >= 30
              AND ((len(text) - (len(string_split(text, ' ')) - 1)) * 1.0
                   / len(string_split(text, ' '))) BETWEEN 3 AND 6
              AND (len(list_filter(string_split(text, ' '),
                       x -> x IN {_SW!r})) * 1.0
                   / len(string_split(text, ' '))) >= 0.01
              AND (len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' '))) >= 0.35) AS gate,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x <> '')) AS n_tokens
      FROM src_docs
    ),
    hits AS (
      SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_other
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                  AND a.doc_id <> b.doc_id
      JOIN flags fa ON fa.doc_id = a.doc_id
      JOIN flags fb ON fb.doc_id = b.doc_id
      WHERE fa.is_new AND fa.gate AND (NOT fb.is_new OR fb.gate)
    ),
    rej AS (
      SELECT id_new,
             bool_or(id_other % 4 <> 0 OR id_other < id_new) AS is_dup
      FROM hits GROUP BY id_new
    ),
    outc AS (
      SELECT f.doc_id, f.n_tokens,
             CASE WHEN f.gate IS NOT TRUE THEN 'gate_filtered'
                  WHEN coalesce(r.is_dup, false) THEN 'dup_rejected'
                  WHEN CAST(concat('0x', substr(md5(CAST(f.doc_id AS VARCHAR)),
                       1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
                  WHEN CAST(concat('0x', substr(md5(CAST(f.doc_id AS VARCHAR)),
                       1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
                  ELSE 'test' END AS outcome
      FROM flags f LEFT JOIN rej r ON r.id_new = f.doc_id
      WHERE f.is_new
    )
    SELECT outcome, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM outc GROUP BY outcome
    """


@register(
    "p04_curation_composition",
    oracle=_p04_oracle(),
    description="the flagship curation loop as ONE batch composition: "
    "an arriving batch (doc_id % 4 == 0) is serialized to JSON lines, "
    "decoded back through the real ingestion front door (decode_json "
    "under the outcome contract — a decode failure would surface as a "
    "'decode_failed' outcome row and hash-mismatch), NFC-normalized "
    "(d79's whitespace+NFC canonicalizer, so encoding accidents can't "
    "dodge the near-dup check — the corpus side stays as indexed), "
    "Gopher-gated via "
    "Pipeline.filter, near-dup-checked against the already-indexed "
    "corpus band table (d54's incremental shape: batch-sized signature "
    "work, no corpus re-scan) with keep-one inside the batch, and the "
    "admitted docs split train/val/test by d52's md5 hash — emitted as "
    "a per-outcome doc/token ledger in which every batch doc appears "
    "exactly once. Scale: the corpus side is its STORED band artifact "
    "(bucketed on (band, bucket)); everything else is batch-sized; "
    "gate and encode/decode are scan-local projections.",
    tags=("pipeline", "llm", "dedup", "composition"),
)
def p04_curation_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.functions import dedup as D
    from kpipe_spark.functions import text as T
    from kpipe_spark.pipeline.formats import decode_json

    docs = load_tables(spark, sf_dir).documents
    is_new = F.col("doc_id") % 4 == 0

    # 1. ingestion front door: encode the batch to JSONL, decode it back
    lines = docs.filter(is_new).select(
        F.to_json(F.struct("doc_id", "text", "lang", "source")).alias("value")
    )
    dec = decode_json(
        lines, "doc_id bigint, text string, lang string, source string"
    )
    from kpipe_spark.queries.llm_ops11 import _nfc_normalize_udf

    # 1b. d79 NFC front door: whitespace-canonicalize + NFC-compose
    # the arriving text BEFORE gating and signing — production
    # curation normalizes first, so encoding accidents can't dodge
    # the near-dup check or skew the gate's token arithmetic. The
    # already-curated corpus side stays as indexed.
    nfc = _nfc_normalize_udf()
    # token array projected ONCE per row — the gate referenced the
    # split(' ') HOF 5× over the NFC'd text
    flat = (
        dec.select("payload_error", F.col("payload.*"))
        .withColumn("text", nfc(F.col("text")))
        .withColumn("_ts", F.split("text", " "))
    )

    # 2. Gopher gate through the Pipeline outcome contract
    n = F.size("_ts")
    mwl = (F.length("text") - (n - 1)) / n
    swf = F.size(F.filter(F.col("_ts"), lambda x: x.isin(*_SW))) / n
    dr = F.size(F.array_distinct("_ts")) / n
    gate = (
        (F.col("lang") == "en")
        & (n >= 30)
        & mwl.between(3, 6)
        & (swf >= 0.01)
        & (dr >= 0.35)
    )
    pipe = (
        Pipeline()
        .fail_when(
            F.col("payload_error").isNotNull() | F.col("doc_id").isNull(),
            "DeserializationException",
        )
        .filter(gate)
    )
    from kpipe_spark.util import materialize

    # materialized once: `applied` feeds BOTH the admission branch
    # (surv → batch signatures → partners) and the final per-outcome
    # ledger — without this the JSON decode + NFC pandas UDF runs
    # twice (two ArrowEvalPython subtrees in the plan). Batch-scaled,
    # so the injectable strategy applies (util.set_materializer).
    applied = materialize(pipe.apply(flat).drop("_ts"), scale="corpus")

    # 3. incremental admission against the stored corpus band index
    surv = applied.filter(F.col(STATUS_COL) == "passed").select(
        "doc_id", "text"
    )
    corpus_bands = D.minhash_bands_df(
        D.minhash_signature_df(docs.filter(~is_new))
    )
    partners = D.incremental_minhash_partners(surv, corpus_bands)
    rej = partners.groupBy("id_new").agg(
        F.max(
            (F.col("id_other") % 4 != 0)
            | (F.col("id_other") < F.col("id_new"))
        ).alias("is_dup")
    )

    # 4. leakage-safe split of the admitted docs, per-outcome ledger
    h = D.md5_hash60(F.col("doc_id").cast("string")) % 100
    outcome = (
        F.when(F.col(STATUS_COL) == "failed", F.lit("decode_failed"))
        .when(F.col(STATUS_COL) == "filtered", F.lit("gate_filtered"))
        .when(F.coalesce(F.col("is_dup"), F.lit(False)), F.lit("dup_rejected"))
        .when(h < 80, F.lit("train"))
        .when(h < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        applied.join(rej, applied["doc_id"] == rej["id_new"], "left")
        .select(
            outcome.alias("outcome"),
            T.token_count("text").cast("long").alias("n_tokens"),
        )
        .groupBy("outcome")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
