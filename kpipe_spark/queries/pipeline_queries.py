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
