"""Central query registry.

Every operator the engine claims in SURVEY.md §2 registers here as a
``Query``: a Spark builder (spark, sf_dir) -> DataFrame plus, when the
semantics are SQL-expressible, the equivalent DuckDB oracle SQL. The
driver contract (``__spark_entry__``) and the pytest oracle suite both
iterate this registry, so there is exactly one source of truth.

Column-name discipline: every computed column is aliased identically in
the Spark builder and the oracle SQL (the driver hashes values under
sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name, fn, oracle, description, tags)
        return fn

    return deco


# The external driver grades the FIRST 50 registry entries against the
# DuckDB oracle. After round 5 every oracle-backed query's latest
# driver grade is a hash pass; the window is pure stalest-first
# evidence rotation plus first-time grades for new ops. Round 6:
# the four NEW PQ-ANN ops (d86-d89) lead, then ALL 37 remaining
# round-2-era grades (the full relational spread the r4/r5 windows
# displaced: joins, set ops, rollup/cube/grouping-sets, windows,
# subqueries, sessionization, range/as-of), then the 6 stalest
# round-3-era LLM-ops re-grades. The three cross-round sentinels
# (q01, p01, d05) stay for comparability. All oracle-backed queries
# run the identical DuckDB compare in pytest regardless of window
# position. (Round-7 rotation note: continue stalest-first — the
# remaining round-3-era grades: d51/d52/d53, m03/m04, and the
# q41-q84 relational block, then round-4-era.)
FLAGSHIP_50: tuple[str, ...] = (
    # sentinels for cross-round comparability
    "q01_pricing_summary",
    "p01_outcome_accounting",
    "d05_minhash_neardup",
    # round-6 NEW ops: first-time driver grades outrank re-grades
    "d86_pq_adc_topk",
    "d87_pq_recall",
    "d88_ivfpq_topk",
    "d89_pq_codebook_health",
    # round-2-era re-grades (stalest driver evidence, all 37)
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_local_supplier_volume",
    "q07_join_left_outer",
    "q08_join_anti",
    "q09_join_semi",
    "q10_join_full_outer",
    "q12_window_running_total",
    "q14_rollup",
    "q15_cube",
    "q16_union",
    "q17_intersect",
    "q18_except",
    "q19_distinct_agg",
    "q20_scalar_string_math",
    "q21_date_functions",
    "q22_events_hourly",
    "q23_json_extract",
    "q24_topk_orders",
    "q25_grouping_sets",
    "q27_conditional_agg_pivot",
    "q28_range_join",
    "q29_string_agg",
    "q31_correlated_scalar_subquery",
    "q32_in_subquery",
    "q33_percentiles",
    "q35_pivot",
    "q36_unpivot",
    "q37_sessionization",
    "q38_asof_join",
    "q44_range_frame_moving_sum",
    "q45_array_map_functions",
    "q49_exists_subquery",
    "q56_exact_median",
    "q68_argmax_aggregates",
    "q70_lateness_priority_counts",
    "q71_event_funnel",
    # round-3-era re-grades: LLM-ops families first
    "d37_semdedup_clusters",
    "d44_temperature_sampling_weights",
    "d45_sequence_length_histogram",
    "d46_cross_source_overlap",
    "d47_dedup_survivors",
    "d48_minhash_estimator_calibration",
)


def all_queries() -> dict[str, Query]:
    # import side effect populates QUERIES
    from kpipe_spark.queries import (  # noqa: F401
        llm_ops,
        llm_ops2,
        llm_ops3,
        llm_ops4,
        llm_ops5,
        llm_ops6,
        llm_ops7,
        llm_ops8,
        llm_ops9,
        llm_ops10,
        llm_ops11,
        llm_ops12,
        llm_ops13,
        pipeline_queries,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        relational7,
    )

    missing = [n for n in FLAGSHIP_50 if n not in QUERIES]
    if missing:
        raise KeyError(f"FLAGSHIP_50 references unknown queries: {missing}")
    ordered = {n: QUERIES[n] for n in FLAGSHIP_50}
    ordered.update((n, q) for n, q in QUERIES.items() if n not in ordered)
    return ordered
