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
# DuckDB oracle. Rounds 1+2 graded 89 distinct queries (all green in
# round 2); this round the window rotates to the ~55 queries the driver
# has never graded — the q41-q84 relational tail and d44-d53/m04 — plus
# three cross-round sentinels (q01, p01, d05) and the two queries that
# gained a value oracle this round (d37 deterministic SemDeDup, m03 real
# media decode), so they get their first hash-grade. Deferred to the
# round-4 window: ten simple scalar/window queries (q06, q13, q26, q30,
# q34, q39, q40, q42, q46, q51) plus the round-3 additions registered
# after the window froze (d54-d66, m05-m07, q85); all oracle-backed
# queries run the identical DuckDB compare in pytest regardless of
# window position.
FLAGSHIP_50: tuple[str, ...] = (
    # sentinels for cross-round comparability
    "q01_pricing_summary",
    "p01_outcome_accounting",
    "d05_minhash_neardup",
    # first-ever hash grade: oracle-ized this round
    "d37_semdedup_clusters",
    "m03_media_features",
    # never-driver-graded relational tail
    "q41_sliding_window",
    "q43_distribution_ranks",
    "q47_time_bucket_window",
    "q48_null_handling_and_editdist",
    "q50_histogram_buckets",
    "q52_posexplode_lateral",
    "q53_large_volume_orders",
    "q54_nation_volume_shipping",
    "q55_inactive_rich_customers",
    "q57_filtered_aggregates",
    "q58_customer_order_distribution",
    "q59_promo_revenue",
    "q60_small_quantity_revenue",
    "q61_disjunctive_part_revenue",
    "q62_waiting_supplier",
    "q63_market_share",
    "q64_returned_item_revenue",
    "q65_top_supplier",
    "q66_stat_aggregates",
    "q67_activity_streaks",
    "q69_lateral_topk",
    "q72_retention_cohorts",
    "q73_event_transitions",
    "q74_loyal_customers_by_nation",
    "q75_boolean_aggregates",
    "q76_error_rate_anomaly",
    "q77_monthly_revenue_growth",
    "q78_revenue_pareto",
    "q79_gap_fill_locf",
    "q80_nation_profit",
    "q81_important_parts",
    "q82_part_supplier_counts",
    "q83_best_supplier_per_part",
    "q84_excess_share_shippers",
    # never-driver-graded LLM-ops tail
    "d44_temperature_sampling_weights",
    "d45_sequence_length_histogram",
    "d46_cross_source_overlap",
    "d47_dedup_survivors",
    "d48_minhash_estimator_calibration",
    "d49_semantic_decontamination",
    "d50_quality_weighted_sampling",
    "d51_packing_efficiency",
    "d52_leakage_safe_split",
    "d53_cdc_chunk_dedup",
    "m04_resize_plan",
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
