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
# DuckDB oracle. After round 6 every oracle-backed query's latest
# driver grade is a hash pass (CORRECTNESS_r06: 50/50); the window is
# pure stalest-first evidence rotation plus first-time grades for new
# ops. Round 7: ALL 41 remaining round-3-era grades (the q41-q84
# relational block, d49-d53 curation ops, m03/m04 multimodal), then
# the stalest round-4-era entries in the leftover slots. The three
# cross-round sentinels (q01, p01, d05) stay for comparability. All
# oracle-backed queries run the identical DuckDB compare in pytest
# regardless of window position. (Round-8 rotation note: FIRST-TIME
# grades for d96/d97 — registered late in round 7, after the window
# had spent its 50 slots meeting the no-grade-older-than-r4 bar —
# then continue stalest-first with the round-4-era grades:
# d01/d08/d13/d17, d54-d79, m01/m05-m07, p04,
# q06/q13/q26/q30/q34/q39/q40/q42/q46/q51/q85.)
FLAGSHIP_50: tuple[str, ...] = (
    # sentinels for cross-round comparability
    "q01_pricing_summary",
    "p01_outcome_accounting",
    "d05_minhash_neardup",
    # round-3-era re-grades: LLM-ops + multimodal first
    "d49_semantic_decontamination",
    "d50_quality_weighted_sampling",
    "d51_packing_efficiency",
    "d52_leakage_safe_split",
    "d53_cdc_chunk_dedup",
    "m03_media_features",
    "m04_resize_plan",
    # round-3-era re-grades: the q41-q84 relational block (all 34)
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
    # round-7 NEW ops: first-time driver grades outrank re-grades
    "d90_unigram_train",
    "d91_unigram_fertility",
    "d92_unigram_piece_coverage",
    "d93_adaptive_nprobe_topk",
    "d94_adaptive_nprobe_recall",
    "d95_kneser_ney_logprob",
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
        llm_ops14,
        llm_ops15,
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
