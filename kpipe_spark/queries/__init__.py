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
# DuckDB oracle. This window is NO LONGER hand-reasoned: it is the
# output of `python -m kpipe_spark.queries.rotation`, which computes
# stalest-first evidence rotation (sentinels -> first-time grades ->
# ascending latest-grade round, registry-order ties) over the committed
# CORRECTNESS_r0*.json artifacts — see rotation.py's docstring for the
# rule (the rows-only exclusion is dormant since round 11: every
# registry entry is oracle-backed now). tests/test_rotation_window.py
# asserts this literal
# equals the computation, so a drifted list fails CI instead of
# silently aging a grade (that drift happened once: round 8's
# hand-typed list dropped d24_dup_clusters from its own count).
# Round 14 = the r9/r10-era stalest block in registry order (the four
# r9 grades d99/p02/p03/q02, the d37/d44-d48 dedup-calibration rows,
# the d86-d89 PQ serving family, and the q03-q45 relational mid-range;
# the r11/r12-graded wave-7/9 rewrites q53/q62/q65/q72/q76/q79/q81/
# q83/q84 queue for the NEXT windows — 51 staler candidates exist for
# 47 slots this round). All oracle-backed queries run the identical
# DuckDB compare in pytest regardless of window position.
FLAGSHIP_50: tuple[str, ...] = (
    "q01_pricing_summary",
    "p01_outcome_accounting",
    "d05_minhash_neardup",
    "d99_weighted_reservoir_sample",
    "p02_passed_enriched",
    "p03_field_surgery",
    "q02_revenue_by_nation",
    "d37_semdedup_clusters",
    "d44_temperature_sampling_weights",
    "d45_sequence_length_histogram",
    "d46_cross_source_overlap",
    "d47_dedup_survivors",
    "d48_minhash_estimator_calibration",
    "d86_pq_adc_topk",
    "d87_pq_recall",
    "d88_ivfpq_topk",
    "d89_pq_codebook_health",
    "q19_distinct_agg",
    "q27_conditional_agg_pivot",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_local_supplier_volume",
    "q07_join_left_outer",
    "q08_join_anti",
    "q09_join_semi",
    "q10_join_full_outer",
    "q28_range_join",
    "q11_window_topk_per_customer",
    "q12_window_running_total",
    "q14_rollup",
    "q15_cube",
    "q25_grouping_sets",
    "q16_union",
    "q17_intersect",
    "q18_except",
    "q24_topk_orders",
    "q20_scalar_string_math",
    "q21_date_functions",
    "q23_json_extract",
    "q29_string_agg",
    "q22_events_hourly",
    "q31_correlated_scalar_subquery",
    "q32_in_subquery",
    "q33_percentiles",
    "q35_pivot",
    "q36_unpivot",
    "q37_sessionization",
    "q38_asof_join",
    "q44_range_frame_moving_sum",
    "q45_array_map_functions",
)


# THE canonical module sequence: all_queries() imports exactly these
# (importlib over this tuple), and canonical_order() keys on the same
# constant, so the rotation computation cannot be permuted by import
# timing (a test importing a query module directly, e.g.
# tests/test_llm_ops13.py, registers that module's queries FIRST and
# reorders the raw QUERIES dict for the whole process) and a new
# module cannot be imported without also being ordered.
QUERY_MODULES: tuple[str, ...] = (
    "llm_ops",
    "llm_ops2",
    "llm_ops3",
    "llm_ops4",
    "llm_ops5",
    "llm_ops6",
    "llm_ops7",
    "llm_ops8",
    "llm_ops9",
    "llm_ops10",
    "llm_ops11",
    "llm_ops12",
    "llm_ops13",
    "llm_ops14",
    "llm_ops15",
    "pipeline_queries",
    "relational",
    "relational2",
    "relational3",
    "relational4",
    "relational5",
    "relational6",
    "relational7",
)


def canonical_order() -> list[str]:
    """Registry names in import-timing-INDEPENDENT order: canonical
    module sequence (``QUERY_MODULES``), within-module registration
    order. ``list(QUERIES)`` is NOT this when any query module was
    imported directly before ``all_queries()`` ran — the rotation
    window must be a pure function of committed state, so it keys on
    this order."""
    all_queries()
    mod_pos = {
        f"kpipe_spark.queries.{m}": i for i, m in enumerate(QUERY_MODULES)
    }
    ins_pos = {n: i for i, n in enumerate(QUERIES)}
    return sorted(
        QUERIES,
        key=lambda n: (mod_pos[QUERIES[n].build.__module__], ins_pos[n]),
    )


def all_queries() -> dict[str, Query]:
    # import side effect populates QUERIES; QUERY_MODULES is the ONE
    # list (canonical_order keys on the same constant, so the import
    # set and the canonical order cannot drift apart)
    import importlib

    for mod in QUERY_MODULES:
        importlib.import_module(f"kpipe_spark.queries.{mod}")

    missing = [n for n in FLAGSHIP_50 if n not in QUERIES]
    if missing:
        raise KeyError(f"FLAGSHIP_50 references unknown queries: {missing}")
    ordered = {n: QUERIES[n] for n in FLAGSHIP_50}
    ordered.update((n, q) for n, q in QUERIES.items() if n not in ordered)
    return ordered
