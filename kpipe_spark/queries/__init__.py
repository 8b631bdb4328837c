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
# Round 12 = the q81-q84 deferred block (round-7 grades, deferred out
# of round 11 by the self-correcting rule), then the round-8-era block
# stalest-first in registry order (d01/d08/d13/d17 families, m01/m05-m07,
# the d54-d79 curation/eval families, d96/d97 sketch gates, p04, and the
# q06-q40 relational tail). All oracle-backed queries run the identical
# DuckDB compare in pytest regardless of window position.
FLAGSHIP_50: tuple[str, ...] = (
    "q01_pricing_summary",
    "p01_outcome_accounting",
    "d05_minhash_neardup",
    "q81_important_parts",
    "q82_part_supplier_counts",
    "q83_best_supplier_per_part",
    "q84_excess_share_shippers",
    "d01_dedup_exact",
    "d08_similarity_topk",
    "d13_ivf_topk",
    "m01_media_metadata",
    "d17_unigram_logprob",
    "d54_incremental_dedup",
    "d55_dedup_adjusted_mixture",
    "m06_image_patch_stats",
    "m05_audio_frame_energy",
    "d56_contamination_spans",
    "d57_token_budget_selection",
    "d58_shard_plan",
    "d59_priority_source_dedup",
    "d60_curation_funnel",
    "m07_multimodal_packing",
    "d61_dup_substring_spans",
    "d62_ivf_cell_profile",
    "d64_blocklist_gate",
    "d65_cluster_size_histogram",
    "d66_shared_prefix_templates",
    "d67_passage_chunks",
    "d68_dsir_importance",
    "d69_bigram_interp_logprob",
    "d70_ann_recall_eval",
    "d71_ngram_novelty",
    "d72_source_kl_drift",
    "d73_zipf_fit",
    "d74_embedding_drift",
    "d75_vocab_coverage",
    "d76_oov_rate",
    "d77_snapshot_diff",
    "d78_source_dup_rate",
    "d79_text_normalization",
    "d96_cms_heavy_hitters",
    "d97_bloom_dedup_gate",
    "p04_curation_composition",
    "q06_revenue_forecast",
    "q26_having_filter",
    "q13_window_rank",
    "q30_events_top_users",
    "q34_explode_token_freq",
    "q39_first_last_per_group",
    "q40_regexp_extract",
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
