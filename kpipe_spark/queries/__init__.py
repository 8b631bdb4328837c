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
# DuckDB oracle. Every oracle-backed query's latest driver grade is a
# hash pass (CORRECTNESS_r07: 50/50, second consecutive all-hash
# window); the window is pure stalest-first evidence rotation plus
# first-time grades for new ops. Round 8: FIRST-TIME grades for
# d96/d97 (registered late in round 7, after that window's 50 slots
# were committed), then the round-4-era stalest grades: d01/d08/d13/
# d17, d54-d79, m01/m05-m07, p04, q06/q13/q26/q30/q34/q39/q40/q42/
# q46/q51/q85. That list is 46 entries; with the three cross-round
# sentinels (q01, p01, d05) and d96/d97 the window would hold 51, so
# d63_tokenizer_fertility is deferred to round 9 — its learned-vocab
# twin d91 (same fertility metric keyed to the trained tokenizer) was
# hash-graded in round 7, making it the best-covered deferral. All
# oracle-backed queries run the identical DuckDB compare in pytest
# regardless of window position. (Round-9 rotation note: FIRST-TIME
# grades for d98/d99 — registered after this window was committed —
# then d63, then the round-7-era grades become the stalest block.)
FLAGSHIP_50: tuple[str, ...] = (
    # sentinels for cross-round comparability
    "q01_pricing_summary",
    "p01_outcome_accounting",
    "d05_minhash_neardup",
    # first-time driver grades (registered after the r7 window filled)
    "d96_cms_heavy_hitters",
    "d97_bloom_dedup_gate",
    # round-4-era re-grades: LLM-ops core
    "d01_dedup_exact",
    "d08_similarity_topk",
    "d13_ivf_topk",
    "d17_unigram_logprob",
    "d54_incremental_dedup",
    "d55_dedup_adjusted_mixture",
    "d56_contamination_spans",
    "d57_token_budget_selection",
    "d58_shard_plan",
    "d59_priority_source_dedup",
    "d60_curation_funnel",
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
    # round-4-era re-grades: multimodal + pipeline
    "m01_media_metadata",
    "m05_audio_frame_energy",
    "m06_image_patch_stats",
    "m07_multimodal_packing",
    "p04_curation_composition",
    # round-4-era re-grades: relational block
    "q06_revenue_forecast",
    "q13_window_rank",
    "q26_having_filter",
    "q30_events_top_users",
    "q34_explode_token_freq",
    "q39_first_last_per_group",
    "q40_regexp_extract",
    "q42_distinct_projection",
    "q46_union_by_name",
    "q51_date_arithmetic",
    "q85_mode_per_group",
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
