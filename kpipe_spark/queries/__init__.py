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
# rule, including why rows-only queries (d23/d27/d28) don't occupy
# hash-pass slots. tests/test_rotation_window.py asserts this literal
# equals the computation, so a drifted list fails CI instead of
# silently aging a grade (that drift happened once: round 8's
# hand-typed list dropped d24_dup_clusters from its own count).
# Round 9 = FIRST-TIME d98/d99, both round-4-era grades (d24, d63),
# then the round-5-era block; q11_window_topk_per_customer is the one
# deferral (registry-order tail) and sorts first automatically in r10.
# All oracle-backed queries run the identical DuckDB compare in pytest
# regardless of window position.
FLAGSHIP_50: tuple[str, ...] = (
    # sentinels for cross-round comparability
    "q01_pricing_summary",
    "p01_outcome_accounting",
    "d05_minhash_neardup",
    # first-time driver grades (registered after the r8 window filled)
    "d98_hll_distinct_tokens",
    "d99_weighted_reservoir_sample",
    # round-4-era re-grades (the two the r8 window couldn't fit)
    "d24_dup_clusters",
    "d63_tokenizer_fertility",
    # round-5-era re-grades, registry order
    "d02_token_stats",
    "d03_quality_score",
    "d04_lang_id",
    "d06_simhash",
    "d07_ngram_jaccard_pairs",
    "d09_lsh_similarity_topk",
    "d10_embedding_norms",
    "d11_embedding_neardup",
    "d12_doc_fingerprint",
    "m02_frame_sample",
    "d14_doc_embedding_quality",
    "d15_simhash_neardup",
    "d16_pii_scrub",
    "d18_bpe_token_stats",
    "d19_stratified_sample",
    "d20_dataset_split",
    "d21_embedding_quantize",
    "d22_repetition_score",
    "d25_vocab_build",
    "d26_tfidf_keywords",
    "d29_column_profile",
    "d30_k_anonymity",
    "d31_contamination_check",
    "d32_source_mixing_weights",
    "d33_boilerplate_ngrams",
    "d34_gopher_quality_rules",
    "d35_source_document_cap",
    "d36_lm_quality_buckets",
    "d38_key_skew_profile",
    "d39_sequence_packing",
    "d40_corpus_card",
    "d41_word_entropy",
    "d42_lexical_diversity",
    "d43_srp_near_dup",
    "d80_block_dedup_retention",
    "d81_intradoc_dup_grams",
    "d82_doc_stitching",
    "d83_truncation_loss_curve",
    "d84_ivf_cell_purity",
    "d85_data_constrained_epochs",
    "p02_passed_enriched",
    "p03_field_surgery",
    "q02_revenue_by_nation",
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
