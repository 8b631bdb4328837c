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
# DuckDB oracle. After round 4 all 175 registry queries have been
# driver-graded at least once and every query graded since its oracle
# existed is green; the round-5 window is pure evidence refresh,
# stalest first. Leading: d06/d07/d09/d15, whose ONLY driver grade
# (round 1) predates their oracles (err=no_oracle) — after this round
# every oracle-backed query's LATEST driver grade is a hash pass.
# Then: every remaining round-1-era grade (the 23 hash re-grades the
# round-4 window displaced, plus m02), the three rows-only-by-nature
# queries (d23/d27/d28 — MLlib randomness / iterative training; the
# driver refreshes their rows-only evidence), and 17 round-2-era
# re-grades (LLM-ops families first, then a relational spread:
# joins/windows/rollup/range/as-of/sessionization). The three
# cross-round sentinels (q01, p01, d05) stay for comparability. All
# oracle-backed queries run the identical DuckDB compare in pytest
# regardless of window position. (Round-6 rotation note: continue
# stalest-first — the 38 remaining round-2-era grades, then round-3.)
FLAGSHIP_50: tuple[str, ...] = (
    # sentinels for cross-round comparability
    "q01_pricing_summary",
    "p01_outcome_accounting",
    "d05_minhash_neardup",
    # only driver grade predates their oracles (r1 err=no_oracle)
    "d06_simhash",
    "d07_ngram_jaccard_pairs",
    "d09_lsh_similarity_topk",
    "d15_simhash_neardup",
    # round-5 NEW ops: first-time driver grades outrank re-grades
    "d80_block_dedup_retention",
    "d81_intradoc_dup_grams",
    "d82_doc_stitching",
    "d83_truncation_loss_curve",
    "d84_ivf_cell_purity",
    "d85_data_constrained_epochs",
    # round-1-era hash re-grades (stalest driver evidence)
    "d02_token_stats",
    "d03_quality_score",
    "d04_lang_id",
    "d10_embedding_norms",
    "d11_embedding_neardup",
    "d12_doc_fingerprint",
    "d14_doc_embedding_quality",
    "d16_pii_scrub",
    "d18_bpe_token_stats",
    "d19_stratified_sample",
    "d20_dataset_split",
    "d21_embedding_quantize",
    "d25_vocab_build",
    "d26_tfidf_keywords",
    "d29_column_profile",
    "d30_k_anonymity",
    "d33_boilerplate_ngrams",
    "d34_gopher_quality_rules",
    "d38_key_skew_profile",
    "d41_word_entropy",
    "d42_lexical_diversity",
    "d43_srp_near_dup",
    "m02_frame_sample",
    # rows-only by nature (d23/d27/d28): refresh the weaker rows check
    "d23_mllib_minhash_join",
    "d27_ivf_kmeans_topk",
    "d28_bpe_train",
    # round-2-era re-grades: LLM-ops families first
    "d22_repetition_score",
    "d31_contamination_check",
    "d32_source_mixing_weights",
    "d35_source_document_cap",
    "d36_lm_quality_buckets",
    "d39_sequence_packing",
    "d40_corpus_card",
    "p02_passed_enriched",
    "p03_field_surgery",
    # round-2-era relational spread (q14/q22/q28/q33/q37/q38 yield to
    # the round-5 new ops; they join the round-6 stalest-first queue)
    "q02_revenue_by_nation",
    "q11_window_topk_per_customer",
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
