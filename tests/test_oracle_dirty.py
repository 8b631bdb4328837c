"""Cross-engine parity on DIRTY documents — the degenerate-input class
(null / empty / whitespace-only / tab-padded / 1-2-token texts) that
the shipped test data never exercises.

The oracle suite proves Spark == DuckDB on clean data; this fixture
proves the two tokenization surfaces stay aligned where they
historically diverged: Spark's ``text.tokens()`` filters empty-string
tokens and the quality/minhash guards special-case contentless text,
so every oracle that mirrors those functions must filter and guard the
same way (plain ``regexp_split_to_array(trim(text))`` keeps '' entries
for tab padding and [''] for empty text — a phantom token)."""

from __future__ import annotations

import os

import duckdb
import pytest

from kpipe_spark.queries import all_queries
from tests.conftest import compare_with_oracle

# every text-analytics family that tokenizes: token stats, quality,
# lang-id, minhash/simhash dedup, fingerprints, unigram LM, repetition,
# vocab/tf-idf, gopher gate, packing, CDC chunks, budget selection,
# funnel, dup spans, priority dedup
DIRTY_SENSITIVE = [
    "d01_dedup_exact",
    "d02_token_stats",
    "d03_quality_score",
    "d04_lang_id",
    "d05_minhash_neardup",
    "d06_simhash",
    "d07_ngram_jaccard_pairs",
    "d12_doc_fingerprint",
    "d17_unigram_logprob",
    "d22_repetition_score",
    "d25_vocab_build",
    "d26_tfidf_keywords",
    "d34_gopher_quality_rules",
    "d36_lm_quality_buckets",
    "d39_sequence_packing",
    "d50_quality_weighted_sampling",
    "d53_cdc_chunk_dedup",
    "d57_token_budget_selection",
    "d59_priority_source_dedup",
    "d60_curation_funnel",
    "d61_dup_substring_spans",
    "d63_tokenizer_fertility",
    "d64_blocklist_gate",
    "d65_cluster_size_histogram",
    "d66_shared_prefix_templates",
    "d67_passage_chunks",
    "d68_dsir_importance",
    "d69_bigram_interp_logprob",
    "d71_ngram_novelty",
    "d72_source_kl_drift",
    "d73_zipf_fit",
    "d75_vocab_coverage",
    "d76_oov_rate",
    "d77_snapshot_diff",
    "d78_source_dup_rate",
    "d79_text_normalization",
    "d80_block_dedup_retention",
    "d81_intradoc_dup_grams",
    "d82_doc_stitching",
    "d83_truncation_loss_curve",
    "d85_data_constrained_epochs",
    "d90_unigram_train",
    "d91_unigram_fertility",
    "d92_unigram_piece_coverage",
    "d95_kneser_ney_logprob",
    "d96_cms_heavy_hitters",
    "d97_bloom_dedup_gate",
    "d98_hll_distinct_tokens",
    "d99_weighted_reservoir_sample",
    "p04_curation_composition",
]

_ROWS = [
    # (doc_id, text, lang, source)
    (0, "the quick brown fox jumps over the lazy dog again and again", "en", "src0"),
    (1, None, "en", "src0"),
    (2, "", "en", "src1"),
    (3, "   ", "en", "src1"),
    (4, "\t\t", "en", "src2"),
    (5, "\n \n", "en", "src2"),
    (6, "solo", "en", "src0"),
    (7, "two tokens", "en", "src1"),
    (8, "\tthe quick brown fox jumps over the lazy dog again and again\t", "en", "src2"),
    (9, "the quick brown fox jumps over the lazy dog again and again", "en", "src1"),
    (10, "a b  c   d    e", "en", "src0"),
    (11, "der schnelle braune fuchs springt und der hund schlaeft", "de", "src2"),
    (12, "two tokens", "en", "src2"),
    (13, "the the the the the the the the the the the the the the", "en", "src0"),
    # a source whose EVERY document is contentless: per-source ratios
    # (d63 fertility) must go NULL on both engines, not DIVIDE_BY_ZERO
    # under Spark's ANSI mode
    (14, "", "en", "srcvoid"),
    (15, "\t \t", "en", "srcvoid"),
    # a CONTENT-BEARING digit-less source: d59's priority cast must give
    # it nulls-LAST (least trusted) semantics on both engines — it
    # duplicates row 0's text, so it lands in a simhash dup group and
    # must LOSE to the numbered sources, and DuckDB's CAST('' AS INT)
    # would throw without TRY_CAST (round-3 ADVICE, medium)
    (16, "the quick brown fox jumps over the lazy dog again and again", "en", "srcplain"),
    (17, "an unnumbered feed with plenty of ordinary filler words here", "en", "srcplain"),
    # multibyte UTF-8 content: md5-derived fingerprints (minhash grams,
    # simhash lanes, doc fingerprints) must agree on the BYTES of
    # non-ASCII text, and NBSP (U+00A0) is NOT \s in either engine's
    # regex class (Java or RE2) — both must keep it inside one token
    (18, "café déjà-vu naïve résumé über schön façade jalapeño", "de", "src3"),
    (19, "word\u00a0joined\u00a0by\u00a0nbsp plus six ordinary ascii tokens here", "en", "src3"),
    # DECOMPOSED Unicode (e + combining acute, a + combining ring):
    # d79's NFC must compose these identically in Python unicodedata
    # and DuckDB utf8proc (different byte sequence, same md5 after),
    # while the md5-affine dedup ops treat the raw bytes consistently
    (20, "cafe\u0301 deja vu a\u030a angstro\u0308m plus ascii filler words", "de", "src3"),
]


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty-docs")
    df = spark.createDataFrame(
        [
            (i, t, lang, src, len(t) if t is not None else None)
            for i, t, lang, src in _ROWS
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    return str(d)


@pytest.fixture(scope="module")
def dirty_con(dirty_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dirty_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", DIRTY_SENSITIVE)
def test_dirty_corpus_matches_oracle(spark, dirty_con, dirty_dir, name):
    q = all_queries()[name]
    compare_with_oracle(q.build(spark, dirty_dir), dirty_con, q.oracle)


def test_dirty_dedup_has_no_degenerate_buckets(spark, dirty_dir):
    """The contentless docs (1-5) must never appear as near-dup
    candidates, while the real duplicate triple (0, 8, 9 — one
    tab-padded) must collapse to the same candidates in Spark."""
    from kpipe_spark.functions.dedup import minhash_candidates

    docs = spark.read.parquet(f"{dirty_dir}/documents.parquet")
    pairs = {
        (r["id_a"], r["id_b"]) for r in minhash_candidates(docs).collect()
    }
    flat = {i for p in pairs for i in p}
    assert flat.isdisjoint({1, 2, 3, 4, 5})
    assert {(0, 8), (0, 9), (8, 9)} <= pairs
