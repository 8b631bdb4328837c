"""Unigram-LM tokenizer family (d90-d92): the semantic properties the
oracle compare can't see by itself.

The load-bearing claim is that Spark's one-state-per-position Viterbi
DP (functions/unigram.py:segment_pieces) returns EXACTLY the
(score desc, seg asc) winner over all segmentation paths — the oracle
proves it against DuckDB's enumeration on the shipped corpus; these
tests prove it against an independent Python brute force on crafted
tie-heavy inputs, plus the training invariants (single-char
completeness, budget bounds, exact char-coverage accounting)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kpipe_spark.functions.unigram import (
    MAX_PIECE_LEN,
    VOCAB_MULTI,
    qln,
    segment_pieces,
    train_unigram,
)

SF_SMALL = "/root/testdata/sf0.001"


def _brute_force(word: str, scores: dict[str, int]) -> list[str]:
    """All segmentation paths, best by (score desc, ' '-joined asc) —
    the DuckDB oracle's enumeration, independently in Python."""
    best: tuple[tuple[int, str], list[str]] | None = None

    def rec(pos: int, pieces: list[str], sc: int) -> None:
        nonlocal best
        if pos == len(word):
            key = (-sc, " ".join(pieces))
            if best is None or key < best[0]:
                best = (key, list(pieces))
            return
        for plen in range(1, MAX_PIECE_LEN + 1):
            p = word[pos : pos + plen]
            if len(p) == plen and p in scores:
                pieces.append(p)
                rec(pos + plen, pieces, sc + scores[p])
                pieces.pop()

    rec(0, [], 0)
    assert best is not None, f"unsegmentable word {word!r}"
    return best[1]


def _segment_with(spark, words: list[str], scores: dict[str, int]):
    df = spark.createDataFrame([(w,) for w in words], "word string")
    rows = df.select(
        "word", segment_pieces(F.col("word"), scores).alias("pieces")
    ).collect()
    return {r["word"]: list(r["pieces"]) for r in rows}


def test_viterbi_dp_equals_bruteforce_with_ties(spark):
    """Tie-heavy crafted vocab: 'abab' has a 4-way score tie whose
    winner is decided purely by the seg-string tie-break; 'ab' tests
    that a single expensive piece beats a cheap+ruinous pair; 'baaab'
    mixes both. The DP must agree with enumeration on every word."""
    scores = {
        "a": -10,
        "b": -10,
        "ab": -20,
        "ba": -20,
        "aa": -15,
        "aab": -60,
        "bab": -25,
        "abab": -80,
    }
    words = ["abab", "ab", "ba", "baaab", "aaaa", "babab", "a", "b"]
    got = _segment_with(spark, words, scores)
    for w in words:
        assert got[w] == _brute_force(w, scores), (w, got[w])
    # pure-tie vocab: every 'abab' path scores -40, so the winner is
    # decided ONLY by the seg-string tie-break — the lexicographically
    # least ' '-joined segmentation
    ties = {"a": -10, "b": -10, "ab": -20, "ba": -20}
    assert _segment_with(spark, ["abab"], ties)["abab"] == [
        "a", "b", "a", "b",
    ]
    assert _brute_force("abab", ties) == ["a", "b", "a", "b"]


def test_viterbi_prefers_higher_score_over_fewer_pieces(spark):
    """Score dominates piece count: [ab] at -50 loses to [a,b] at -12
    even though it is shorter — unigram LM semantics, not a
    fewest-pieces heuristic."""
    scores = {"a": -2, "b": -10, "ab": -50}
    got = _segment_with(spark, ["ab"], scores)
    assert got["ab"] == ["a", "b"]


def test_training_invariants(spark):
    """Budget, completeness, and exact coverage accounting on the real
    corpus: every single char survives the prune; multi-char pieces
    respect VOCAB_MULTI; every distinct word reconstructs from its
    pieces; and the char-coverage identity holds — each corpus char is
    covered exactly once, so sum(usage * len(piece)) equals the
    corpus's word-weighted character total."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    model = train_unigram(spark, docs)
    assert model is not None
    singles = {p for p in model.scores if len(p) == 1}
    multi = {p for p in model.scores if len(p) > 1}
    assert len(multi) <= VOCAB_MULTI
    # single-char completeness: every char of every word has a piece
    chars = {
        c
        for r in model.wf.select("word").collect()
        for c in r["word"]
    }
    assert chars <= singles
    seg = model.seg.collect()
    for r in seg:
        assert "".join(r["pieces"]) == r["word"], r
    covered = sum(
        r["wcount"] * sum(len(p) for p in r["pieces"]) for r in seg
    )
    total_chars = sum(r["wcount"] * len(r["word"]) for r in seg)
    assert covered == total_chars


def test_train_returns_none_on_wordless_corpus(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "\t \n"), (4, "¡¿")],
        "doc_id bigint, text string",
    )
    assert train_unigram(spark, docs) is None


def test_qln_is_negative_and_monotone():
    assert qln(0.5) < 0
    assert qln(0.25) < qln(0.5) < qln(0.9)


@pytest.mark.slow  # r14 tiering: multi-minute — slow tier
def test_viterbi_scales_to_synthetic_vocab(spark):
    """The vocab-shaped-table claim, stress-checked past the fixture's
    31 distinct words: 20k synthetic 16-char words (deterministic
    md5-drawn from the trained alphabet) all segment AND reconstruct
    under the trained model — the DP is a per-row expression with no
    shuffle, so distinct-word count is the only axis that matters
    (200k words measured at ~106k words/s on local[32];
    ARCHITECTURE §6.6)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    model = train_unigram(spark, docs)
    alpha = sorted(p for p in model.scores if len(p) == 1)
    arr = F.array(*[F.lit(c) for c in alpha])
    words = spark.range(20_000).select(
        F.concat(
            *[
                F.element_at(
                    arr,
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(F.col("id"), F.lit(f"_{j}"))
                                ),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % len(alpha)
                        + 1
                    ).cast("int"),
                )
                for j in range(16)
            ]
        ).alias("word")
    )
    seg = words.select(
        "word", segment_pieces(F.col("word"), model.scores).alias("pieces")
    )
    bad = seg.filter(F.expr("concat_ws('', pieces) != word")).count()
    assert bad == 0


def test_fertility_grades_against_d63(spark):
    """The d63 comparison the family exists for: per source, trained-
    unigram fertility (d91) sits between 1 (whole-word pieces) and the
    character baseline (pieces can't exceed chars), and on this corpus
    the learned multi-char vocab genuinely compresses — fertility is
    strictly below chars-per-word."""
    from kpipe_spark.queries import all_queries

    qs = all_queries()
    d91 = {
        r["source"]: r
        for r in qs["d91_unigram_fertility"].build(spark, SF_SMALL).collect()
    }
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    from kpipe_spark.functions.text import bpe_ish_tokens

    chars = (
        docs.select(
            "source", F.explode(bpe_ish_tokens("text")).alias("w")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
        )
        .collect()
    )
    for r in chars:
        f = d91[r["source"]]
        assert f["total_words"] == r["n_words"]
        assert f["fertility"] >= 1.0
        assert f["fertility"] < r["n_chars"] / r["n_words"], (
            "learned vocab failed to beat the character baseline"
        )


@pytest.mark.slow  # r14 tiering: multi-minute — slow tier
def test_unigram_tokenizer_artifact_lifecycle(spark):
    """The stored-artifact form: build persists the model, attach
    reads the family back from TBLPROPERTIES (and rejects a mismatch),
    tokenize against the STORED scores reconstructs every document's
    pre-tok words in order, contentless docs tokenize to [], and drop
    leaves no warehouse orphan."""
    import os
    import urllib.parse
    import uuid

    from kpipe_spark.functions.text import bpe_ish_tokens
    from kpipe_spark.functions.unigram import UnigramTokenizer

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    table = f"unigram_tok_{uuid.uuid4().hex[:8]}"
    tok = UnigramTokenizer.build(spark, docs, table)
    try:
        # attach round-trips the family; a mismatch is rejected loudly
        att = UnigramTokenizer.attach(spark, table)
        assert att.scores == tok.scores
        with pytest.raises(ValueError, match="family mismatch"):
            UnigramTokenizer.attach(spark, table, qln_scale=4096)

        probe = spark.createDataFrame(
            [
                (1, "spark merge window join"),
                (2, None),
                (3, "\t \n"),
            ],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r for r in att.tokenize(probe).collect()}
        assert set(out) == {1, 2, 3}
        # pieces reconstruct the pre-tok words, in order
        words = probe.filter("doc_id = 1").select(
            F.explode(bpe_ish_tokens("text")).alias("w")
        ).collect()
        assert "".join(out[1]["pieces"]) == "".join(r["w"] for r in words)
        assert out[1]["n_pieces"] == len(out[1]["pieces"]) > 0
        # contentless docs -> empty array, not NULL
        for i in (2, 3):
            assert out[i]["pieces"] == []
            assert out[i]["n_pieces"] == 0
        # a word with a character the training corpus never saw
        # surfaces as NULL pieces, never a silent drop
        weird = spark.createDataFrame(
            [(9, "zzzürich9q")], "doc_id bigint, text string"
        )
        wrow = att.tokenize(weird).collect()[0]
        assert wrow["pieces"] is None or all(
            p is not None for p in wrow["pieces"]
        )
    finally:
        tok.drop()
    wh = urllib.parse.urlparse(
        spark.conf.get("spark.sql.warehouse.dir")
    ).path
    assert not spark.catalog.tableExists(table)
    assert not os.path.exists(os.path.join(wh, table))


def test_unigram_tokenizer_build_rejects_wordless_corpus(spark):
    import uuid

    from kpipe_spark.functions.unigram import UnigramTokenizer

    docs = spark.createDataFrame(
        [(1, None), (2, "  ")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="wordless"):
        UnigramTokenizer.build(
            spark, docs, f"unigram_void_{uuid.uuid4().hex[:8]}"
        )


def test_unigram_tokenizer_matches_query_segmentation(spark):
    """tokenize() under the stored model agrees word-for-word with the
    d90 training run's final segmentation (the artifact is the API
    form of the query shape — the AnnIndex≡d88 discipline)."""
    import uuid

    from kpipe_spark.functions.unigram import UnigramTokenizer

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    model = train_unigram(spark, docs)
    table = f"unigram_par_{uuid.uuid4().hex[:8]}"
    tok = UnigramTokenizer.build(spark, docs, table)
    try:
        assert tok.scores == model.scores
        seg = {
            r["word"]: list(r["pieces"]) for r in model.seg.collect()
        }
        # tokenize single-word docs: each must match the model's
        # segmentation of that distinct word
        probe = spark.createDataFrame(
            [(i, w) for i, w in enumerate(sorted(seg))],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: list(r["pieces"]) for r in tok.tokenize(probe).collect()}
        for i, w in enumerate(sorted(seg)):
            assert out[i] == seg[w], (w, out[i], seg[w])
    finally:
        tok.drop()


def test_piece_coverage_multichar_mass(spark):
    """The d75-style budget check: the trained vocabulary's multi-char
    pieces carry real character mass (char_share of len>=2 rows > 0.3
    on the clean corpus — a degenerate all-characters model would put
    ~0 there), and the share columns sum to 1 within rounding."""
    from kpipe_spark.queries import all_queries

    rows = (
        all_queries()["d92_unigram_piece_coverage"]
        .build(spark, SF_SMALL)
        .collect()
    )
    assert rows
    assert abs(sum(r["occurrence_share"] for r in rows) - 1.0) < 0.001
    assert abs(sum(r["char_share"] for r in rows) - 1.0) < 0.001
    multi_mass = sum(r["char_share"] for r in rows if r["piece_len"] >= 2)
    assert multi_mass > 0.3, rows


def test_unigram_artifact_usage_matches_d90_output(spark):
    """The stored artifact's (piece, score, usage) rows equal the
    oracle-graded d90_unigram_train output on the same corpus: the
    'usage' column is the FINAL-segmentation usage (d90's usage2), not
    the iteration-1 M-step input — auditing the table against the d90
    grade must agree row-for-row (round-8 advice item)."""
    import uuid

    from kpipe_spark.functions.unigram import UnigramTokenizer
    from kpipe_spark.queries import all_queries

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    table = f"unigram_usage_{uuid.uuid4().hex[:8]}"
    tok = UnigramTokenizer.build(spark, docs, table)
    try:
        stored = {
            r["piece"]: (r["score"], r["usage"])
            for r in spark.table(table).collect()
        }
        d90 = {
            r["piece"]: (r["score"], r["usage"])
            for r in all_queries()["d90_unigram_train"]
            .build(spark, SF_SMALL)
            .collect()
        }
        assert stored == d90
    finally:
        tok.drop()


def test_unigram_tokenize_untrained_char_null_sentinel(spark):
    """A word containing a character the training corpus never saw
    segments to NULL pieces AND NULL n_pieces — pinned explicitly
    because size(NULL) is config-dependent (-1 under legacy sizeOfNull,
    NULL under ANSI); the sentinel must not depend on session config."""
    import uuid

    from kpipe_spark.functions.unigram import UnigramTokenizer

    corpus = spark.createDataFrame(
        [(1, "aa ab ba"), (2, "ab ab aa")], "doc_id bigint, text string"
    )
    table = f"unigram_null_{uuid.uuid4().hex[:8]}"
    tok = UnigramTokenizer.build(spark, corpus, table)
    try:
        probe = spark.createDataFrame(
            [
                (1, "qq"),  # q never trained -> whole doc NULL
                (2, "aa qq"),  # one bad word nulls the doc via flatten
                (3, "ab ba"),  # fully trained -> segments
                (4, None),  # contentless -> [] / 0
            ],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r for r in tok.tokenize(probe).collect()}
        for bad in (1, 2):
            assert out[bad]["pieces"] is None
            assert out[bad]["n_pieces"] is None
        assert out[3]["pieces"] is not None
        assert out[3]["n_pieces"] == len(out[3]["pieces"]) > 0
        assert out[4]["pieces"] == [] and out[4]["n_pieces"] == 0
    finally:
        tok.drop()


def test_tokenize_join_strategy_matches_literal(spark):
    """The broadcast-join Viterbi (segment_pieces_joined) returns
    BIT-IDENTICAL tokenization to the create_map literal path on the
    same stored model — same pieces, same NULL sentinel for untrained
    characters, same [] for contentless docs. The per-word map carries
    only that word's candidate substrings, for which try_element_at
    behaves exactly like the global literal map."""
    import uuid

    from kpipe_spark.functions.unigram import UnigramTokenizer

    corpus = spark.createDataFrame(
        [(1, "spark stream merge join"), (2, "merge spark spark")],
        "doc_id bigint, text string",
    )
    table = f"unigram_join_{uuid.uuid4().hex[:8]}"
    tok = UnigramTokenizer.build(spark, corpus, table)
    try:
        probe = spark.createDataFrame(
            [
                (1, "spark merge"),
                (2, "sparkstream"),  # unseen word, trained chars
                (3, "zzz"),  # untrained char -> NULL on BOTH paths
                (4, None),  # contentless -> [] on BOTH paths
            ],
            "doc_id bigint, text string",
        )
        lit = {
            r["doc_id"]: (r["pieces"], r["n_pieces"])
            for r in tok.tokenize(probe, strategy="literal").collect()
        }
        join = {
            r["doc_id"]: (r["pieces"], r["n_pieces"])
            for r in tok.tokenize(probe, strategy="join").collect()
        }
        assert lit == join
        assert lit[4] == ([], 0)
        with pytest.raises(ValueError, match="unknown tokenize"):
            tok.tokenize(probe, strategy="viterbi")
    finally:
        tok.drop()


def test_tokenize_production_vocab_no_plan_blowup(spark):
    """tokenize under a ≥10k-piece stored score table (a production
    SentencePiece-scale budget) must NOT inline the vocab as a literal:
    auto strategy picks the broadcast-join path, whose plan is
    constant-size at any vocab budget. The literal path measures
    ~35 s of driver-side plan ANALYSIS at 10k pieces (quadratic —
    unigram.LITERAL_MAP_CEILING's table); the join path must analyze
    in seconds and segment correctly (reconstruction property)."""
    import random
    import string
    import time
    import uuid

    from kpipe_spark.functions.unigram import (
        LITERAL_MAP_CEILING,
        UnigramTokenizer,
    )

    alpha = list(string.ascii_lowercase) + list(string.digits)
    rng = random.Random(7)
    pieces = {c: -60000 for c in alpha}
    while len(pieces) < 10_000:
        p = "".join(rng.choice(alpha) for _ in range(rng.randint(2, 4)))
        pieces.setdefault(p, -rng.randint(10_000, 50_000))
    assert len(pieces) > LITERAL_MAP_CEILING
    table = f"unigram_prod_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [(p, s, 0) for p, s in sorted(pieces.items())],
        "piece string, score bigint, usage bigint",
    ).write.mode("overwrite").saveAsTable(table, format="parquet")
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES "
        "('kpipe.unigram.qln_scale' = '16384', "
        "'kpipe.unigram.max_piece_len' = '4')"
    )
    try:
        tok = UnigramTokenizer.attach(spark, table)
        probe = spark.createDataFrame(
            [
                (1, "sparkstream tokenizer training"),
                (2, "abc123 xyz"),
                (3, None),
            ],
            "doc_id bigint, text string",
        )
        t0 = time.perf_counter()
        out_df = tok.tokenize(probe)  # auto -> join at 10k pieces
        out_df.schema  # force full analysis
        analyze_sec = time.perf_counter() - t0
        out = {r["doc_id"]: r for r in out_df.collect()}
        # STRUCTURAL check first (host-speed independent): the join
        # path's plan must not embed the vocab as a literal. Sample
        # vocab pieces that cannot occur any other way (multi-char,
        # absent from the probe text and from identifiers) and assert
        # none appear in the analyzed plan; the literal path inlines
        # every one of the 10k.
        plan = out_df._jdf.queryExecution().analyzed().toString()
        # marker hygiene: exclude pieces that could occur in the plan
        # for innocent reasons — substrings of the probe text, and
        # all-hex pieces (the plan embeds the table name's random
        # uuid-hex suffix, so a hex marker flakes ~1-in-700 runs)
        probe_text = "sparkstream tokenizer training abc123 xyz"
        hexset = set("0123456789abcdef")
        markers = [
            p
            for p in pieces
            if len(p) >= 3
            and p not in probe_text
            and not set(p) <= hexset
        ][:25]
        assert len(markers) == 25
        inlined = [p for p in markers if p in plan]
        assert not inlined, (
            f"vocab pieces inlined into the plan (literal path leaked "
            f"through): {inlined[:5]}"
        )
        # soft wall-clock canary: literal analysis alone measures ~35 s
        # at this vocab. Generous bound because a saturated host can
        # stretch even the join path; the structural assertion above is
        # the real gate (ADVICE r8: timing-only checks flake on busy
        # hosts).
        assert analyze_sec < 60, f"plan analysis took {analyze_sec:.1f}s"
        # reconstruction: every char is in the vocab, so every word
        # segments and pieces concatenate back to the pre-tok words
        assert "".join(out[1]["pieces"]) == "sparkstreamtokenizertraining"
        assert "".join(out[2]["pieces"]) == "abc123xyz"
        assert out[3]["pieces"] == [] and out[3]["n_pieces"] == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
