"""Text analysis operators (column expressions, zero Python in hot path).

Everything here is a pure Column builder over built-in functions, so a
100 TB documents scan keeps whole-stage codegen end to end: tokenize,
count, quality-score and language-id are one projection over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword markers for the n-gram/stopword heuristic
# language-ID. Ordered dict: tie-breaks resolve by this precedence.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "los"),
    "fr": ("le", "la", "les", "et", "des", "un"),
    "de": ("der", "die", "das", "und", "ein", "zu"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # romanized markers
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (split on runs of whitespace).

    Empty strings are filtered: ``split(trim(''), '\\s+')`` is ``['']``,
    which would give empty documents a phantom token (count 1,
    "perfect" diversity) and feed a literal ``''`` token into shingles
    and BPE training. Oracle SQL mirrors plain ``regexp_split_to_array``
    — identical on any document with real content; degenerate docs are
    additionally excluded from the hash-dedup paths at the source.

    The '' drop is ``array_remove``, NOT the ``F.filter`` HOF: they
    remove exactly the same elements (split never yields nulls, and
    '' appears only at the leading/trailing positions of a document
    whose edges trim doesn't strip), but every higher-order function
    is CodegenFallback — wrapping the split in one pulled the WHOLE
    trim+split subtree out of whole-stage codegen into interpreted
    eval. Swapping to the codegen'd array_remove measured never-slower
    across the tokenize family and 19-23% on the explode-consuming
    queries (d17 1.446→1.138, d68 1.866→1.440, d90 2.097→1.705 s at
    sf0.1, interleaved same-session A/B), identical output on the
    full corpus + degenerate-document matrix."""
    c = F.col(text) if isinstance(text, str) else text
    return F.array_remove(F.split(F.trim(c), r"\s+"), "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def bpe_ish_tokens(text: Column | str) -> Column:
    """Sub-word-ish tokenization: split on non-alphanumerics AND digit/
    letter boundaries — a cheap, deterministic stand-in for a BPE
    pre-tokenizer (word-boundary regex, the usual GPT-2 pre-tok shape).

    '' dropped via the codegen'd ``array_remove``, not the interpreted
    ``F.filter`` HOF — same elements removed (the boundary lookarounds
    are zero-width, so '' only arises at the string edges), keeps the
    lower+split subtree inside whole-stage codegen (see ``tokens``)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.array_remove(
        F.split(F.lower(c), r"[^a-z0-9]+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])"), ""
    )


def stopword_hits(text: Column | str, lang: str = "en") -> Column:
    """How many tokens are stopwords of ``lang``."""
    words = list(STOPWORDS[lang])
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words)))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    n = token_count(text)
    return F.when(n > 0, stopword_hits(text, lang) / n).otherwise(F.lit(0.0))


def quality_score_from_tokens(toks: Column, text: Column) -> Column:
    """``quality_score`` computed from an ALREADY-PROJECTED token-array
    column — the tokens-once form.

    ``quality_score(text)`` embeds ``tokens(text)`` FOUR times (count,
    distinct count, stopword hits, the ratio's denominator), and each
    copy is an interpreted split+filter HOF evaluated independently —
    Catalyst does not CSE interpreted HOFs (the cosine_pre lesson).
    Callers that project ``tokens(text)`` into a column first and pass
    it here pay the tokenization once per row; the counts derived from
    the array are the same integers, so the composite float arithmetic
    is bit-identical (measured 2.9× on d57's quality projection)."""
    from kpipe_spark.util import ieee_round

    n_tok = F.size(toks)
    diversity = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)) / n_tok
    ).otherwise(F.lit(0.0))
    length_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    words = list(STOPWORDS["en"])
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    ratio = F.when(n_tok > 0, hits / n_tok).otherwise(F.lit(0.0))
    stop = F.least(ratio * 5.0, F.lit(1.0))
    # ieee_round, not round: half-way composites (0.53875) otherwise
    # round differently in Spark vs the DuckDB oracle at larger sf
    score = ieee_round((diversity + length_score + stop) / 3.0, 4)
    # null guard is load-bearing: least() SKIPS null arguments, so a
    # null text would otherwise get length_score 1.0 — a missing
    # document outranking real short content in a quality gate
    return F.when(text.isNull(), F.lit(0.0)).otherwise(score)


def quality_score(text: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: rewards reasonable length,
    lexical diversity and stopword presence — the standard cheap filters
    a pretraining pipeline applies before expensive dedup.

    PERF: this single-expression form re-tokenizes per component (4
    interpreted HOF evaluations per row). Hot paths should project
    ``tokens(text)`` once and use ``quality_score_from_tokens``."""
    c = F.col(text) if isinstance(text, str) else text
    return quality_score_from_tokens(tokens(c), c)


def lang_scores_from_tokens(toks: Column) -> dict[str, Column]:
    """Per-language stopword hit counts from an ALREADY-PROJECTED token
    array — one interpreted filter HOF per language instead of one per
    REFERENCE (lang_id embeds each score in greatest + a when arm)."""
    return {
        lang: F.size(
            F.filter(toks, lambda t: t.isin(*list(words)))
        )
        for lang, words in STOPWORDS.items()
    }


def lang_id_from_scores(scores: dict[str, Column]) -> Column:
    """Argmax language from per-language score COLUMNS (project
    ``lang_scores_from_tokens`` into named columns first — scalar
    references are free where re-embedded HOF scores are not).
    Deterministic tie-break by the STOPWORDS declaration order (first
    language with the max score wins), mirrored in the oracle SQL."""
    vals = list(scores.values())
    best = F.greatest(*vals) if len(vals) > 1 else vals[0]
    expr = F.lit("unknown")
    # build backwards so earlier languages win ties
    for lang in reversed(list(STOPWORDS)):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("unknown"))


def lang_id(text: Column | str) -> Column:
    """Stopword-count argmax language ID (single-expression form — hot
    paths project tokens + scores first, see lang_id_from_scores)."""
    scores = {lang: stopword_hits(text, lang) for lang in STOPWORDS}
    return lang_id_from_scores(scores)


def fingerprint(text: Column | str) -> Column:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed text. Identical modulo-formatting documents get
    identical fingerprints — the exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))
