"""Semantic tests for the round-4 selection/eval operators (llm_ops11).

The oracle suite proves Spark == DuckDB on these; this file proves the
MATH is right — the DSIR score against a plain-Python reference on
randomized corpora, and closed-form sanity anchors for novelty, recall
and the Zipf fit (a duplicated doc scores 0 novelty, exact-Zipf input
fits slope -1, IVF recall is a fraction of exact hits).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kpipe_spark.functions.selection import dsir_log_weights

SF_SMALL = "/root/testdata/sf0.001"


def _bucket(gram: str, n_buckets: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % n_buckets


def _dsir_reference(
    rows: list[tuple[int, str, str]],
    targets: tuple[str, ...],
    n_buckets: int,
) -> dict[int, tuple[int, float]]:
    """Plain-Python DSIR: per-doc (n_bigrams, round(logw, 4))."""
    per_doc: dict[int, dict[int, int]] = {}
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    src: dict[int, str] = {}
    for doc_id, text, source in rows:
        if text is None or not text.strip():
            continue
        toks = [t for t in text.split() if t]
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            continue
        src[doc_id] = source
        d = per_doc.setdefault(doc_id, {})
        for g in grams:
            b = _bucket(g, n_buckets)
            d[b] = d.get(b, 0) + 1
            cr[b] = cr.get(b, 0) + 1
            if source in targets:
                ct[b] = ct.get(b, 0) + 1
    nr = sum(cr.values())
    nt = sum(ct.values())
    out = {}
    for doc_id, d in per_doc.items():
        logw = sum(
            c
            * (
                math.log10((ct.get(b, 0) + 1) / (nt + n_buckets))
                - math.log10((cr[b] + 1) / (nr + n_buckets))
            )
            for b, c in d.items()
        )
        out[doc_id] = (sum(d.values()), math.floor(logw * 1e4 + 0.5) / 1e4)
    return out


_WORDS = ["alpha", "beta", "gamma", "delta", "run", "the", "x9"]


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(
                st.none(),
                st.lists(st.sampled_from(_WORDS), max_size=8).map(" ".join),
            ),
            st.sampled_from(["wiki", "crawl", "forum"]),
        ),
        min_size=1,
        max_size=25,
    ),
    targets=st.sampled_from([("wiki",), ("wiki", "forum"), ("nope",)]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dsir_matches_python_reference(spark, rows, targets):
    """dsir_log_weights == the direct plain-Python computation for any
    corpus, including null/blank texts, 0-1-token docs (no bigrams →
    no row), and an empty target set (score collapses to the smoothing
    ratio, not an error)."""
    data = [(i, t, s) for i, (t, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logw"])
        for r in dsir_log_weights(df, targets, n_buckets=64).collect()
    }
    expected = _dsir_reference(data, targets, 64)
    assert set(got) == set(expected)
    for doc_id, (nb, logw) in expected.items():
        g_nb, g_logw = got[doc_id]
        assert g_nb == nb
        assert g_logw == pytest.approx(logw, abs=2e-4)


def test_dsir_target_docs_score_higher(spark):
    """A doc sharing bigrams with the target distribution must outscore
    a doc whose bigrams only exist in the raw pool."""
    data = [
        (0, "good clean prose here", "wiki"),
        (1, "good clean prose here", "crawl"),  # matches target content
        (2, "zz yy xx ww vv uu", "crawl"),  # target has none of these
    ]
    df = spark.createDataFrame(data, "doc_id long, text string, source string")
    got = {r["doc_id"]: r["logw"] for r in dsir_log_weights(df, ("wiki",)).collect()}
    assert got[1] > got[2]


def test_novelty_duplicate_scores_zero(spark_sf_query):
    """d71: an exact duplicate of an earlier doc has novelty 0; the
    first occurrence of unique content has novelty 1."""
    df = spark_sf_query("d71_ngram_novelty", SF_SMALL)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows, "no novelty rows at sf0.001"
    fracs = [r["novel_frac"] for r in rows.values()]
    assert all(0.0 <= f <= 1.0 for f in fracs)
    # lowest doc_id with content is all-novel by definition
    first = rows[min(rows)]
    assert first["novel_frac"] == 1.0


def test_ann_recall_bounds_and_candidates(spark_sf_query):
    """d70: recall in [0,1], n_hits <= 10, and the IVF candidate count
    is a strict subset of the corpus (the whole point of the index)."""
    rows = spark_sf_query("d70_ann_recall_eval", SF_SMALL).collect()
    assert rows
    import duckdb

    n_corpus = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMALL}/embeddings.parquet'"
    ).fetchone()[0]
    for r in rows:
        assert 0 <= r["n_hits"] <= 10
        assert r["recall"] == pytest.approx(r["n_hits"] / 10.0)
        assert 0 < r["n_candidates"] < n_corpus


def test_zipf_fit_exact_zipf_slope(spark):
    """d73's regression algebra: a corpus whose token frequencies are
    exactly c(r) = round(1000/r) fits slope ~= -1."""
    from kpipe_spark.queries import all_queries
    import tempfile, os

    QUERIES = all_queries()
    words = []
    for r in range(1, 51):
        words.extend([f"w{r:03d}"] * round(1000 / r))
    text = " ".join(words)
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(0, text, "en", "src0", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        row = QUERIES["d73_zipf_fit"].build(spark, d).collect()[0]
    assert row["n_vocab"] == 50
    assert abs(row["zipf_slope"] + 1.0) < 0.05


def test_embedding_drift_identical_labels(spark):
    """d74's math: if every label has the SAME centroid (each label
    holds the same pair of mirrored vectors), drift is zero — cosine 1,
    L2 0 — and a label shifted by a constant offset shows cosine < 1."""
    import os
    import tempfile

    from kpipe_spark.queries import all_queries

    QUERIES = all_queries()
    base = [0.5, -0.25, 0.125]
    rows = []
    vid = 0
    for lab in (0, 1):
        for sign in (1.0, -1.0):
            rows.append((vid, [sign * x for x in base], lab))
            vid += 1
    # label 2: constant positive offset — a genuinely different centroid
    rows.append((vid, [x + 0.25 for x in base], 2))
    rows.append((vid + 1, [x + 0.3 for x in base], 2))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(os.path.join(d, "embeddings.parquet"))
        got = {
            r["label"]: r
            for r in QUERIES["d74_embedding_drift"].build(spark, d).collect()
        }
    # labels 0/1 centroids are exactly the zero vector (mirrored pairs
    # cancel in fixed-point too) — cosine is undefined and must come
    # back NULL, not DIVIDE_BY_ZERO/NaN
    assert got[0]["centroid_cosine"] is None
    assert got[1]["centroid_cosine"] is None
    assert got[2]["n_vecs"] == 2
    assert -1.0 <= got[2]["centroid_cosine"] <= 1.0
    assert got[2]["centroid_l2"] > 0.0


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(
                st.none(),
                st.lists(st.sampled_from(_WORDS), max_size=6).map(" ".join),
            ),
            st.sampled_from(["s0", "s1", "s2"]),
        ),
        min_size=2,
        max_size=20,
    ),
    split_at=st.integers(min_value=0, max_value=20),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # r14 tiering: multi-minute — slow tier
def test_drift_counts_additive_and_kl_nonnegative(spark, rows, split_at):
    """The drift monitor's algebra on random corpora: (1) counts are
    additive — counts(A) + counts(B) == counts(A ∪ B) for any split,
    the property the streaming accumulator relies on; (2) KL >= 0 for
    every source (Gibbs' inequality)."""
    from collections import defaultdict

    from kpipe_spark.functions.monitoring import (
        bigram_bucket_counts,
        source_kl_bits,
    )

    data = [(i, t, s) for i, (t, s) in enumerate(rows)]
    schema = "doc_id long, text string, source string"
    whole = spark.createDataFrame(data, schema)
    cut = min(split_at, len(data))
    acc: dict[tuple[str, int], int] = defaultdict(int)
    for part in (data[:cut], data[cut:]):
        if not part:
            continue
        for r in bigram_bucket_counts(
            spark.createDataFrame(part, schema), n_buckets=64
        ).collect():
            acc[(r["source"], r["bucket"])] += r["c"]
    direct = {
        (r["source"], r["bucket"]): r["c"]
        for r in bigram_bucket_counts(whole, n_buckets=64).collect()
    }
    assert dict(acc) == direct
    for r in source_kl_bits(bigram_bucket_counts(whole, n_buckets=64)).collect():
        assert r["kl_bits"] >= 0.0


def test_embedding_drift_null_and_ragged_vectors(spark):
    """d74 on dirty vector data: NULL embeddings and empty arrays
    contribute no rows (a label that is ALL-null simply disappears),
    and ragged dimensions don't crash — per-dimension means divide by
    that dimension's own count."""
    import os
    import tempfile

    from kpipe_spark.queries import all_queries

    rows = [
        (0, [0.5, 0.25], 0),
        (1, None, 0),
        (2, [], 0),
        (3, None, 1),       # label 1 is all-null
        (4, [], 1),
        (5, [0.5, 0.25, 0.125], 2),  # ragged vs label 0
        (6, [0.25], 2),
    ]
    import duckdb

    q = all_queries()["d74_embedding_drift"]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).coalesce(1).write.parquet(os.path.join(d, "embeddings.parquet"))
        sdf = q.build(spark, d).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{d}/embeddings.parquet/*.parquet')"
        )
        odf = con.sql(q.oracle).df()
    got = {r["label"]: r for _, r in sdf.iterrows()}
    assert set(got) == {0, 2}  # all-null label 1 absent, no crash
    assert got[0]["n_vecs"] == 1
    assert got[2]["n_vecs"] == 2
    for r in got.values():
        assert -1.0 <= r["centroid_cosine"] <= 1.0
        assert r["centroid_l2"] >= 0.0
    # and the DuckDB oracle agrees on the dirty fixture (the dirty
    # suite proper is documents-only; this is d74's equivalent row)
    key = lambda df: sorted(  # noqa: E731
        tuple(repr(v) for v in r)
        for r in df[sorted(df.columns)].itertuples(index=False)
    )
    assert key(sdf) == key(odf)


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_embedding_drift_matches_numpy(spark, seed):
    """d74 == the direct numpy computation (within fixed-point
    quantization error, which is <= 2^-25 per element — invisible at
    the rounded 6 decimals for these magnitudes)."""
    import os
    import tempfile

    import numpy as np

    from kpipe_spark.queries import all_queries

    rng = np.random.default_rng(seed)
    n, dim, n_labels = 30, 8, 3
    vecs = rng.uniform(-0.5, 0.5, (n, dim)).astype(np.float32)
    labels = rng.integers(0, n_labels, n)
    rows = [
        (i, [float(x) for x in vecs[i]], int(labels[i])) for i in range(n)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(os.path.join(d, "embeddings.parquet"))
        got = {
            r["label"]: r
            for r in all_queries()["d74_embedding_drift"]
            .build(spark, d)
            .collect()
        }
    g = vecs.astype(np.float64).mean(axis=0)
    for lab in np.unique(labels):
        m = vecs[labels == lab].astype(np.float64).mean(axis=0)
        cos = float(m @ g / (np.linalg.norm(m) * np.linalg.norm(g)))
        l2 = float(np.linalg.norm(m - g))
        r = got[int(lab)]
        assert r["n_vecs"] == int((labels == lab).sum())
        assert r["centroid_cosine"] == pytest.approx(cos, abs=5e-5)
        assert r["centroid_l2"] == pytest.approx(l2, abs=5e-5)


def test_vocab_coverage_monotone(spark_sf_query):
    """d75: coverage is nondecreasing in K, bounded by 1, and the
    largest K on a 31-token vocab covers more than the smallest."""
    rows = {r["k"]: r for r in spark_sf_query("d75_vocab_coverage", SF_SMALL).collect()}
    ks = sorted(rows)
    assert ks == [1, 2, 4, 8, 16, 32]
    last = 0.0
    for k in ks:
        f = rows[k]["coverage_frac"]
        assert 0.0 < f <= 1.0
        assert f >= last
        last = f
    assert rows[32]["coverage_frac"] > rows[1]["coverage_frac"]


def test_oov_rate_bounds_and_consistency(spark_sf_query):
    """d76: oov_frac == n_oov / n_tokens, within [0,1], and across the
    corpus SOME tokens are out of the top-16 vocab (31-token corpus)."""
    rows = spark_sf_query("d76_oov_rate", SF_SMALL).collect()
    assert rows
    assert any(r["n_oov"] > 0 for r in rows)
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert r["oov_frac"] == pytest.approx(
            r["n_oov"] / r["n_tokens"], abs=1e-4
        )


@pytest.fixture
def spark_sf_query(spark):
    from kpipe_spark.queries import all_queries

    q = all_queries()

    def run(name: str, sf_dir: str):
        return q[name].build(spark, sf_dir)

    return run
