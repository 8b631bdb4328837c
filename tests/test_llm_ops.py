"""Semantic tests for the hash-family LLM ops that have no SQL oracle:
MinHash-LSH candidate quality, SimHash collision behavior, LSH
similarity recall vs brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kpipe_spark.functions import dedup as D
from kpipe_spark.functions import similarity as S

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the birds sing in the tall green trees"
)


@pytest.fixture
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact duplicate of 0
        (2, BASE.replace("lazy", "sleepy")),  # near-duplicate of 0
        (3, "completely different text about spark query engines and shuffles"),
        (4, "another unrelated document mentioning parquet files and catalyst"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup_groups(spark, docs):
    out = D.exact_dedup(docs).collect()
    by_id = {r["doc_id"]: r["dup_count"] for r in out}
    assert by_id[0] == 2  # 0 and 1 collapse, min-id survivor
    assert 1 not in by_id
    assert by_id[3] == 1


def test_minhash_finds_near_duplicates(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]) for r in D.minhash_candidates(docs).collect()
    }
    assert (0, 1) in pairs  # identical docs always collide
    assert (0, 2) in pairs or (1, 2) in pairs  # near-dup collides
    assert (3, 4) not in pairs  # unrelated docs don't


def test_ngram_jaccard_refinement(spark, docs):
    # a one-word edit in a 24-word doc flips ~3 of ~22 3-shingles:
    # jaccard ≈ 19/25 ≈ 0.76, so threshold 0.7 keeps it and 0.9 drops it
    verified = D.ngram_jaccard_pairs(docs, threshold=0.7).collect()
    sims = {(r["id_a"], r["id_b"]): r["jaccard_sim"] for r in verified}
    assert sims[(0, 1)] == 1.0
    near = [v for k, v in sims.items() if 2 in k]
    assert near and all(0.7 <= v < 1.0 for v in near)
    strict = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    assert strict == {(0, 1)}


def test_simhash_properties(spark, docs):
    out = {r["doc_id"]: r["simhash64"] for r in D.simhash_df(docs).collect()}
    assert out[0] == out[1]  # identical text ⇒ identical simhash
    ham = docs.sparkSession.createDataFrame(
        [(out[0], out[2]), (out[0], out[3])], "a bigint, b bigint"
    ).select(D.hamming64(F.col("a"), F.col("b")).alias("d")).collect()
    near_dist, far_dist = ham[0]["d"], ham[1]["d"]
    assert near_dist < far_dist  # near-dup closer than unrelated doc
    assert near_dist <= 16


def test_simhash_payload_carry_parity(spark):
    """The payload-carry / skip-join-back form (d15/d59/d46 hot path)
    must equal the canonical join-back form row-for-row after the
    `!= 0` filter, on a corpus WITH degenerate docs: token-less docs
    exist only in the canonical form (as zeros) and are exactly what
    the filter drops."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "web1", 22),
            (2, "alpha beta gamma delta", "web2", 22),
            (3, "totally different words here", "cc", 28),
            (4, "", "empty_src", 0),
            (5, None, "null_src", 0),
            (6, "   ", "ws_src", 3),
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    old = (
        D.simhash_df(docs)
        .filter(F.col("simhash64") != 0)
        .join(docs.select("doc_id", "source", "n_chars"), "doc_id")
    )
    new = D.simhash_df(
        docs, payload_cols=("source", "n_chars"), include_empty=False
    ).filter(F.col("simhash64") != 0)
    key = lambda r: r["doc_id"]  # noqa: E731
    o = sorted([r.asDict() for r in old.collect()], key=key)
    n = sorted(
        [r.asDict() for r in new.select(*old.columns).collect()], key=key
    )
    assert o == n and len(o) == 3
    # canonical form still re-admits the degenerate docs as zeros
    full = {r["doc_id"]: r["simhash64"] for r in D.simhash_df(docs).collect()}
    assert full[4] == 0 and full[5] == 0 and full[6] == 0
    # payload with include_empty=True is refused (no payload source for
    # the re-admitted zeros)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        D.simhash_df(docs, payload_cols=("source",))


def test_lsh_recall_vs_brute_force(spark):
    """LSH top-k must recover a decent fraction of true neighbors on the
    real embeddings table (recall is the accuracy/speed dial)."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    planes = np.random.RandomState(42).normal(size=(2, 64)).tolist()
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.lsh_topk(emb, queries, planes, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"LSH recall collapsed: {recall}"


def test_cosine_self_similarity(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(10)
    v = S.as_double_array("embedding")
    rows = emb.select(F.round(S.cosine(v, v), 6).alias("self_sim")).collect()
    assert all(abs(r["self_sim"] - 1.0) < 1e-6 for r in rows)


def test_connected_components_transitive_closure(spark):
    """Chain a-b, b-c must close into one cluster; disjoint pair and
    untouched nodes stay separate; cluster_id is the component min."""
    from kpipe_spark.functions import dedup as D

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 7), (10, 11)], ["id_a", "id_b"]
    )
    got = {r["id"]: r["cluster_id"] for r in D.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_connected_components_string_ids_long_chain(spark):
    """The in-aggregate convergence check (tagged previous label, no
    label><label join per round) must stay exact for non-numeric ids —
    the sum-of-labels shortcut would not — and must propagate a chain
    whose diameter needs several rounds. Output schema carries no
    internal columns."""
    from kpipe_spark.functions import dedup as D

    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(9)]
    pairs = spark.createDataFrame(
        chain + [("zz1", "zz2")], ["id_a", "id_b"]
    )
    out = D.connected_components(pairs)
    assert out.columns == ["id", "cluster_id"]
    got = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert got == {f"n{i:02d}": "n00" for i in range(10)} | {
        "zz1": "zz1",
        "zz2": "zz1",
    }


def test_connected_components_seeded_first_round(spark):
    """Labels are seeded at min(self, neighbors) — round 1 rides the
    node-set aggregate itself. Observable contract: max_iterations=0
    returns exactly one propagation round's labels (not identity), and
    a star graph (diameter 2 from the hub, already at fixpoint after
    the seed) needs only the single convergence-confirming loop round."""
    from kpipe_spark.functions import dedup as D

    chain = spark.createDataFrame([(2, 5), (5, 9)], ["id_a", "id_b"])
    seeded = {
        r["id"]: r["cluster_id"]
        for r in D.connected_components(chain, max_iterations=0).collect()
    }
    assert seeded == {2: 2, 5: 2, 9: 5}

    star = spark.createDataFrame([(1, 4), (1, 6), (1, 8)], ["id_a", "id_b"])
    got = {
        r["id"]: r["cluster_id"]
        for r in D.connected_components(star, max_iterations=1).collect()
    }
    assert got == {1: 1, 4: 1, 6: 1, 8: 1}


def test_dup_clusters_exact_copies_share_cluster(spark):
    """Verbatim copies must land in one cluster with exactly one
    canonical survivor; a distinct doc stays a singleton."""
    from kpipe_spark.functions import dedup as D

    body = "the quick brown fox jumps over the lazy dog " * 8
    other = "completely different content with unique words " * 8
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, other)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in D.dup_clusters(docs).collect()}
    assert rows[1]["cluster_id"] == rows[2]["cluster_id"] == 1
    assert rows[1]["is_canonical"] and not rows[2]["is_canonical"]
    assert rows[3]["cluster_id"] == 3 and rows[3]["is_canonical"]
