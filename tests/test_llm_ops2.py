"""Semantic tests for the part-2 LLM ops: IVF recall vs brute force,
fingerprint sketch stability, and the multimodal mapInPandas plumbing
(deterministic stubbed codec)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kpipe_spark.functions import multimodal as M
from kpipe_spark.functions import similarity as S
from kpipe_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def test_ivf_recall_vs_brute_force(spark):
    """Probing 2 of 16 cells must still recover a useful fraction of the
    exact neighbors — the recall/cost dial of the IVF layout."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in all_queries()["d13_ivf_topk"].build(spark, SF).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"IVF recall collapsed: {recall}"
    # every approx neighbor must carry the true cosine (exact re-score)
    assert len(approx) == 8 * 5


def test_embedding_neardup_symmetric_and_thresholded(spark):
    out = all_queries()["d11_embedding_neardup"].build(spark, SF).collect()
    for r in out:
        assert r["id_a"] < r["id_b"]  # each pair exactly once
        assert r["cosine_sim"] >= 0.35


def test_fingerprint_is_stable_and_order_insensitive(spark):
    """Same text ⇒ same bottom-4 sketch regardless of partitioning."""
    q = all_queries()["d12_doc_fingerprint"]
    a = {r["doc_id"]: r["fp"] for r in q.build(spark, SF).collect()}
    b = {
        r["doc_id"]: r["fp"]
        for r in q.build(spark, SF).repartition(7).collect()
    }
    assert a == b
    assert all(len(fp.split(",")) <= 4 for fp in a.values())


@pytest.fixture
def media(spark):
    rows = [
        (0, "image", M.png_bytes(8, 4, seed=3), None),
        (1, "video", M.video_bytes(25, 6, 5, seed=9), None),
        (2, "audio", b"", None),  # empty content -> decode error
        (3, "audio", M.wav_bytes(100, 16000, seed=7), None),
        (4, "image", b"\x89PNG\r\n\x1a\nnot-really", None),  # corrupt
    ]
    df = spark.createDataFrame(
        rows, "media_id bigint, kind string, content binary, media_ref string"
    )
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(25).alias("frames"),
            F.lit(16000).alias("sample_rate"),
            F.lit("application/octet-stream").alias("mime"),
        ),
    )


def test_extract_features_decodes_real_bytes_and_isolates_errors(media):
    out = {r["media_id"]: r for r in M.extract_features(media).collect()}
    # real PNG parse: geometry + exact pixel sum from the decoded bytes
    assert (out[0]["width"], out[0]["height"], out[0]["n_units"]) == (8, 4, 32)
    assert out[0]["value_sum"] == sum((i * 7 + 3) % 256 for i in range(32))
    assert out[0]["decode_error"] is None
    # video container: 25 decoded frames, per-frame-seeded pixels
    assert (out[1]["n_frames"], out[1]["n_units"]) == (25, 25 * 30)
    assert out[1]["value_sum"] == sum(
        (i * 7 + 9 + f) % 256 for f in range(25) for i in range(30)
    )
    # WAV chunk walk: rate + sample count + abs-amplitude sum
    assert (out[3]["sample_rate"], out[3]["n_units"]) == (16000, 100)
    assert out[3]["value_sum"] == sum(
        abs(((i * 13 + 7) % 201) - 100) for i in range(100)
    )
    # empty / corrupt content fails THAT ROW only, as data
    assert out[2]["value_sum"] is None
    assert "empty media content" in out[2]["decode_error"]
    assert out[4]["value_sum"] is None and out[4]["decode_error"]


def test_sample_frames_fanout(media):
    rows = M.sample_frames(media, every_n=10).collect()
    got = {(r["media_id"], r["frame_index"]) for r in rows}
    # only the video row fans out; frames 0,10,20 of 25
    assert got == {(1, 0), (1, 10), (1, 20)}


def test_generate_media_metadata_only_parity(spark):
    # include_content=False must change ONLY the content column (NULL):
    # ids, kinds, refs and the whole meta struct stay byte-identical —
    # the m02 contract (frame sampling from metadata, no codec work)
    ids = spark.range(0, 12).select(F.col("id").alias("media_id"))
    full = {r["media_id"]: r for r in M.generate_media(ids).collect()}
    lean = {
        r["media_id"]: r
        for r in M.generate_media(ids, include_content=False).collect()
    }
    assert full.keys() == lean.keys()
    for mid, fr in full.items():
        lr = lean[mid]
        assert lr["content"] is None
        assert fr["content"] is not None
        for col in ("kind", "media_ref", "meta"):
            assert fr[col] == lr[col], (mid, col)
    # and the m02 shape itself: identical fan-out from either frame
    fan_full = {
        (r["media_id"], r["frame_index"])
        for r in M.sample_frames(M.generate_media(ids)).collect()
    }
    fan_lean = {
        (r["media_id"], r["frame_index"])
        for r in M.sample_frames(
            M.generate_media(ids, include_content=False)
        ).collect()
    }
    assert fan_full == fan_lean and fan_lean


def test_size_class_partitioning_preserves_rows(media):
    out = M.size_class_partitioned(media, num_partitions=4)
    assert out.count() == 5
    assert set(out.columns) == set(media.columns)


def test_simhash_neardup_pairs_semantics(spark):
    from kpipe_spark.functions.dedup import simhash_neardup_pairs

    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the fire"),
        (1, "the quick brown fox jumps over the lazy dog near the fire"),
        (2, "completely different text about spark catalyst and shuffles"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_neardup_pairs(docs).collect()}
    assert pairs.get((0, 1)) == 0  # identical docs: distance 0
    assert not any(2 in k for k in pairs)  # unrelated doc pairs with no one


def test_simhash_neardup_runs_on_corpus(spark):
    out = all_queries()["d15_simhash_neardup"].build(spark, SF).collect()
    for r in out:
        assert r["hamming"] <= 3 and r["id_a"] < r["id_b"]


def test_mllib_minhash_join_finds_duplicates(spark, tmp_path):
    """The MLlib path (d23) must agree with the custom path on the
    basics: identical docs collide at distance 0, unrelated don't."""
    import shutil

    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the fire", "en", "a", 1),
        (1, "the quick brown fox jumps over the lazy dog near the fire", "en", "a", 1),
        (2, "totally unrelated words about catalyst shuffles and parquet", "en", "a", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/documents.parquet")
    out = all_queries()["d23_mllib_minhash_join"].build(spark, sf_dir).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard_dist"] for r in out}
    assert pairs.get((0, 1)) == 0.0
    assert not any(2 in k for k in pairs)
    shutil.rmtree(sf_dir, ignore_errors=True)


def test_bpe_train_classic_corpus(spark):
    """Sennrich toy corpus: most frequent pair merges first, ranks are
    deterministic via (weight desc, pair asc)."""
    from kpipe_spark.functions import bpe

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rules = bpe.train_bpe(df, num_merges=5)
    assert [(r[1], r[2]) for r in rules] == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
    ]
    assert [r[3] for r in rules] == [9, 9, 9, 7, 7]


def test_bpe_apply_respects_merges_and_order(spark):
    """apply_bpe tokenizes with learned rules; token order follows word
    order (positional sort, not collect_list arrival order)."""
    from kpipe_spark.functions import bpe

    train = spark.createDataFrame(
        [(1, " ".join(["ab"] * 10))], ["doc_id", "text"]
    )
    rules = bpe.train_bpe(train, num_merges=2)
    test = spark.createDataFrame([(7, "ab ab cd")], ["doc_id", "text"])
    toks = bpe.apply_bpe(test, rules).collect()[0]["bpe_tokens"]
    assert toks == ["ab</w>", "ab</w>", "c", "d", "</w>"]


def test_ivf_kmeans_recall_vs_brute_force(spark):
    """Trained-centroid IVF must recover a decent fraction of the true
    top-5 on the real embeddings table."""
    from kpipe_spark.functions import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = emb.select("vec_id", S.as_double_array("embedding").alias("_e"))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    cents = S.kmeans_centroids(v, "_e", k=8, seed=42, max_iter=5)
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("_e").alias("_qe")
    )
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_topk(v, q, cents, nprobe=3, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF-kmeans recall collapsed: {recall}"


def test_ivf_lloyd_recall_and_determinism(spark):
    """d27's trained path since round 11: the integer-exact fixed-point
    Lloyd must (a) keep a decent recall floor vs brute force and
    (b) train BIT-IDENTICAL centroids across runs — the property MLlib
    KMeans lacks (float partial-agg order) and the reason d27 is now
    oracle-gradeable."""
    from kpipe_spark.functions import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = emb.select("vec_id", S.as_double_array("embedding").alias("_e"))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    cents = S.lloyd_centroids_int(v, "_e", "vec_id", k=8, iters=5)
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("_e").alias("_qe")
    )
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_topk(v, q, cents, nprobe=3, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF-lloyd recall collapsed: {recall}"
    again = S.lloyd_centroids_int(v, "_e", "vec_id", k=8, iters=5)
    assert sorted(map(tuple, cents.collect())) == sorted(
        map(tuple, again.collect())
    ), "integer-exact training must be bit-identical run to run"


def test_semdedup_pairs_subset_of_brute_force(spark):
    """d37's within-cluster dup pairs must be exactly a subset of the
    brute-force >=0.35 cosine pairs (d11): clustering prunes candidates,
    it never invents similarity. Also asserts the op finds something."""
    from kpipe_spark.queries import all_queries

    qs = all_queries()
    sem = qs["d37_semdedup_clusters"].build(spark, SF).collect()
    brute = {
        (r["id_a"], r["id_b"])
        for r in qs["d11_embedding_neardup"].build(spark, SF).collect()
    }
    assert len(sem) > 0
    for r in sem:
        assert (r["dup_of"], r["vec_id"]) in brute, (
            f"semdedup flagged ({r['dup_of']},{r['vec_id']}) "
            "not present in brute-force pairs"
        )


def test_semdedup_mllib_variant_subset_of_brute_force(spark):
    """The non-registry trained-KMeans SemDeDup variant obeys the same
    subset property (its clustering differs, its flagged pairs must
    still all be real >=0.35 cosine pairs)."""
    from kpipe_spark.queries import all_queries
    from kpipe_spark.queries.llm_ops6 import semdedup_mllib_pairs

    qs = all_queries()
    brute = {
        (r["id_a"], r["id_b"])
        for r in qs["d11_embedding_neardup"].build(spark, SF).collect()
    }
    sem = semdedup_mllib_pairs(spark, SF).collect()
    assert len(sem) > 0
    for r in sem:
        assert (r["dup_of"], r["vec_id"]) in brute


def test_incremental_dedup_agrees_with_full_recompute(spark):
    """d54's batch-vs-index candidates must be EXACTLY the subset of a
    full-corpus recompute's candidate pairs that touch a new doc — the
    invariant that makes the stored band index a safe substitute for
    re-scanning the corpus."""
    from kpipe_spark.functions import dedup as D

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    is_new = F.col("doc_id") % 4 == 0
    corpus_bands = D.minhash_bands_df(
        D.minhash_signature_df(docs.filter(~is_new))
    )
    partners = {
        (min(r["id_new"], r["id_other"]), max(r["id_new"], r["id_other"]))
        for r in D.incremental_minhash_partners(
            docs.filter(is_new), corpus_bands
        ).collect()
    }
    full = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_candidates(docs).collect()
        if r["id_a"] % 4 == 0 or r["id_b"] % 4 == 0
    }
    assert partners == full


def test_audio_frame_energy_sums_to_whole_file_energy(spark):
    """m05's per-frame energies must re-total to m03's whole-file
    abs-amplitude sum per media id (frame slicing loses nothing), and
    every frame but the last must be full."""
    from kpipe_spark.functions import multimodal as M
    from kpipe_spark.queries.llm_ops2 import media_frame

    media = media_frame(spark, SF).filter(F.col("kind") == "audio").limit(40)
    media.persist()
    try:
        frames = M.audio_frame_energy(media, frame_size=64).collect()
        whole = {
            r["media_id"]: r["value_sum"]
            for r in M.extract_features(media).collect()
        }
    finally:
        media.unpersist()
    by_media: dict[int, list] = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(whole)
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r["frame_idx"])
        assert sum(r["energy"] for r in rows) == whole[mid]
        assert all(r["n_samples"] == 64 for r in rows[:-1])
        assert 1 <= rows[-1]["n_samples"] <= 64


def test_image_patch_stats_retotal_to_whole_image(spark):
    """m06's per-patch pixel sums must re-total to m03's whole-image
    value_sum per media id, with clipped edge patches tiling the full
    raster exactly once."""
    from kpipe_spark.functions import multimodal as M
    from kpipe_spark.queries.llm_ops2 import media_frame

    media = media_frame(spark, SF).filter(F.col("kind") == "image").limit(30)
    media.persist()
    try:
        patches = M.image_patch_stats(media, patch=14).collect()
        whole = {
            r["media_id"]: (r["width"], r["height"], r["value_sum"])
            for r in M.extract_features(media).collect()
        }
    finally:
        media.unpersist()
    by_media: dict[int, list] = {}
    for r in patches:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(whole)
    for mid, rows in by_media.items():
        w, h, total = whole[mid]
        assert sum(r["pixel_sum"] for r in rows) == total
        assert sum(r["patch_h"] * r["patch_w"] for r in rows) == w * h


def test_degenerate_documents_dont_poison_dedup(spark):
    """Null/empty/whitespace text must not create bogus dup structure:
    null never merges in exact dedup (md5(null) is null, not a key),
    degenerate docs never enter minhash/simhash candidacy (they would
    all share one bucket -> a quadratic mega-bucket of unrelated rows),
    and quality/token scores treat them as contentless, not perfect."""
    from kpipe_spark.functions.dedup import (
        exact_dedup,
        minhash_candidates,
        simhash_neardup_pairs,
    )
    from kpipe_spark.functions.text import quality_score, token_count

    docs = spark.createDataFrame(
        [(0, "real content words here"), (1, None), (2, ""), (3, "   "),
         (4, None), (5, "real content words here")],
        "doc_id bigint, text string",
    )
    ed = {r["doc_id"]: r["dup_count"] for r in exact_dedup(docs).collect()}
    assert ed.get(0) == 2          # the two real duplicates merge
    assert 1 not in ed and 4 not in ed  # null-text rows are NOT a group
    # empty and whitespace-only ARE identical (empty) content: one group
    assert ed.get(2) == 2

    cands = minhash_candidates(docs).collect()
    assert {(r["id_a"], r["id_b"]) for r in cands} == {(0, 5)}
    sims = simhash_neardup_pairs(docs).collect()
    assert {(r["id_a"], r["id_b"]) for r in sims} == {(0, 5)}

    scores = {
        r["doc_id"]: (r["q"], r["n"])
        for r in docs.select(
            "doc_id",
            quality_score("text").alias("q"),
            token_count("text").alias("n"),
        ).collect()
    }
    assert scores[1] == (0.0, None) or scores[1][0] == 0.0  # null text
    assert scores[2][1] == 0 and scores[3][1] == 0  # no phantom token
    assert scores[2][0] < scores[0][0]  # empty never outranks content


def test_zero_norm_vector_never_ranks_in_topk(spark):
    """A zero embedding (failed embed run) must not become anyone's
    neighbor: cosine returns NULL for zero norms, and NULL sorts last
    under desc() — where NaN (0/0) would sort FIRST and displace a
    real neighbor in every top-k window."""
    from kpipe_spark.functions.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0]), (4, [0.5, 0.5])],
        "vec_id bigint, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(1, [1.0, 0.0])], "query_id bigint, embedding array<double>"
    )
    out = brute_force_topk(corpus, q, k=2, query_id_col="query_id")
    neighbors = [r["neighbor_id"] for r in sorted(out.collect(), key=lambda r: r["rn"])]
    assert neighbors == [2, 4]  # the zero vector is ranked by nobody


def test_star_expansion_same_components(spark):
    """minhash_candidates(expand='star') emits at most m-1 pairs per
    bucket instead of C(m,2) — the hot-bucket (boilerplate spam)
    survival shape — while the connected components of the candidate
    graph are IDENTICAL to all-pairs expansion: within a bucket every
    id links to the same hub, so any all-pairs edge (x, y) is the
    2-path x-hub-y in star form."""
    from kpipe_spark.functions.dedup import (
        connected_components,
        minhash_candidates,
    )

    spam = "buy cheap widgets now best price free shipping act today"
    rows = [(i, spam) for i in range(12)]  # a hot bucket: 12 identical
    rows += [
        (20, "the quick brown fox jumps over the lazy dog at dawn"),
        (21, "the quick brown fox jumps over the lazy dog at dusk"),
        (30, "completely unrelated content about distributed join plans"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    full = minhash_candidates(df)
    star = minhash_candidates(df, expand="star")
    n_full, n_star = full.count(), star.count()
    # 12 identical docs alone: C(12,2)=66 all-pairs vs 11 star edges
    assert n_star < n_full
    assert n_full >= 66
    assert n_star <= 11 + 5  # star edges + the fox near-dup linkage

    def comps(pairs):
        return {
            (r["id"], r["cluster_id"])
            for r in connected_components(pairs).collect()
        }

    assert comps(star) == comps(full)
    # and the spam clique is one component rooted at its min id
    spam_comp = {c for i, c in comps(star) if i < 12}
    assert spam_comp == {0}
