"""Sketch primitives (d96 CMS, d97 Bloom gate): the two guarantees
that define the sketches, asserted directly — the oracle compare
proves cross-engine equality, these prove the MATH is right."""

from __future__ import annotations

from pyspark.sql import functions as F

from kpipe_spark.queries import all_queries

SF_SMALL = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


def test_cms_never_underestimates(spark):
    """The count-min guarantee: estimate >= exact count, always — an
    underestimate would mean a lane missed an occurrence (broken
    hashing), the one failure mode the sketch cannot have."""
    rows = (
        all_queries()["d96_cms_heavy_hitters"]
        .build(spark, SF_MID)
        .collect()
    )
    assert rows
    for r in rows:
        assert r["cms_estimate"] >= r["exact_count"], r
        assert r["overestimate"] == r["cms_estimate"] - r["exact_count"]


def test_cms_estimates_track_exact_on_heavy_hitters(spark):
    """With 4 lanes x 1024 cells over a ~31-token vocabulary, heavy
    hitters should be estimated nearly exactly (collision mass is
    tiny) — a sanity bound that the sketch is sized sensibly, not
    just safely."""
    rows = (
        all_queries()["d96_cms_heavy_hitters"]
        .build(spark, SF_MID)
        .collect()
    )
    worst = max(r["overestimate"] / r["exact_count"] for r in rows)
    assert worst < 0.5, [
        (r["token"], r["exact_count"], r["cms_estimate"]) for r in rows
    ]


def test_bloom_gate_has_no_false_negatives(spark):
    """Bloom's defining property: every exact duplicate is
    Bloom-positive (its corpus twin set exactly the bits it probes);
    false POSITIVES are allowed and flagged, false negatives never."""
    rows = (
        all_queries()["d97_bloom_dedup_gate"]
        .build(spark, SF_MID)
        .collect()
    )
    assert rows
    for r in rows:
        if r["exact_dup"] == 1:
            assert r["bloom_positive"] == 1, r
        assert r["false_positive"] == int(
            r["bloom_positive"] == 1 and r["exact_dup"] == 0
        )


def test_bloom_gate_flags_planted_duplicate(spark):
    """End-to-end on a corpus with a PLANTED cross-side duplicate
    (the sf fixtures may put dup twins on one side of the id%4
    split): the batch copy of a corpus doc must gate positive and
    exact, a novel doc must carry exact_dup=0."""
    import uuid

    from kpipe_spark.queries import QUERIES

    docs = spark.createDataFrame(
        [
            (1, "the corpus copy of a shared document body"),
            (2, "entirely different corpus content here"),
            (4, "the corpus copy of a shared document body"),  # batch twin
            (8, "a genuinely novel arriving document"),
        ],
        "doc_id bigint, text string",
    )
    path = f"/tmp/bloom-gate-{uuid.uuid4().hex[:8]}"
    docs.write.mode("overwrite").parquet(f"{path}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in QUERIES["d97_bloom_dedup_gate"].build(spark, path).collect()
    }
    assert out[4]["exact_dup"] == 1 and out[4]["bloom_positive"] == 1
    assert out[8]["exact_dup"] == 0


def test_hll_estimate_within_theory_bounds(spark):
    """HLL with m=256 registers has standard error 1.04/sqrt(m) ≈ 6.5%;
    the estimate must land within ~4σ of the exact distinct count on
    both fixture sizes, and the register count can never exceed m or
    the exact count."""
    for sf in (SF_SMALL, SF_MID):
        row = (
            all_queries()["d98_hll_distinct_tokens"]
            .build(spark, sf)
            .collect()[0]
        )
        assert 0 < row["n_registers_hit"] <= min(256, row["n_exact"])
        assert abs(row["rel_error"]) < 0.26, row
        assert abs(row["hll_estimate"] - row["n_exact"]) <= (
            0.26 * row["n_exact"]
        )


def test_hll_registers_merge_by_pairwise_max(spark):
    """The 100 TB merge story: registers of a UNION of corpora equal
    the pairwise max of per-corpus registers — deterministic md5 lanes
    make this exact, so shard/micro-batch HLLs combine without
    re-reading data."""
    from kpipe_spark.catalog import load_tables
    from kpipe_spark.functions.sketches import md5_lane
    from kpipe_spark.functions import text as T

    docs = load_tables(spark, SF_SMALL).documents
    content = F.col("text").isNotNull() & F.col("text").rlike(r"\S")

    def regs(frame):
        tok = frame.filter(content).select(
            F.explode(T.tokens("text")).alias("t")
        ).distinct()
        hashed = tok.select(
            md5_lane(F.col("t"), 0, 256).alias("bucket"),
            md5_lane(F.col("t"), 1, 1 << 32).alias("x"),
        )
        rho = F.when(F.col("x") == 0, F.lit(33)).otherwise(
            F.lit(33) - F.length(F.bin("x"))
        )
        return {
            r["bucket"]: r["mrho"]
            for r in hashed.select("bucket", rho.alias("rho"))
            .groupBy("bucket")
            .agg(F.max("rho").alias("mrho"))
            .collect()
        }

    a = regs(docs.filter("doc_id % 2 = 0"))
    b = regs(docs.filter("doc_id % 2 = 1"))
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert merged == regs(docs)


def test_weighted_reservoir_prefers_high_quality(spark):
    """A-ES sample properties: exactly k rows, no zero-weight docs,
    deterministic across runs, and the quality²-weighted sample's mean
    quality exceeds the eligible corpus mean (the point of weighting)."""
    from kpipe_spark.catalog import load_tables
    from kpipe_spark.functions.text import quality_score

    q = all_queries()["d99_weighted_reservoir_sample"]
    s1 = q.build(spark, SF_MID).collect()
    s2 = q.build(spark, SF_MID).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    assert len(s1) == 100
    assert all(r["quality"] > 0 for r in s1)
    docs = load_tables(spark, SF_MID).documents
    corpus_mean = (
        docs.select(quality_score("text").alias("q"))
        .filter("q > 0")
        .agg(F.avg("q"))
        .collect()[0][0]
    )
    sample_mean = sum(r["quality"] for r in s1) / len(s1)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)
