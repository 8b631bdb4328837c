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
