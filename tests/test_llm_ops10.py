"""Semantic invariants for the corpus-assembly ops (llm_ops10) beyond
the DuckDB oracle equality the shared oracle suite already checks:
budget admission bounds, shard completeness, funnel monotonicity,
priority ordering, and modality-split accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from kpipe_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_d57_budget_admission_bounds(spark):
    """Greedy admission must reach the budget and overshoot by at most
    one document (the last admitted one)."""
    res = (
        all_queries()["d57_token_budget_selection"]
        .build(spark, SF)
        .agg(F.sum("admitted_tokens").alias("adm"))
        .collect()[0]
    )
    from kpipe_spark.functions.text import token_count

    # same ''-filtered denomination d57 budgets in (round-4 change)
    toks = _docs(spark).select(token_count("text").cast("long").alias("n"))
    row = toks.agg(
        F.sum("n").alias("total"), F.max("n").alias("max_doc")
    ).collect()[0]
    budget = int(row["total"] * 0.25)
    assert budget <= res["adm"] <= budget + row["max_doc"]


def test_d58_shards_partition_the_corpus(spark):
    """Every document lands in exactly one of the 8 shards; totals
    reconcile with the corpus."""
    rows = all_queries()["d58_shard_plan"].build(spark, SF).collect()
    assert sorted(r["shard"] for r in rows) == list(range(8))
    n_docs = _docs(spark).count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    # shares sum to ~1 (round4 per shard)
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-3


def test_d59_winner_always_higher_priority(spark):
    """The surviving copy must come from a source with a lower-or-equal
    index than every copy it shadows (lower index = more trusted)."""
    rows = (
        all_queries()["d59_priority_source_dedup"].build(spark, SF).collect()
    )
    assert rows, "fixture must contain cross-source duplicate content"
    for r in rows:
        w = int(r["winner_source"].removeprefix("src"))
        l = int(r["loser_source"].removeprefix("src"))
        assert w <= l


def test_d60_funnel_is_monotone(spark):
    """Each stage can only remove documents/tokens, and stage 0 is the
    whole corpus."""
    rows = sorted(
        all_queries()["d60_curation_funnel"].build(spark, SF).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["stage_name"] for r in rows] == [
        "raw", "lang_en", "gopher_gate", "exact_dedup", "near_dedup",
    ]
    assert rows[0]["n_docs"] == _docs(spark).count()
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs"] <= a["n_docs"]
        assert b["n_tokens"] <= a["n_tokens"]


def test_m07_packing_accounts_every_doc_and_token(spark):
    """Sequences partition the corpus: sample counts sum to the doc
    count, token sums split exactly into text + image."""
    df = all_queries()["m07_multimodal_packing"].build(spark, SF)
    rows = df.collect()
    assert sum(r["n_samples"] for r in rows) == _docs(spark).count()
    for r in rows:
        assert r["total_tokens"] == r["text_tokens"] + r["image_tokens"]
    # only every-third doc carries an image, so text must dominate
    # somewhere and image tokens must be present overall
    assert sum(r["image_tokens"] for r in rows) > 0


# ---- two-phase budget_select equivalence (randomized) ----

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from kpipe_spark.functions.selection import budget_select  # noqa: E402


def _greedy_reference(rows, budget):
    """Plain-Python global greedy scan: admit in (bucket desc, id asc)
    order while the weight admitted BEFORE the row is < budget."""
    admitted, acc = set(), 0
    for rid, bucket, w in sorted(rows, key=lambda r: (-r[1], r[0])):
        if acc < budget:
            admitted.add(rid)
        acc += w or 0  # NULL weight = zero weight (budget_select contract)
    return admitted


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # bucket: forces ties
            # weight: 0 = empty doc; None = null weight (must behave as 0,
            # not silently drop the whole bucket — round-3 ADVICE)
            st.one_of(st.none(), st.integers(min_value=0, max_value=50)),
        ),
        min_size=1,
        max_size=40,
    ),
    budget_frac=st.floats(min_value=0.0, max_value=1.2),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_budget_select_matches_global_greedy(spark, rows, budget_frac):
    """The two-phase histogram shape must reproduce the global ordered
    scan exactly — including all-tied buckets, zero weights, budget 0
    and budget > total."""
    data = [(i, b, w) for i, (b, w) in enumerate(rows)]
    total = sum(w or 0 for _, _, w in data)
    budget = int(total * budget_frac)
    df = spark.createDataFrame(data, "doc_id long, bucket long, w long")
    got = {
        r["doc_id"]
        for r in budget_select(
            df, F.col("bucket"), F.col("w"), F.lit(budget)
        ).collect()
    }
    assert got == _greedy_reference(data, budget)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),  # partition key
            st.integers(min_value=0, max_value=300),  # order key (doc id)
            st.one_of(st.none(), st.integers(min_value=0, max_value=40)),
        ),
        min_size=1,
        max_size=50,
        unique_by=lambda r: (r[0], r[1]),  # order key unique per part
    ),
    width=st.sampled_from([1, 4, 64]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ranged_prefix_sum_property(spark, rows, width):
    """Hypothesis form of the packing prefix-sum equivalence: for any
    partitioned integer-keyed rows with optional NULL weights and any
    range width (incl. width=1: every row its own range), the
    two-phase result equals the per-partition exclusive running sum."""
    from kpipe_spark.functions.prefix import ranged_prefix_sum

    df = spark.createDataFrame(rows, "src string, doc_id long, w long")
    got = {
        (r["src"], r["doc_id"]): r["_before"]
        for r in ranged_prefix_sum(
            df, ["src"], "doc_id", F.col("w"), range_width=width
        ).collect()
    }
    expect = {}
    for src in {r[0] for r in rows}:
        acc = 0
        for _, did, w in sorted(r for r in rows if r[0] == src):
            expect[(src, did)] = acc
            acc += w or 0
    assert got == expect
