"""ClusterIndex: the stored near-dup component artifact.

The contract is dual-form equivalence — every consumer report computed
from the STORED component table must equal the registered (graded,
self-contained) query's result — plus the serving-shape property that
makes it the 100 TB path: consumers broadcast the dup-graph-sized
stored table onto one corpus scan, never re-deriving the MinHash ->
components subtree."""

from __future__ import annotations

import uuid

import pytest

from kpipe_spark.functions.cluster_index import ClusterIndex
from kpipe_spark.functions.dedup_reports import CONSUMERS

SF = "/root/testdata/sf0.001"

SPAM = "identical boilerplate text repeated across the corpus every day"
FOX = "the quick brown fox jumps over the lazy dog at dawn today"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture
def corpus(spark):
    # 100/103 duplicate SPAM, 101/104 near-duplicate FOX, 102 singleton
    return _df(
        spark,
        [
            (100, SPAM),
            (101, FOX),
            (102, "completely unrelated prose about stored artifacts"),
            (103, SPAM),
            (104, FOX + " again"),
        ],
    )


def test_build_matches_inline_components(spark, corpus):
    from kpipe_spark.functions.dedup import dup_components

    table = f"clusters_{uuid.uuid4().hex[:8]}"
    idx = ClusterIndex.build(spark, corpus, table)
    try:
        stored = sorted(map(tuple, idx.components_df.collect()))
        inline = sorted(map(tuple, dup_components(corpus).collect()))
        assert stored == inline
        assert len(stored) >= 2  # the SPAM pair at minimum
    finally:
        idx.drop()


def test_assignments_and_survivors(spark, corpus):
    from kpipe_spark.functions.dedup import dup_clusters

    table = f"clusters_{uuid.uuid4().hex[:8]}"
    idx = ClusterIndex.build(spark, corpus, table)
    try:
        got = sorted(map(tuple, idx.assignments(corpus).collect()))
        want = sorted(map(tuple, dup_clusters(corpus).collect()))
        assert got == want

        surv = idx.survivors(corpus)
        # all input columns pass through, cluster_id does not leak
        assert surv.columns == corpus.columns
        kept = {r["doc_id"] for r in surv.collect()}
        canon = {
            r["doc_id"]
            for r in idx.assignments(corpus).collect()
            if r["is_canonical"]
        }
        assert kept == canon
        assert 100 in kept and 103 not in kept  # SPAM keeps min id
    finally:
        idx.drop()


def test_consumer_reports_match_graded_queries(spark):
    """The headline dual-form property, on the real sf0.001 corpus:
    all five registered component consumers produce IDENTICAL results
    when fed the stored artifact instead of the inline derivation."""
    from kpipe_spark.catalog import load_tables
    from kpipe_spark.queries import all_queries

    docs = load_tables(spark, SF).documents
    table = f"clusters_{uuid.uuid4().hex[:8]}"
    idx = ClusterIndex.build(spark, docs, table)
    try:
        q = all_queries()
        for name, consumer in CONSUMERS.items():
            graded = sorted(
                map(tuple, q[name].build(spark, SF).collect()), key=repr
            )
            stored = sorted(
                map(tuple, consumer(docs, idx.components_df).collect()),
                key=repr,
            )
            assert stored == graded, f"{name} diverges from stored form"
            assert len(stored) > 0, f"{name} returned no rows"
    finally:
        idx.drop()


def test_consumer_join_broadcasts_stored_components(spark, corpus):
    """Serving-shape pin: a consumer fed the stored table plans a
    BroadcastHashJoin (the dup-graph side ships to every task; the
    corpus scan is never re-partitioned for the join)."""
    table = f"clusters_{uuid.uuid4().hex[:8]}"
    idx = ClusterIndex.build(spark, corpus, table)
    try:
        out = idx.assignments(corpus)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
    finally:
        idx.drop()


def test_refresh_sees_cluster_merges(spark, corpus):
    """Components are global: a NEW document can merge two previously
    distinct clusters, which is why the artifact offers refresh (full
    re-derivation) and deliberately no per-batch append."""
    table = f"clusters_{uuid.uuid4().hex[:8]}"
    idx = ClusterIndex.build(spark, corpus, table)
    try:
        before = {
            r["doc_id"]: r["cluster_id"]
            for r in idx.components_df.collect()
        }
        # 105 duplicates SPAM: joins 100/103's cluster, min id unchanged
        grown = corpus.union(_df(spark, [(105, SPAM)]))
        idx.refresh(grown)
        after = {
            r["doc_id"]: r["cluster_id"]
            for r in idx.components_df.collect()
        }
        assert 105 not in before and after[105] == 100
        assert set(before).issubset(set(after))
    finally:
        idx.drop()


def test_attach_validates_family(spark, corpus):
    table = f"clusters_{uuid.uuid4().hex[:8]}"
    idx = ClusterIndex.build(spark, corpus, table)
    try:
        # adopts the stored family when none is passed
        att = ClusterIndex.attach(spark, table)
        assert (att.num_hashes, att.bands, att.shingle_k) == (
            idx.num_hashes,
            idx.bands,
            idx.shingle_k,
        )
        with pytest.raises(ValueError, match="MinHash family mismatch"):
            ClusterIndex.attach(spark, table, bands=idx.bands + 1)
        with pytest.raises(ValueError, match="no such cluster index"):
            ClusterIndex.attach(spark, f"absent_{uuid.uuid4().hex[:8]}")
    finally:
        idx.drop()
