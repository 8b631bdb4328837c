"""BloomGate stored artifact: lifecycle (the CorpusIndex/AnnIndex
discipline), the no-false-negatives guarantee against the STORED
table, per-micro-batch maintenance idempotent on batchId, and the
crash-window set-union safety the docstring promises."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from kpipe_spark.functions.sketches import BloomGate

# Round-14 suite tiering: this module is in the SLOW tier (excluded from
# the driver's default `pytest tests/ -q` run by addopts; run with -m slow).
# See pyproject.toml [tool.pytest.ini_options] for the rationale.
pytestmark = pytest.mark.slow



def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture()
def corpus(spark):
    return _docs(
        spark,
        [(i, f"corpus document number {i} alpha beta") for i in range(40)]
        + [(99, None)],  # contentless: sets no bits
    )


def test_bloom_gate_lifecycle(spark, corpus):
    """build persists the bit table + geometry TBLPROPERTIES; attach
    round-trips and rejects a geometry mismatch; drop leaves no
    warehouse orphan."""
    import os
    import urllib.parse

    table = f"bloom_gate_{uuid.uuid4().hex[:8]}"
    gate = BloomGate.build(spark, corpus, table)
    try:
        assert 0 < gate.n_bits_set() <= 40 * gate.k
        att = BloomGate.attach(spark, table)
        assert (att.m, att.k) == (gate.m, gate.k)
        assert att.last_batch_id() == -1
        with pytest.raises(ValueError, match="geometry mismatch"):
            BloomGate.attach(spark, table, m=1 << 10)
        with pytest.raises(ValueError, match="no such bloom-gate"):
            BloomGate.attach(spark, f"{table}_missing")
    finally:
        gate.drop()
    wh = urllib.parse.urlparse(
        spark.conf.get("spark.sql.warehouse.dir")
    ).path
    assert not spark.catalog.tableExists(table)
    assert not os.path.exists(os.path.join(wh, table))


def test_bloom_gate_no_false_negatives(spark, corpus):
    """Every corpus document probes positive against the stored gate —
    the guarantee the admission shortcut rests on (a negative may skip
    the dup-resolution join only because it can never be a dup)."""
    table = f"bloom_nfn_{uuid.uuid4().hex[:8]}"
    gate = BloomGate.build(spark, corpus, table)
    try:
        out = gate.probe(corpus)
        assert out.count() == 40  # the NULL-text doc has no fingerprint
        assert out.filter("bloom_positive = 0").count() == 0
    finally:
        gate.drop()


def test_bloom_gate_update_batch_idempotent_on_batch_id(spark, corpus):
    """update_batch applies a new batch once, turns its docs positive,
    and no-ops (False, bit table unchanged) on a replay of the same
    batchId — the foreachBatch at-least-once contract."""
    table = f"bloom_upd_{uuid.uuid4().hex[:8]}"
    gate = BloomGate.build(spark, corpus, table)
    try:
        batch = _docs(
            spark, [(100 + i, f"novel arrival {i} gamma") for i in range(6)]
        )
        # novel docs probe negative before the update
        assert gate.probe(batch).filter("bloom_positive = 1").count() == 0
        assert gate.update_batch(batch, batch_id=0) is True
        assert gate.last_batch_id() == 0
        n_after = gate.n_bits_set()
        assert gate.probe(batch).filter("bloom_positive = 0").count() == 0
        # replay of batch 0: skipped, nothing changes
        assert gate.update_batch(batch, batch_id=0) is False
        assert gate.n_bits_set() == n_after
        assert spark.table(table).count() == n_after
        # geometry survives the append + property rewrite
        att = BloomGate.attach(spark, table)
        assert (att.m, att.k) == (gate.m, gate.k)
    finally:
        gate.drop()


def test_bloom_gate_crash_window_reapply_is_set_union(spark, corpus):
    """The crash between bit append and marker write: the batch
    re-applies (the marker still shows the OLD id), and because only
    genuinely new bits append (anti-join), re-application changes
    nothing — set union is idempotent. Probe verdicts are identical
    either way."""
    table = f"bloom_crash_{uuid.uuid4().hex[:8]}"
    gate = BloomGate.build(spark, corpus, table)
    try:
        batch = _docs(spark, [(200, "crash window doc delta")])
        assert gate.update_batch(batch, batch_id=0) is True
        n_bits = gate.n_bits_set()
        # simulate the lost marker: wind last_batch_id back as if the
        # property write never landed, then replay the same batch
        gate._set_props(last_batch_id=-1)
        assert gate.update_batch(batch, batch_id=0) is True  # re-applies
        assert gate.n_bits_set() == n_bits  # set union: no new bits
        assert spark.table(table).count() == n_bits  # and no dup rows
        assert (
            gate.probe(batch).filter("bloom_positive = 0").count() == 0
        )
    finally:
        gate.drop()


def test_bloom_gate_matches_d97_verdicts(spark):
    """A gate built on d97's corpus split gives the same per-doc
    bloom_positive verdicts as the oracle-graded d97 query — the
    artifact is the API form of the query shape (the AnnIndex≡d88 /
    UnigramTokenizer≡d90 discipline)."""
    from kpipe_spark.catalog import load_tables
    from kpipe_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    docs = load_tables(spark, sf).documents
    table = f"bloom_d97_{uuid.uuid4().hex[:8]}"
    gate = BloomGate.build(
        spark, docs.filter(F.col("doc_id") % 4 != 0), table
    )
    try:
        mine = {
            r["doc_id"]: r["bloom_positive"]
            for r in gate.probe(
                docs.filter(F.col("doc_id") % 4 == 0)
            ).collect()
        }
        d97 = {
            r["doc_id"]: r["bloom_positive"]
            for r in all_queries()["d97_bloom_dedup_gate"]
            .build(spark, sf)
            .collect()
        }
        assert mine == d97
    finally:
        gate.drop()


def test_bloom_gate_band_keys_front_door(spark):
    """The band-key gate in front of CorpusIndex: collisions happen
    exactly on band-key equality, so a batch doc whose EVERY key
    probes negative must show n_corpus_dups = 0 in the full admission
    ledger (per-key no-false-negatives lifts to per-doc) — the
    verdict that lets novel docs skip the stored index at scale."""
    from kpipe_spark.catalog import load_tables
    from kpipe_spark.functions.corpus_index import CorpusIndex

    docs = load_tables(spark, "/root/testdata/sf0.001").documents
    is_new = F.col("doc_id") % 4 == 0
    stem = f"bloom_band_{uuid.uuid4().hex[:8]}"
    idx = CorpusIndex.build(
        spark,
        docs.filter(~is_new).select("doc_id", "text"),
        stem,
        num_buckets=8,
    )
    gate = BloomGate.build_from_keys(spark, idx.band_keys(), f"{stem}_g")
    try:
        batch = docs.filter(is_new).select("doc_id", "text")
        keys = idx.band_keys(batch)
        doc_gate = (
            keys.join(gate.probe_keys(keys.select("key")), "key")
            .groupBy("doc_id")
            .agg(F.max("bloom_positive").alias("may_collide"))
        )
        cleared = doc_gate.filter("may_collide = 0")
        assert cleared.count() > 0, "fixture has no gate-clearable docs"
        ledger = idx.admit(batch)
        assert (
            ledger.join(cleared, "doc_id", "semi")
            .filter("n_corpus_dups > 0")
            .count()
            == 0
        )
    finally:
        gate.drop()
        idx.drop()


# --- CmsSketch: counter state under at-least-once delivery ----------


def test_cms_sketch_lifecycle_and_d96_parity(spark):
    """build/attach/family-validation/drop, plus the artifact≡query
    discipline: a sketch built on the full corpus answers d96's top-20
    tokens with exactly d96's cms_estimate values."""
    import os
    import urllib.parse

    from kpipe_spark.catalog import load_tables
    from kpipe_spark.functions.sketches import CmsSketch
    from kpipe_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    docs = load_tables(spark, sf).documents
    table = f"cms_sk_{uuid.uuid4().hex[:8]}"
    sk = CmsSketch.build(spark, docs, table)
    try:
        att = CmsSketch.attach(spark, table)
        assert (att.lanes, att.width) == (sk.lanes, sk.width)
        with pytest.raises(ValueError, match="geometry mismatch"):
            CmsSketch.attach(spark, table, width=512)
        d96 = all_queries()["d96_cms_heavy_hitters"].build(spark, sf)
        tokens = d96.select(F.col("token").alias("t"))
        mine = {
            r["t"]: r["cms_estimate"]
            for r in sk.estimate(tokens).collect()
        }
        theirs = {
            r["token"]: r["cms_estimate"] for r in d96.collect()
        }
        assert mine == theirs
        # unseen token estimates 0 (never-counted cells read 0)
        ghost = spark.createDataFrame(
            [("zzzzunseenzzzz",)], "t string"
        )
        assert sk.estimate(ghost).collect()[0]["cms_estimate"] == 0
    finally:
        sk.drop()
    wh = urllib.parse.urlparse(
        spark.conf.get("spark.sql.warehouse.dir")
    ).path
    assert not spark.catalog.tableExists(table)
    assert not os.path.exists(os.path.join(wh, table))


def test_cms_sketch_replay_overwrites_not_doubles(spark):
    """THE counter-state property: replaying a micro-batch (same
    batchId — at-least-once's worst case, including the crash window
    no skip-marker can close) must leave every counter EXACTLY as one
    application did, because the delta overwrites its own partition
    instead of adding. A marker-based design would double-count here."""
    from kpipe_spark.functions.sketches import CmsSketch

    base = _docs(spark, [(1, "alpha beta alpha")])
    batch = _docs(spark, [(2, "alpha gamma gamma gamma")])
    table = f"cms_replay_{uuid.uuid4().hex[:8]}"
    sk = CmsSketch.build(spark, base, table)
    try:
        sk.update_batch(batch, batch_id=0)
        probe = spark.createDataFrame(
            [("alpha",), ("beta",), ("gamma",)], "t string"
        )
        once = {
            r["t"]: r["cms_estimate"] for r in sk.estimate(probe).collect()
        }
        # exact on this tiny corpus: no cell collisions at 4x1024
        assert once == {"alpha": 3, "beta": 1, "gamma": 3}
        # worst-case replay: same batch id, twice more
        sk.update_batch(batch, batch_id=0)
        sk.update_batch(batch, batch_id=0)
        again = {
            r["t"]: r["cms_estimate"] for r in sk.estimate(probe).collect()
        }
        assert again == once
        assert sk.applied_batches() == [-1, 0]
        # a DISTINCT batch id does add (it is new data, not a replay)
        sk.update_batch(batch, batch_id=1)
        assert sk.estimate(probe).filter("t = 'gamma'").collect()[0][
            "cms_estimate"
        ] == 6
    finally:
        sk.drop()


def test_cms_sketch_empty_replay_clears_stale_delta(spark):
    """The tombstone rule (the DLQ empty-write discipline): a replay
    whose delta is EMPTY (e.g. the batch's docs were all filtered
    upstream on the second attempt) must CLEAR the pre-crash attempt's
    counters, not leave them stranded — static partition overwrite is
    unconditional."""
    from kpipe_spark.functions.sketches import CmsSketch

    base = _docs(spark, [(1, "alpha")])
    table = f"cms_tomb_{uuid.uuid4().hex[:8]}"
    sk = CmsSketch.build(spark, base, table)
    try:
        sk.update_batch(_docs(spark, [(2, "delta delta")]), batch_id=0)
        probe = spark.createDataFrame([("delta",)], "t string")
        assert sk.estimate(probe).collect()[0]["cms_estimate"] == 2
        # replayed batch 0 now carries no content
        sk.update_batch(_docs(spark, [(2, None)]), batch_id=0)
        assert sk.estimate(probe).collect()[0]["cms_estimate"] == 0
    finally:
        sk.drop()


def test_cms_sketch_compact_merges_history_into_base(spark):
    """compact() collapses every per-batch delta partition into
    batch_id=-1 with IDENTICAL estimates before and after (the merge
    is the same sum serving already computes), preserves the geometry
    TBLPROPERTIES through the rename swap, and leaves no side tables."""
    from kpipe_spark.functions.sketches import CmsSketch

    base = _docs(spark, [(1, "alpha beta alpha")])
    table = f"cms_cpt_{uuid.uuid4().hex[:8]}"
    sk = CmsSketch.build(spark, base, table)
    try:
        sk.update_batch(_docs(spark, [(2, "alpha gamma")]), batch_id=0)
        sk.update_batch(_docs(spark, [(3, "gamma gamma")]), batch_id=1)
        probe = spark.createDataFrame(
            [("alpha",), ("beta",), ("gamma",)], "t string"
        )
        before = {
            r["t"]: r["cms_estimate"] for r in sk.estimate(probe).collect()
        }
        assert before == {"alpha": 3, "beta": 1, "gamma": 3}
        sk.compact()
        assert sk.applied_batches() == [-1]
        after = {
            r["t"]: r["cms_estimate"] for r in sk.estimate(probe).collect()
        }
        assert after == before
        # geometry survives the rewrite: attach validates against it
        att = CmsSketch.attach(spark, table)
        assert (att.lanes, att.width) == (sk.lanes, sk.width)
        # no side table left behind
        assert not spark.catalog.tableExists(f"{table}__compacting")
        # post-compaction NEW batches keep working
        sk.update_batch(_docs(spark, [(4, "beta")]), batch_id=2)
        assert sk.estimate(probe).filter("t = 'beta'").collect()[0][
            "cms_estimate"
        ] == 2
    finally:
        sk.drop()


def test_cms_sketch_compact_resumes_from_surviving_park(spark):
    """Crash recovery: a compact() that died mid INSERT OVERWRITE
    leaves a COMPLETE park (__compacting is only in the catalog if its
    write finished) and a possibly-partial live table. Calling
    compact() again must RESUME the swap from the park — re-deriving
    from the corrupted live table would overwrite the only surviving
    copy (round-9 review finding)."""
    from pyspark.sql import functions as SF

    from kpipe_spark.functions.sketches import CmsSketch

    table = f"cms_rec_{uuid.uuid4().hex[:8]}"
    sk = CmsSketch.build(spark, _docs(spark, [(1, "alpha beta")]), table)
    try:
        sk.update_batch(_docs(spark, [(2, "alpha gamma gamma")]), batch_id=0)
        probe = spark.createDataFrame(
            [("alpha",), ("beta",), ("gamma",)], "t string"
        )
        truth = {
            r["t"]: r["cms_estimate"] for r in sk.estimate(probe).collect()
        }
        assert truth == {"alpha": 2, "beta": 1, "gamma": 2}
        # simulate the crash state: park the merged copy (what a dying
        # compact() had completed) ...
        merged = (
            sk.sketch_df.withColumn("batch_id", SF.lit(-1).cast("long"))
            .localCheckpoint(eager=True)
        )
        merged.write.mode("overwrite").partitionBy("batch_id").saveAsTable(
            f"{table}__compacting", format="parquet"
        )
        # a real compact() records the merged high-water mark on the
        # park right after writing it (the crash under test is mid
        # INSERT OVERWRITE, i.e. after this point)
        spark.sql(
            f"ALTER TABLE {table}__compacting SET TBLPROPERTIES "
            f"('{CmsSketch._PROP_PREFIX}compact_merged_max_batch_id' = '0')"
        )
        # ... then corrupt the live table the way a half-finished
        # whole-table overwrite would (only a fraction of rows left)
        partial = (
            spark.table(table)
            .filter("lane = 0")
            .localCheckpoint(eager=True)
        )
        replacer = spark.newSession()
        replacer.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        partial.createOrReplaceTempView("cms_rec_partial")
        partial.sparkSession.sql(
            f"INSERT OVERWRITE TABLE {table} "
            "SELECT lane, cell, c, batch_id FROM cms_rec_partial"
        )
        spark.sql(f"REFRESH TABLE {table}")
        broken = {
            r["t"]: r["cms_estimate"] for r in sk.estimate(probe).collect()
        }
        assert broken != truth  # live really is corrupt
        # recovery: compact() resumes from the park, not the wreck
        sk.compact()
        recovered = {
            r["t"]: r["cms_estimate"] for r in sk.estimate(probe).collect()
        }
        assert recovered == truth
        assert sk.applied_batches() == [-1]
        assert not spark.catalog.tableExists(f"{table}__compacting")
    finally:
        sk.drop()
        spark.sql(f"DROP TABLE IF EXISTS {table}__compacting")


def test_cms_sketch_compact_recovery_refuses_post_crash_appends(spark):
    """The documented constraint 'resume a crashed compact() BEFORE
    restarting streams' is enforced: if the live table holds batch ids
    NEWER than the park's recorded merged maximum (streams restarted
    after the crash), recovery raises instead of swapping — the swap
    would silently overwrite those deltas (round-9 advice)."""
    import pytest

    from kpipe_spark.functions.sketches import CmsSketch

    table = f"cms_ref_{uuid.uuid4().hex[:8]}"
    sk = CmsSketch.build(spark, _docs(spark, [(1, "alpha beta")]), table)
    try:
        sk.update_batch(_docs(spark, [(2, "alpha gamma")]), batch_id=0)
        # simulate a crashed compact that merged up to batch 0 ...
        from pyspark.sql import functions as SF

        merged = (
            sk.sketch_df.withColumn("batch_id", SF.lit(-1).cast("long"))
            .localCheckpoint(eager=True)
        )
        merged.write.mode("overwrite").partitionBy("batch_id").saveAsTable(
            f"{table}__compacting", format="parquet"
        )
        spark.sql(
            f"ALTER TABLE {table}__compacting SET TBLPROPERTIES "
            f"('{CmsSketch._PROP_PREFIX}compact_merged_max_batch_id' = '0')"
        )
        # ... then an (incorrect) stream restart lands batch 1
        sk.update_batch(_docs(spark, [(3, "delta delta")]), batch_id=1)
        with pytest.raises(RuntimeError, match="newer batch ids \\[1\\]"):
            sk.compact()
        # the refusal left everything in place: park intact, live
        # intact, and the post-crash delta still served
        assert spark.catalog.tableExists(f"{table}__compacting")
        probe = spark.createDataFrame([("delta",)], "t string")
        assert sk.estimate(probe).collect()[0]["cms_estimate"] == 2
        # the message's SAFE fold remedy works (never drop the park —
        # a mid-overwrite crash leaves it as the only complete copy):
        # copy the newer delta partitions into the park, advance its
        # high-water marker, re-run — recovery resumes the swap with
        # batch 1 preserved as its own partition
        park = f"{table}__compacting"
        spark.sql(
            f"INSERT INTO {park} SELECT lane, cell, c, batch_id "
            f"FROM {table} WHERE batch_id > 0"
        )
        spark.sql(
            f"ALTER TABLE {park} SET TBLPROPERTIES "
            f"('{CmsSketch._PROP_PREFIX}compact_merged_max_batch_id' = '1')"
        )
        sk.compact()
        assert sk.applied_batches() == [-1, 1]
        assert sk.estimate(probe).collect()[0]["cms_estimate"] == 2
        # ...and a further compact() folds the carried delta into base
        sk.compact()
        assert sk.applied_batches() == [-1]
        assert sk.estimate(probe).collect()[0]["cms_estimate"] == 2
    finally:
        sk.drop()
        spark.sql(f"DROP TABLE IF EXISTS {table}__compacting")


def test_cms_sketch_compact_recovery_refuses_unmarked_park(spark):
    """A leftover park with NO merged high-water marker (written by
    pre-marker code, or the property write itself lost) is
    undecidable: the batches it merged are unknown, so recovery
    refuses with inspect-first guidance — and must NOT recommend
    dropping the park, which after a mid-overwrite crash is the only
    complete merged copy."""
    import pytest
    from pyspark.sql import functions as SF

    from kpipe_spark.functions.sketches import CmsSketch

    table = f"cms_unm_{uuid.uuid4().hex[:8]}"
    sk = CmsSketch.build(spark, _docs(spark, [(1, "alpha beta")]), table)
    try:
        sk.update_batch(_docs(spark, [(2, "alpha gamma")]), batch_id=0)
        (
            sk.sketch_df.withColumn("batch_id", SF.lit(-1).cast("long"))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .saveAsTable(f"{table}__compacting", format="parquet")
        )  # no high-water TBLPROPERTY — the pre-marker park shape
        with pytest.raises(RuntimeError, match="carries no"):
            sk.compact()
        # refusal is non-destructive: park and live both intact
        assert spark.catalog.tableExists(f"{table}__compacting")
        assert sk.applied_batches() == [-1, 0]
    finally:
        sk.drop()
        spark.sql(f"DROP TABLE IF EXISTS {table}__compacting")


def test_bloom_and_hll_update_from_cloned_session(spark):
    """foreachBatch frames belong to a CLONED session; after an append
    through that session, serving through the artifact's ORIGINAL
    session must see the new state without relying on _set_props'
    incidental cache invalidation (explicit REFRESH TABLE pinned for
    BloomGate and HllSketch the way the CMS fix was)."""
    from kpipe_spark.functions.sketches import BloomGate, HllSketch

    clone = spark.newSession()
    g = BloomGate.build(
        spark,
        _docs(spark, [(1, "alpha")]),
        f"bg_clone_{uuid.uuid4().hex[:8]}",
    )
    try:
        batch = clone.createDataFrame(
            [(2, "totally novel words")], "doc_id bigint, text string"
        )
        n0 = g.n_bits_set()
        assert g.update_batch(batch, batch_id=0) is True
        assert g.n_bits_set() > n0  # original session sees the append
        mine = g.probe(
            _docs(spark, [(2, "totally novel words")])
        ).collect()
        assert mine[0]["bloom_positive"] == 1  # no false negative
    finally:
        g.drop()
    h = HllSketch.build(
        spark,
        _docs(spark, [(1, "alpha beta")]),
        f"hll_clone_{uuid.uuid4().hex[:8]}",
    )
    try:
        e0 = h.distinct_estimate()
        batch = clone.createDataFrame(
            [(2, "gamma delta epsilon zeta")], "doc_id bigint, text string"
        )
        assert h.update_batch(batch, batch_id=0) is True
        assert h.distinct_estimate() > e0
    finally:
        h.drop()


def test_cms_sketch_update_from_cloned_session(spark):
    """foreachBatch hands the sink a DataFrame owned by a CLONED
    session (shared table catalog, PRIVATE temp views + relation
    cache). update_batch must register its delta view and run the
    INSERT on the batch's session — and serving through the sketch's
    original session must see the new counters (round-9 regression:
    the example's streaming path read TABLE_OR_VIEW_NOT_FOUND, then a
    stale relation cache)."""
    from kpipe_spark.functions.sketches import CmsSketch

    table = f"cms_clone_{uuid.uuid4().hex[:8]}"
    sk = CmsSketch.build(spark, _docs(spark, [(1, "alpha")]), table)
    try:
        clone = spark.newSession()
        batch = clone.createDataFrame(
            [(2, "alpha beta beta")], "doc_id bigint, text string"
        )
        sk.update_batch(batch, batch_id=0)
        probe = spark.createDataFrame([("alpha",), ("beta",)], "t string")
        got = {
            r["t"]: r["cms_estimate"] for r in sk.estimate(probe).collect()
        }
        assert got == {"alpha": 2, "beta": 2}
    finally:
        sk.drop()


def test_bloom_gate_sized_for():
    """The classical geometry optimum: ~9.59 bits/key and k=7 at 1%
    FP, k clamped to >= 1, bad inputs rejected — the helper that stops
    the oracle-tuned module default being copied into a real gate."""
    import pytest as _pytest

    from kpipe_spark.functions.sketches import BloomGate

    g = BloomGate.sized_for(1000, 0.01)
    assert g["m"] == 9586  # ceil(1000 * ln(100) / ln(2)^2)
    assert g["k"] == 7  # round(m/n * ln 2)
    # a huge corpus at a loose target still yields a sane k
    assert BloomGate.sized_for(10**9, 0.5)["k"] == 1
    with _pytest.raises(ValueError, match="n_expected"):
        BloomGate.sized_for(0)
    with _pytest.raises(ValueError, match="fp_target"):
        BloomGate.sized_for(1000, 1.5)


# --- HllSketch: max-merge register state -----------------------------


def test_hll_sketch_matches_d98_estimate(spark):
    """Artifact≡query: registers built on the corpus reproduce the
    oracle-graded d98 estimate exactly (same lanes, same integer rho,
    same correction arithmetic)."""
    from kpipe_spark.catalog import load_tables
    from kpipe_spark.functions.sketches import HllSketch
    from kpipe_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    docs = load_tables(spark, sf).documents
    table = f"hll_sk_{uuid.uuid4().hex[:8]}"
    sk = HllSketch.build(spark, docs, table)
    try:
        att = HllSketch.attach(spark, table)
        assert att.m == sk.m
        with pytest.raises(ValueError, match="geometry mismatch"):
            HllSketch.attach(spark, table, m=1024)
        d98 = (
            all_queries()["d98_hll_distinct_tokens"]
            .build(spark, sf)
            .collect()[0]
        )
        import math

        assert (
            math.floor(sk.distinct_estimate() * 10000.0 + 0.5) / 10000.0
            == d98["hll_estimate"]
        )
        assert sk.registers_df.count() == d98["n_registers_hit"]
    finally:
        sk.drop()


def test_hll_sketch_update_merges_by_max_and_survives_replay(spark):
    """Split-build-then-update equals whole-corpus build (the merge
    exactness d98's pytest pins, here via the artifact), and the
    worst-case replay — same batch id re-applied after the skip marker
    is wound back, i.e. the crash window — changes no register,
    because MAX over duplicate appended rows is the same MAX."""
    from kpipe_spark.functions.sketches import HllSketch

    half_a = _docs(
        spark, [(i, f"alpha{i} beta{i} shared") for i in range(20)]
    )
    half_b = _docs(
        spark, [(100 + i, f"gamma{i} shared") for i in range(20)]
    )
    t_inc = f"hll_inc_{uuid.uuid4().hex[:8]}"
    t_full = f"hll_full_{uuid.uuid4().hex[:8]}"
    inc = HllSketch.build(spark, half_a, t_inc)
    full = HllSketch.build(spark, half_a.unionByName(half_b), t_full)
    try:
        assert inc.update_batch(half_b, batch_id=0) is True
        regs = lambda s: {  # noqa: E731
            r["bucket"]: r["mrho"] for r in s.registers_df.collect()
        }
        assert regs(inc) == regs(full)
        assert inc.distinct_estimate() == full.distinct_estimate()
        # replay skipped by marker
        assert inc.update_batch(half_b, batch_id=0) is False
        # crash window: marker lost, batch re-applies — duplicates
        # append but every max is unchanged
        inc._set_props(last_batch_id=-1)
        assert inc.update_batch(half_b, batch_id=0) is True
        assert regs(inc) == regs(full)
        assert inc.distinct_estimate() == full.distinct_estimate()
    finally:
        inc.drop()
        full.drop()


def test_cms_delta_partition_growth_surfaced_in_health(spark, caplog):
    """The unbounded-growth remedy compact() has a trigger signal:
    delta_partitions() counts per-batch partitions (catalog listing),
    health() wraps it with the compaction advisory, update_batch WARNs
    past the threshold, and a streaming Handle surfaces the probe
    under artifacts.<name> — with a throwing probe contained."""
    import logging

    from kpipe_spark.functions.sketches import CmsSketch
    from kpipe_spark.streaming.runner import Handle, Metrics

    docs = _docs(spark, [(i, f"token{i} alpha beta") for i in range(10)])
    table = f"cms_growth_{uuid.uuid4().hex[:8]}"
    sk = CmsSketch.build(spark, docs, table)
    try:
        assert sk.delta_partitions() == 0
        sk.update_batch(docs, 0)
        sk.update_batch(docs, 1)
        assert sk.delta_partitions() == 2
        assert sk.health() == {
            "delta_partitions": 2,
            "advisory_threshold": sk.advisory_delta_partitions,
            "compaction_advised": False,
        }

        # advisory fires once growth passes the (instance) threshold
        sk.advisory_delta_partitions = 2
        assert sk.health()["compaction_advised"] is False  # 2 !> 2
        with caplog.at_level(
            logging.WARNING, logger="kpipe_spark.functions.sketches"
        ):
            sk.update_batch(docs, 2)
        assert any(
            "compact()" in r.getMessage() and sk.table in r.getMessage()
            for r in caplog.records
        )
        assert sk.health()["compaction_advised"] is True

        # the streaming Handle surfaces the probe; throwing contained
        class _Query:
            isActive = True
            status = {"message": "ok"}
            lastProgress = None

        handle = Handle(_Query(), Metrics())
        handle.add_health_probe("cms", sk.health)
        handle.add_health_probe("bad", lambda: 1 / 0)
        doc = handle.health()
        assert doc["artifacts"]["cms"]["delta_partitions"] == 3
        assert doc["artifacts"]["cms"]["compaction_advised"] is True
        assert "ZeroDivisionError" in doc["artifacts"]["bad"]["error"]
        assert doc["running"] is True  # probe failure never fails health

        # compact() resets the signal the advisory exists to trigger
        sk.compact()
        assert sk.delta_partitions() == 0
        assert sk.health()["compaction_advised"] is False
    finally:
        sk.drop()


def test_bloom_gate_health_and_compact(spark, corpus):
    """Round-10 verdict item #7 (sketch health symmetry): BloomGate's
    growth axis is FILES (rows bounded at <= m); health surfaces fill
    + FP estimate + file count with the compaction advisory, and
    compact() folds the accreted appends into one distinct file set
    with verdicts and the replay marker unchanged."""
    table = f"bloom_health_{uuid.uuid4().hex[:8]}"
    g = BloomGate.build(spark, corpus, table, m=1 << 12, k=3)
    try:
        for b in range(3):
            g.update_batch(
                _docs(spark, [(200 + b, f"novel batch doc {b}")]), batch_id=b
            )
        h = g.health()
        assert h["n_bits_set"] == g.n_bits_set() > 0
        assert 0 < h["fill_ratio"] < 1
        assert h["fp_rate_estimate"] == round(h["fill_ratio"] ** 3, 6)
        assert h["state_files"] >= 4  # base + one per append
        assert h["compaction_advised"] is (
            h["state_files"] > g.advisory_state_files
        )
        before_bits = g.n_bits_set()
        probe_before = sorted(
            map(tuple, g.probe(corpus).collect())
        )
        g.compact()
        assert g.state_files() == 1
        assert g.n_bits_set() == before_bits
        assert sorted(map(tuple, g.probe(corpus).collect())) == probe_before
        # replay marker survives the swap: batch 2 still skips
        assert g.last_batch_id() == 2
        assert g.update_batch(_docs(spark, [(999, "x y")]), batch_id=2) is False
        # and the gate keeps accepting new batches afterwards
        assert g.update_batch(_docs(spark, [(999, "post compact doc")]), 3)
    finally:
        g.drop()


def test_hll_sketch_health_and_compact(spark, corpus):
    """HllSketch symmetry: rows AND files accrete per batch; compact()
    reduces state to the <= m max-merged registers with a bit-identical
    estimate and the replay marker preserved."""
    from kpipe_spark.functions.sketches import HllSketch

    table = f"hll_health_{uuid.uuid4().hex[:8]}"
    sk = HllSketch.build(spark, corpus, table, m=64)
    try:
        for b in range(3):
            sk.update_batch(
                _docs(spark, [(300 + b, f"fresh tokens batch{b} qqq{b}")]),
                batch_id=b,
            )
        rows, files = sk.state_rows_and_files()
        assert files >= 4
        h = sk.health()
        assert h["state_rows"] == rows and h["register_budget"] == 64
        assert h["compaction_advised"] is (files > sk.advisory_state_files)
        est_before = sk.distinct_estimate()
        merged_before = sorted(map(tuple, sk.registers_df.collect()))
        sk.compact()
        rows2, files2 = sk.state_rows_and_files()
        assert files2 == 1 and rows2 <= 64 and rows2 < rows
        assert sk.distinct_estimate() == est_before
        assert sorted(map(tuple, sk.registers_df.collect())) == merged_before
        assert sk.last_batch_id() == 2
        assert sk.update_batch(_docs(spark, [(9, "z")]), batch_id=1) is False
        assert sk.update_batch(_docs(spark, [(9, "brand new words")]), 5)
    finally:
        sk.drop()


def test_unpartitioned_compact_park_recovery(spark, corpus):
    """The shared park containment for unpartitioned sketch compacts:
    a complete park (marker present) left by a crash resumes the swap
    on the next compact(); an unmarked park (crash before the marker)
    is discarded and the compact restarts from the intact live table;
    a park older than the live table's applied batches is refused."""
    from kpipe_spark.functions.sketches import HllSketch

    table = f"hll_park_{uuid.uuid4().hex[:8]}"
    tmp = f"{table}__compacting"
    sk = HllSketch.build(spark, corpus, table, m=64)
    try:
        sk.update_batch(_docs(spark, [(1, "aa bb cc")]), batch_id=0)
        merged = sorted(map(tuple, sk.registers_df.collect()))

        # complete park, crash before swap: fabricate what step 1 leaves
        sk.registers_df.coalesce(1).write.mode("overwrite").saveAsTable(
            tmp, format="parquet"
        )
        spark.sql(
            f"ALTER TABLE {tmp} SET TBLPROPERTIES "
            f"('kpipe.hll.compact_merged_max_batch_id' = '0')"
        )
        sk.compact()  # resumes the swap from the park
        assert not spark.catalog.tableExists(tmp)
        assert sorted(map(tuple, sk.registers_df.collect())) == merged
        assert sk.state_rows_and_files()[1] == 1

        # unmarked park: dropped, compact restarts from live
        spark.createDataFrame(
            [(0, 63)], "bucket int, mrho int"
        ).write.saveAsTable(tmp, format="parquet")
        sk.compact()
        assert not spark.catalog.tableExists(tmp)
        got = sorted(map(tuple, sk.registers_df.collect()))
        assert got == merged  # the bogus (0, 63) row never leaked in

        # stale park vs newer live batches: refused, nothing touched
        sk.registers_df.coalesce(1).write.mode("overwrite").saveAsTable(
            tmp, format="parquet"
        )
        spark.sql(
            f"ALTER TABLE {tmp} SET TBLPROPERTIES "
            f"('kpipe.hll.compact_merged_max_batch_id' = '0')"
        )
        sk.update_batch(_docs(spark, [(2, "dd ee ff")]), batch_id=7)
        with pytest.raises(RuntimeError, match="recovery refused"):
            sk.compact()
        assert spark.catalog.tableExists(tmp)
    finally:
        sk.drop()
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")
