"""CorpusIndex: the packaged incremental-admission loop.

build -> admit -> append -> admit-again lifecycle on a corpus with
known duplicate structure, plus the plan property that makes it the
100 TB shape: the stored band table's side of the admission join plans
NO Exchange (bucketing paid the shuffle at build time)."""

from __future__ import annotations

import uuid

import pytest

from kpipe_spark.functions.corpus_index import CorpusIndex

# Round-14 suite tiering: this module is in the SLOW tier (excluded from
# the driver's default `pytest tests/ -q` run by addopts; run with -m slow).
# See pyproject.toml [tool.pytest.ini_options] for the rationale.
pytestmark = pytest.mark.slow


SPAM = "identical boilerplate text repeated across the corpus every day"
FOX = "the quick brown fox jumps over the lazy dog at dawn today"


@pytest.fixture
def corpus_rows():
    return [
        (100, SPAM),
        (101, FOX),
        (102, "completely unrelated prose about bucketed join planning"),
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _assert_corpus_side_exchange_free(ledger, table: str) -> None:
    """Walk the executed plan from the bucketed band-table scan up to
    its join: only Sort/Project may sit between them — an Exchange
    there means the corpus band table is re-shuffled per admitted
    batch, defeating the stored artifact."""
    plan = ledger._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan[:2000]
    lines = plan.splitlines()
    scan_idx = next(
        i for i, ln in enumerate(lines) if table in ln and "Scan" in ln
    )

    def indent(ln: str) -> int:
        body = ln.replace(":", " ").replace("+-", "  ")
        return len(body) - len(body.lstrip())

    depth = indent(lines[scan_idx])
    for ln in reversed(lines[:scan_idx]):
        if indent(ln) >= depth:
            continue
        if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln:
            break
        depth = indent(ln)
        assert "Exchange" not in ln, (
            "corpus band table re-shuffled per batch:\n" + ln
        )
    else:
        raise AssertionError("no join above the bucketed scan:\n" + plan)


def test_admit_append_lifecycle(spark, corpus_rows):
    table = f"ci_test_{uuid.uuid4().hex[:8]}"
    idx = CorpusIndex.build(spark, _df(spark, corpus_rows), table, num_buckets=4)
    try:
        batch = _df(
            spark,
            [
                (200, SPAM),  # dup of corpus doc 100
                (201, "genuinely novel content nothing resembles anywhere"),
                (202, "another piece of fresh text with its own words"),
                (203, FOX),  # dup of corpus doc 101
                (210, "twin texts that duplicate each other inside batch"),
                (211, "twin texts that duplicate each other inside batch"),
            ],
        )
        ledger = {r["doc_id"]: r for r in idx.admit(batch).collect()}
        assert set(ledger) == {200, 201, 202, 203, 210, 211}
        # corpus dups rejected, with the corpus partner visible
        assert ledger[200]["n_corpus_dups"] >= 1
        assert not ledger[200]["admitted"]
        assert ledger[200]["min_dup_id"] == 100
        assert ledger[203]["n_corpus_dups"] >= 1 and not ledger[203]["admitted"]
        # batch twins: keep-one — the lower id wins
        assert ledger[210]["admitted"] and not ledger[211]["admitted"]
        assert ledger[211]["min_dup_id"] == 210
        # novel docs admitted with clean ledgers
        for i in (201, 202):
            assert ledger[i]["admitted"]
            assert ledger[i]["n_corpus_dups"] == 0
            assert ledger[i]["n_batch_dups"] == 0
            assert ledger[i]["min_dup_id"] is None

        # append the admitted docs; re-admitting the same batch must now
        # reject EVERYTHING (every doc collides with its indexed copy)
        admitted_ids = [i for i, r in ledger.items() if r["admitted"]]
        idx.append(
            batch.filter(batch.doc_id.isin(admitted_ids))
        )
        again = {r["doc_id"]: r for r in idx.admit(batch).collect()}
        assert all(not r["admitted"] for r in again.values())
        assert all(r["n_corpus_dups"] >= 1 for r in again.values())
    finally:
        idx.drop()


def _warehouse_path(spark) -> str:
    import urllib.parse

    return urllib.parse.urlparse(
        spark.conf.get("spark.sql.warehouse.dir")
    ).path


def test_build_reclaims_orphaned_location(spark, corpus_rows):
    """A crashed prior job leaves a managed-table DIRECTORY with no
    catalog entry (exactly the dirt that made the round-6 handover
    suite red: spark-warehouse/corpus_bands_api). build() must detect
    the orphan and reclaim it instead of dying with
    LOCATION_ALREADY_EXISTS on the user's first rerun."""
    import os

    table = f"ci_orphan_{uuid.uuid4().hex[:8]}"
    loc = os.path.join(_warehouse_path(spark), table)
    os.makedirs(loc)
    with open(os.path.join(loc, "leftover.parquet"), "w") as f:
        f.write("junk from a crashed run")
    idx = CorpusIndex.build(
        spark, _df(spark, corpus_rows), table, num_buckets=2
    )
    try:
        ledger = idx.admit(_df(spark, [(200, SPAM)])).collect()
        assert len(ledger) == 1 and not ledger[0]["admitted"]
    finally:
        idx.drop()
    assert not os.path.exists(loc), "drop left the directory behind"


def test_drop_leaves_no_orphan(spark, corpus_rows):
    """drop() must remove the warehouse directory along with the
    catalog entry — a lingering directory IS the orphan the next
    build has to reclaim."""
    import os

    table = f"ci_droporphan_{uuid.uuid4().hex[:8]}"
    idx = CorpusIndex.build(
        spark, _df(spark, corpus_rows), table, num_buckets=2
    )
    loc = os.path.join(_warehouse_path(spark), table)
    assert os.path.exists(loc)
    idx.drop()
    assert not spark.catalog.tableExists(table)
    assert not os.path.exists(loc)


def test_attach_requires_existing_table(spark):
    with pytest.raises(ValueError, match="no such index"):
        CorpusIndex.attach(spark, f"ci_missing_{uuid.uuid4().hex[:8]}")


def test_attach_adopts_and_validates_stored_family(spark, corpus_rows):
    """The MinHash family travels WITH the table (TBLPROPERTIES): a
    bare attach adopts the stored parameters, and an attach that
    explicitly contradicts them fails loudly instead of silently
    missing every collision."""
    table = f"ci_fam_{uuid.uuid4().hex[:8]}"
    idx = CorpusIndex.build(
        spark, _df(spark, corpus_rows), table, num_buckets=4, shingle_k=2
    )
    try:
        attached = CorpusIndex.attach(spark, table)
        assert attached.shingle_k == 2
        assert attached.num_hashes == idx.num_hashes
        # same family explicitly restated is fine
        CorpusIndex.attach(spark, table, shingle_k=2)
        with pytest.raises(ValueError, match="family mismatch"):
            CorpusIndex.attach(spark, table, shingle_k=5)
        with pytest.raises(ValueError, match="family mismatch"):
            CorpusIndex.attach(spark, table, num_hashes=idx.num_hashes + 8)
    finally:
        idx.drop()


def _index_files(spark, table: str) -> list[str]:
    files = spark.table(table).inputFiles()
    assert files, "bucketed table reported no files"
    return files


def test_compact_preserves_ledger_and_bucketing(spark, corpus_rows):
    """appends accrete files; compact() rewrites to one file per bucket
    WITHOUT changing admission results, and the post-compaction admit
    join still plans no Exchange on the index side (the property
    compaction exists to protect)."""
    table = f"ci_compact_{uuid.uuid4().hex[:8]}"
    idx = CorpusIndex.build(spark, _df(spark, corpus_rows), table, num_buckets=4)
    try:
        for i in range(3):
            idx.append(
                _df(spark, [(400 + i, f"appended batch number {i} text body")])
            )
        probe = _df(spark, [(500, SPAM), (501, "appended batch number 1 text body")])
        before = sorted(idx.admit(probe).collect())
        n_files_before = len(_index_files(spark, table))

        idx.compact()

        n_files_after = len(_index_files(spark, table))
        assert n_files_after <= 4  # one file per bucket
        assert n_files_after < n_files_before
        after = sorted(idx.admit(probe).collect())
        assert after == before
        # family + bucket properties survive the rewrite
        attached = CorpusIndex.attach(spark, table)
        assert attached._num_buckets() == 4
        # the admission join is still exchange-free on the index side
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            ledger = idx.admit(probe)
            ledger.collect()
            _assert_corpus_side_exchange_free(ledger, table)
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
    finally:
        idx.drop()


def test_admit_corpus_side_is_exchange_free(spark, corpus_rows):
    """The whole point of the stored artifact: the admission join scans
    the bucketed band table WITHOUT a shuffle Exchange on that side
    (the batch side shuffles, the corpus side never does). Broadcast
    threshold disabled — at test scale AQE would legitimately broadcast
    the tiny corpus table, hiding the bucketing property this pins
    (same technique as test_scale_utils'
    test_bucketed_join_has_no_exchange)."""
    table = f"ci_plan_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    idx = CorpusIndex.build(spark, _df(spark, corpus_rows), table, num_buckets=4)
    try:
        ledger = idx.admit(_df(spark, [(300, SPAM), (301, "novel words")]))
        ledger.collect()
        _assert_corpus_side_exchange_free(ledger, table)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        idx.drop()


def test_append_advisory_fires_then_compact_clears(spark, corpus_rows, caplog):
    """Steady-state hygiene without a human in the loop: append()
    returns the index's file count and WARNs once it crosses
    advisory_files_per_bucket x num_buckets, and a compact() brings
    the count back under the advisory line."""
    import logging

    table = f"ci_adv_{uuid.uuid4().hex[:8]}"
    idx = CorpusIndex.build(spark, _df(spark, corpus_rows), table, num_buckets=2)
    try:
        idx.advisory_files_per_bucket = 1  # tiny threshold for the test
        with caplog.at_level(logging.WARNING, logger="kpipe_spark.functions.corpus_index"):
            fired = False
            for i in range(4):
                n = idx.append(
                    _df(spark, [(600 + i, f"advisory batch {i} body text")])
                )
                if n > idx.advisory_files_per_bucket * 2:
                    fired = True
            assert fired, "file count never crossed the advisory threshold"
        assert any(
            "compact()" in r.message for r in caplog.records
        ), "append never advised compaction"

        caplog.clear()
        idx.compact()
        with caplog.at_level(logging.WARNING, logger="kpipe_spark.functions.corpus_index"):
            idx.advisory_files_per_bucket = 8  # production threshold
            n = idx.append(_df(spark, [(700, "post compaction batch")]))
        assert n <= 2 + 2  # one file per bucket + one append batch
        assert not any("compact()" in r.message for r in caplog.records)
    finally:
        idx.drop()


def test_append_falls_back_to_describe_for_legacy_tables(spark, corpus_rows):
    """A band table bucketed by util.write_bucketed directly (or by a
    pre-TBLPROPERTIES version of this code) carries no
    kpipe.index.num_buckets property but IS correctly bucketed:
    append() must probe the catalog's bucket spec instead of raising,
    and backfill the property so the probe runs once."""
    from kpipe_spark.util import write_bucketed

    table = f"ci_legacy_{uuid.uuid4().hex[:8]}"
    idx = CorpusIndex(spark, table)
    write_bucketed(
        idx._bands_of(_df(spark, corpus_rows)),
        table,
        keys=["band", "bucket"],
        num_buckets=4,
    )
    try:
        assert idx._read_props() == {}  # genuinely legacy: no properties
        idx.append(_df(spark, [(800, "legacy append body text")]))
        # property backfilled on first probe; admit sees the new doc
        assert idx._read_props()["num_buckets"] == 4
        ledger = {
            r["doc_id"]: r
            for r in idx.admit(
                _df(spark, [(801, "legacy append body text")])
            ).collect()
        }
        assert ledger[801]["n_corpus_dups"] >= 1
        assert not ledger[801]["admitted"]
    finally:
        idx.drop()


def test_streaming_admission_replay_is_idempotent(spark, corpus_rows, tmp_path):
    """The streaming form of the admission loop: micro-batches of
    arriving docs flow through StreamRunner into a foreachBatch sink
    that admits against the stored index and appends the admitted
    docs. At-least-once delivery means a crash can REPLAY a batch the
    sink already applied — and the index's same-id re-ingest
    detection makes that replay a no-op (every replayed doc collides
    with its own indexed copy, admitted=False, nothing appends):
    exactly-once index STATE on top of at-least-once delivery,
    without a transactional sink."""
    import os

    from pyspark.sql import functions as F

    from kpipe_spark.pipeline import Pipeline
    from kpipe_spark.streaming import StreamRunner

    table = f"ci_stream_{uuid.uuid4().hex[:8]}"
    idx = CorpusIndex.build(spark, _df(spark, corpus_rows), table, num_buckets=4)
    try:
        src = str(tmp_path / "src")
        os.makedirs(src)
        batch1 = [(900, SPAM), (901, "streaming batch one novel words")]
        batch2 = [(902, "streaming batch two other content"), (903, FOX)]
        _df(spark, batch1).coalesce(1).write.mode("append").parquet(src)
        _df(spark, batch2).coalesce(1).write.mode("append").parquet(src)

        def run(ckpt_name: str) -> None:
            def admit_sink(df, batch_id):
                batch = df.select("doc_id", "text")
                ledger = idx.admit(batch)
                idx.append(
                    batch.join(
                        ledger.filter("admitted").select("doc_id"),
                        "doc_id",
                        "semi",
                    )
                )

            runner = StreamRunner(
                pipeline=Pipeline().require_field("doc_id"),
                sink=admit_sink,
            )
            stream = (
                spark.readStream.schema("doc_id bigint, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            handle = runner.start(
                stream, str(tmp_path / ckpt_name), f"admit-{ckpt_name}"
            )
            try:
                handle.process_all_available()
            finally:
                handle.close()

        run("ckpt_a")
        # 900 dups corpus SPAM, 903 dups corpus FOX -> only 901/902 admitted
        rows_after_first = spark.table(table).count()
        indexed_ids = {
            r["doc_id"]
            for r in spark.table(table).select("doc_id").distinct().collect()
        }
        assert {901, 902} <= indexed_ids
        assert 900 not in indexed_ids and 903 not in indexed_ids

        # the replay: a FRESH checkpoint re-delivers every batch (the
        # worst-case at-least-once geometry); re-ingest detection must
        # reject everything and leave the index byte-count identical
        run("ckpt_b")
        assert spark.table(table).count() == rows_after_first
    finally:
        idx.drop()


def test_append_if_missing_repairs_marker_and_data_windows(spark, corpus_rows):
    """The append/marker crash matrix (round-12 ADVICE): append lands
    band rows, then bumps release_seq + batch fingerprint in a separate
    statement — a crash between them leaves data ahead of marker.
    append_if_missing must (a) re-stamp WITHOUT duplicating band rows
    in that state, (b) fully append when nothing landed, (c) no-op when
    both data and marker landed, and (d) refuse a partial landing."""
    from kpipe_spark.functions.corpus_index import CorpusIndex

    table = f"bands_aim_{uuid.uuid4().hex[:8]}"
    idx = CorpusIndex.build(spark, _df(spark, corpus_rows), table, num_buckets=4)
    try:
        batch = _df(spark, [(900, SPAM), (901, "novel text nine oh one")])

        # (b) nothing landed yet: full append
        assert idx.append_if_missing(batch) == "appended"
        assert idx.release_seq() == 1
        rows_after = spark.table(table).count()

        # (c) both data and marker landed: no-op
        assert idx.append_if_missing(batch) == "already_appended"
        assert idx.release_seq() == 1
        assert spark.table(table).count() == rows_after

        # (a) simulate the crash window: marker bump lost (stale
        # fingerprint + seq), data present — re-stamp only
        idx._set_props(release_seq=0, last_append_n=0, last_append_hash=0)
        assert idx.append_if_missing(batch) == "restamped"
        assert idx.release_seq() == 1
        props = idx._read_props()
        n_b, h_b = idx._batch_fingerprint(batch)
        assert (props["last_append_n"], props["last_append_hash"]) == (n_b, h_b)
        assert spark.table(table).count() == rows_after  # no duplicates

        # (d) partial landing: half the batch's band rows missing
        half = _df(spark, [(902, FOX), (903, "another novel document")])
        idx.append(half.filter("doc_id = 902"))
        with pytest.raises(RuntimeError, match="partially committed"):
            idx.append_if_missing(half)
    finally:
        idx.drop()


def test_batch_presence_corpus_side_exchange_free(spark, corpus_rows):
    """append_if_missing's presence probe must keep the bucketed band
    table exchange-free (admit's shape): joining on all three columns
    would hash-partition the corpus side on a key set the bucket spec
    doesn't satisfy — an index-sized shuffle on every crash repair."""
    from kpipe_spark.functions.corpus_index import CorpusIndex

    table = f"bands_px_{uuid.uuid4().hex[:8]}"
    idx = CorpusIndex.build(spark, _df(spark, corpus_rows), table, num_buckets=4)
    # broadcast off: at test scale AQE broadcasts the tiny corpus side,
    # hiding the shape that matters at 100 TB (the admit tests' rule)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        batch = _df(spark, [(100, SPAM), (930, "a novel probe doc")])
        presence = idx._batch_presence(
            idx._bands_of(batch).localCheckpoint(eager=True)
        )
        presence.collect()
        _assert_corpus_side_exchange_free(presence, table)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        idx.drop()


def test_append_stamps_fingerprint_with_release_seq(spark, corpus_rows):
    """append() writes release_seq and the batch fingerprint in ONE
    ALTER TABLE — the atomicity that makes the crash window detectable
    (either both survive or neither does)."""
    from kpipe_spark.functions.corpus_index import CorpusIndex

    table = f"bands_fp_{uuid.uuid4().hex[:8]}"
    idx = CorpusIndex.build(spark, _df(spark, corpus_rows), table, num_buckets=4)
    try:
        batch = _df(spark, [(910, "fingerprint stamping batch")])
        idx.append(batch)
        props = idx._read_props()
        n_b, h_b = idx._batch_fingerprint(batch)
        assert props["release_seq"] == 1
        assert (props["last_append_n"], props["last_append_hash"]) == (n_b, h_b)
    finally:
        idx.drop()
