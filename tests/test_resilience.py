"""R4 backpressure governor, R8 HTTP health endpoint, R2 bounded
error-handler sample, and the exported crash-restart test kit."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from kpipe_spark.pipeline import Pipeline
from kpipe_spark.streaming import Action, BackpressureGovernor, StreamRunner, kafka_lag
from kpipe_spark.streaming.health import HttpHealthServer
from kpipe_spark.streaming.sources import file_source
from kpipe_spark.testkit import CapturingSink, CrashRestartHarness
from tests.test_streaming import SCHEMA, rows_batch, write_batch_file

# Round-14 suite tiering: this module is in the SLOW tier (excluded from
# the driver's default `pytest tests/ -q` run by addopts; run with -m slow).
# See pyproject.toml [tool.pytest.ini_options] for the rationale.
pytestmark = pytest.mark.slow



# -- R4: backpressure governor ------------------------------------------------


def test_governor_check_mirrors_reference_state_machine():
    """BackpressureController.check (BackpressureController.java:130-136):
    >= high while running -> PAUSE; <= low while paused -> RESUME;
    anything else -> NONE (hysteresis band holds the current state)."""
    g = BackpressureGovernor(high_watermark=10_000, low_watermark=7_000)
    assert g.check(10_000, currently_paused=False) is Action.PAUSE
    assert g.check(9_999, currently_paused=False) is Action.NONE
    assert g.check(8_000, currently_paused=True) is Action.NONE  # in band: stay paused
    assert g.check(7_000, currently_paused=True) is Action.RESUME
    assert g.check(0, currently_paused=False) is Action.NONE


def test_governor_validates_watermarks_like_reference():
    with pytest.raises(ValueError):
        BackpressureGovernor(high_watermark=0)
    with pytest.raises(ValueError):
        BackpressureGovernor(high_watermark=10, low_watermark=-1)
    with pytest.raises(ValueError):
        BackpressureGovernor(high_watermark=10, low_watermark=10)


def test_admission_shrinks_under_induced_lag_and_recovers():
    g = BackpressureGovernor(
        high_watermark=10_000,
        low_watermark=7_000,
        max_admission=100_000,
        min_admission=1_000,
    )
    assert g.admission == 100_000
    # lag climbs past the high watermark: admission halves each sample
    assert g.observe(12_000) == 50_000 and g.paused
    assert g.observe(15_000) == 25_000
    assert g.observe(20_000) == 12_500
    # lag in the hysteresis band: paused holds, admission holds
    assert g.observe(8_000) == 12_500 and g.paused
    # drained to the low watermark: resume restores full admission
    assert g.observe(6_500) == 100_000 and not g.paused
    # floor: admission never shrinks below min_admission
    for _ in range(20):
        g.observe(1_000_000)
    assert g.admission == 1_000


def test_govern_counts_pause_transitions_in_metrics():
    """Handle.govern() increments the backpressure.pauses counter on
    the un-paused -> paused transition only (the counter the OTel
    bridge exports as kpipe.consumer.backpressure.pauses), mirroring
    the circuitbreaker.trips wiring."""
    from kpipe_spark.streaming.runner import Handle, Metrics

    class _FakeQuery:
        lastProgress: dict | None = None

    q = _FakeQuery()
    m = Metrics()
    g = BackpressureGovernor(high_watermark=10, low_watermark=5)
    h = Handle(q, m, governor=g)

    def progress_with_lag(lag):
        return {
            "sources": [
                {
                    "endOffset": {"t": {"0": 0}},
                    "latestOffset": {"t": {"0": lag}},
                }
            ]
        }

    q.lastProgress = progress_with_lag(50)
    h.govern()
    assert m.counters["backpressure.pauses"] == 1
    q.lastProgress = progress_with_lag(60)  # still paused: no double count
    h.govern()
    assert m.counters["backpressure.pauses"] == 1
    q.lastProgress = progress_with_lag(0)  # resume
    h.govern()
    q.lastProgress = progress_with_lag(50)  # second pause
    h.govern()
    assert m.counters["backpressure.pauses"] == 2


def test_kafka_lag_parses_last_progress_shape():
    """lag = sum(max(0, latestOffset - endOffset)) per topic-partition
    (calculateTotalLag, BackpressureController.java:164-186)."""
    progress = {
        "sources": [
            {
                "endOffset": {"t1": {"0": 100, "1": 250}},
                "latestOffset": {"t1": {"0": 160, "1": 240}},
            },
            {"endOffset": None, "latestOffset": None},  # non-Kafka source
        ]
    }
    assert kafka_lag(progress) == 60  # partition 1 is ahead -> clamped to 0
    assert kafka_lag(None) == 0
    assert kafka_lag({}) == 0


# -- R8: HTTP health endpoint -------------------------------------------------


def _get(url: str):
    try:
        with urllib.request.urlopen(url, timeout=5) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_endpoint_status_codes():
    """200 + OK while healthy; 503 + UNHEALTHY after stop; throwing
    supplier counts as unhealthy (HttpHealthServer.java:128-158)."""
    state = {"running": True, "boom": False}

    def healthy() -> bool:
        if state["boom"]:
            raise RuntimeError("probe exploded")
        return state["running"]

    with HttpHealthServer(
        host="127.0.0.1",
        port=0,
        health_supplier=healthy,
        in_flight_supplier=lambda: 42,
        paused_supplier=lambda: True,
    ) as srv:
        host, port = srv.address
        url = f"http://{host}:{port}{srv.path}"

        status, body = _get(url)
        assert (status, body["status"]) == (200, "OK")
        assert body["inFlight"] == 42 and body["paused"] is True

        state["running"] = False  # STOPPED
        status, body = _get(url)
        assert (status, body["status"]) == (503, "UNHEALTHY")

        state["boom"] = True  # supplier throws -> unhealthy, not a 500
        status, body = _get(url)
        assert (status, body["status"]) == (503, "UNHEALTHY")

        req = urllib.request.Request(url, data=b"{}", method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=5)
        assert exc.value.code == 405

        status, _ = _get(f"http://{host}:{port}/nope")
        assert status == 404

    # round-10 review: EVERY supplier is contained, not just health —
    # a throwing lag/paused supplier (dead session) must produce the
    # documented 503 UNHEALTHY body, not a dropped connection
    def boom() -> int:
        raise RuntimeError("lag probe exploded")

    with HttpHealthServer(
        host="127.0.0.1",
        port=0,
        health_supplier=lambda: True,
        in_flight_supplier=boom,
        paused_supplier=boom,
    ) as srv:
        host, port = srv.address
        status, body = _get(f"http://{host}:{port}{srv.path}")
        assert (status, body["status"]) == (503, "UNHEALTHY")
        assert body["inFlight"] == -1 and body["paused"] is False


# -- R2: bounded error-handler sample ----------------------------------------


def test_error_handler_sample_is_capped(spark, tmp_path):
    """The handler sees at most error_sample_limit rows; the TRUE failed
    count is still in metrics (anti-OOM for outage-sized batches)."""
    src = str(tmp_path / "src")
    rows = [
        {"event_id": i, "key": "k", "event_type": "error", "value": 1.0, "offset": i}
        for i in range(25)
    ]
    write_batch_file(src, rows, "a.json")

    seen_counts: list[int] = []
    runner = StreamRunner(
        pipeline=Pipeline().fail_when(F.col("event_type") == "error", "boom"),
        sink=lambda df, bid: None,
        error_handler=lambda failed: seen_counts.append(len(failed)),
        error_sample_limit=10,
    )
    h = runner.start(file_source(spark, src, SCHEMA), str(tmp_path / "ckpt"))
    h.process_all_available()
    h.close()

    assert seen_counts == [10]  # capped sample
    assert runner.metrics.counters["pipeline.processed.failed"] == 25  # true count


# -- test kit: CrashRestartHarness + CapturingSink ---------------------------


def test_capturing_sink_snapshot_and_clear(spark):
    sink = CapturingSink()
    df = spark.createDataFrame([(1,), (2,)], "x int")
    sink(df, 0)
    snap = sink.captured()
    sink(df, 1)
    assert len(snap) == 2 and sink.count() == 4
    sink.clear()
    assert sink.count() == 0


def test_crash_restart_harness_resume_window(spark, tmp_path):
    """The uncommitted tail [k, P) provably reappears in phase B's
    output (CrashRestartHarness.java:24-63 geometry: seed N, commit k,
    crash at P)."""
    rows = rows_batch(0, 30, key_cycle=5)
    result = (
        CrashRestartHarness(spark, SCHEMA, str(tmp_path))
        .with_pipeline(Pipeline().add_field("stage", "v1"))
        .seed(rows)
        .commit_up_to(10)
        .crash_after(20)
        .restart()
    )
    # A processed [0, 20): both batches captured before the crash
    assert {r["event_id"] for r in result.first_run} == set(range(20))
    # B's resume window is [10, 30): the uncommitted tail replays...
    assert result.tail_ids("event_id") <= result.second_run_ids("event_id")
    # ...and the committed prefix [0, 10) does NOT
    assert result.second_run_ids("event_id") == set(range(10, 30))
    # at-least-once overall: nothing lost across the crash
    assert {r["event_id"] for r in result.first_run} | result.second_run_ids(
        "event_id"
    ) == set(range(30))


def test_idempotent_dlq_park_exact_across_replay(spark, tmp_path):
    """A batch that parks to the DLQ, crashes before commit, and
    replays must NOT duplicate its parks: IdempotentDlqParquet keys the
    write on batch_id with dynamic partition overwrite, so the DLQ row
    count equals the failed-record count exactly (SURVEY §7 risk
    register closed — plain append would park the crash batch's
    failures twice)."""
    from kpipe_spark.pipeline import Pipeline
    from kpipe_spark.pipeline.sinks import IdempotentDlqParquet
    from kpipe_spark.testkit import CrashRestartHarness

    bad_ids = {2, 5, 8}  # one failure per micro-batch: committed, crash, tail
    seed = [
        {"key": str(i), "raw": ("boom" if i in bad_ids else str(i))}
        for i in range(10)
    ]
    dlq = IdempotentDlqParquet(str(tmp_path / "dlq"))
    (
        CrashRestartHarness(spark, "key string, raw string", str(tmp_path))
        .with_pipeline(Pipeline().safe_cast("n", "raw", "bigint"))
        .with_dlq(dlq)
        .seed(seed)
        .commit_up_to(3)   # batch 0 = [0,3) commits (parks key 2)
        .crash_after(7)    # batch 1 = [3,7) parks key 5, then crashes
        .restart()         # batch 1 replays (re-parks 5), batch 2 parks 8
    )
    parked = dlq.read(spark).collect()
    assert sorted(r["key"] for r in parked) == ["2", "5", "8"]  # no dup of 5
    assert all("CastException" in r["error"] for r in parked)
    # the replayed park landed in the SAME batch partition it first used
    assert {r["batch_id"] for r in parked} == {0, 1, 2}


def test_idempotent_dlq_clears_stale_parks_on_clean_replay(spark, tmp_path):
    """The transient-failure case: batch N parks records, crashes before
    commit, and the REPLAY succeeds for every record (the failure was
    transient). The replay's empty park must CLEAR batch N's stale
    parks — with dynamic partition overwrite it would strand them,
    which is why the sink overwrites the partition directory and the
    runner invokes the writer on every batch."""
    from kpipe_spark.pipeline.sinks import IdempotentDlqParquet

    dlq = IdempotentDlqParquet(str(tmp_path / "dlq"))
    batch7 = spark.createDataFrame([("a", "boom")], "key string, error string")
    batch8 = spark.createDataFrame([("b", "boom")], "key string, error string")
    dlq(batch7, 7)
    dlq(batch8, 8)
    parked = {(r["key"], r["batch_id"]) for r in dlq.read(spark).collect()}
    assert parked == {("a", 7), ("b", 8)}
    # batch 7 replays with zero failures: its stale park must vanish
    dlq(batch7.limit(0), 7)
    parked = {(r["key"], r["batch_id"]) for r in dlq.read(spark).collect()}
    assert parked == {("b", 8)}


def test_harness_validates_geometry(spark, tmp_path):
    h = CrashRestartHarness(spark, SCHEMA, str(tmp_path)).seed(rows_batch(0, 5))
    with pytest.raises(ValueError):
        h.commit_up_to(3).crash_after(2).restart()  # k >= p
    with pytest.raises(ValueError):
        CrashRestartHarness(spark, SCHEMA, str(tmp_path)).restart()  # no seed


def test_health_server_wired_to_live_query(spark, tmp_path):
    """serve_handle_health + govern() against a real streaming query:
    200 while RUNNING, 503 after close; governor stays attached."""
    from kpipe_spark.streaming.health import serve_handle_health

    src = str(tmp_path / "src")
    write_batch_file(src, rows_batch(0, 5), "a.json")
    runner = StreamRunner(pipeline=Pipeline(), sink=lambda df, bid: None)
    h = runner.start(
        file_source(spark, src, SCHEMA),
        str(tmp_path / "ckpt"),
        backpressure=BackpressureGovernor(),
    )
    try:
        h.process_all_available()
        srv = serve_handle_health(h, host="127.0.0.1")
        try:
            host, port = srv.address
            status, body = _get(f"http://{host}:{port}/health")
            assert (status, body["status"]) == (200, "OK")
            assert body["paused"] is False
            # file sources report no latestOffset -> lag 0, full admission
            assert h.lag() == 0
            assert h.govern() == h.governor.max_admission
        finally:
            srv.close()
    finally:
        h.close()
    # stopped query -> 503 via a fresh server over the same handle
    srv2 = serve_handle_health(h, host="127.0.0.1")
    try:
        host, port = srv2.address
        status, body = _get(f"http://{host}:{port}/health")
        assert (status, body["status"]) == (503, "UNHEALTHY")
    finally:
        srv2.close()


def test_dlq_read_of_clean_stream_is_empty_not_error(spark, tmp_path):
    """A healthy stream writes only empty tombstones (the runner
    invokes the DLQ writer on every batch); reading that DLQ must
    return an empty frame with the park schema, not fail schema
    inference — Spark writes a schema-bearing part file even for a
    0-row overwrite, which this pins (a regression here would make
    every DLQ check of a clean pipeline throw)."""
    from kpipe_spark.pipeline.sinks import IdempotentDlqParquet

    dlq = IdempotentDlqParquet(str(tmp_path / "dlq"))
    empty = spark.createDataFrame([], "key string, error string")
    dlq(empty, 0)
    dlq(empty, 1)
    out = dlq.read(spark)
    assert out.count() == 0
    assert {"key", "error", "batch_id"} <= set(out.columns)
