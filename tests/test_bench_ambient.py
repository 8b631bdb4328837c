"""The bench's per-query contention evidence, tested as a unit.

BENCH_r{N}'s trustworthiness now rests on ambient_load_per_query =
(machine busy jiffies − our process-tree jiffies) / window. These
tests pin the two properties that make that number meaningful: our
own CPU burn is attributed to the TREE (so a busy bench doesn't flag
itself as contention), and the helpers survive process churn without
raising (procfs rows race with exits)."""

from __future__ import annotations

import multiprocessing
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _burn(seconds: float) -> None:
    end = time.perf_counter() + seconds
    x = 0
    while time.perf_counter() < end:
        x += 1


def _burn_then_linger(seconds: float) -> None:
    _burn(seconds)
    time.sleep(3)  # stay alive so the parent samples our jiffies


def test_own_burn_lands_in_tree_not_ambient():
    """A CPU second burned by THIS process (and a LIVE child) must
    show up in the tree counter, leaving external cores near zero —
    the exact property that lets the bench run 32 threads without
    gating on its own footprint. (The child lingers through the
    sample to pin the LIVE-descendant path; reaped children are now
    recouped via cutime/cstime and pinned separately by
    test_tree_jiffies_recoup_reaped_children.)

    The assertion's margin assumes a quiet box: REAL neighbors burning
    ~1 core make external read ~1.0 with perfectly correct attribution
    (measured live in round 13 — identical failure on two adjacent
    commits while an idle-window probe read 0.5-1.0 external cores).
    So the test applies its own discipline: sample ambient FIRST and
    skip when the window can't distinguish mis-attribution from
    genuine neighbors."""
    import pytest

    pb0, pt0 = bench._total_busy_jiffies(), bench._tree_cpu_jiffies()
    time.sleep(1.0)
    pre_ext = max(
        0,
        (bench._total_busy_jiffies() - pb0)
        - (bench._tree_cpu_jiffies() - pt0),
    ) / bench._HZ / 1.0
    if pre_ext >= 0.5:
        pytest.skip(
            f"box not quiet ({pre_ext:.2f} external cores idle-sampled) "
            "— genuine neighbors are indistinguishable from "
            "mis-attributed self-burn at this level"
        )
    b0, t0 = bench._total_busy_jiffies(), bench._tree_cpu_jiffies()
    w0 = time.perf_counter()
    child = multiprocessing.Process(target=_burn_then_linger, args=(0.5,))
    child.start()
    _burn(0.5)
    time.sleep(0.7)  # let the child finish its burn before sampling
    wall = time.perf_counter() - w0
    db = bench._total_busy_jiffies() - b0
    dt = bench._tree_cpu_jiffies() - t0
    child.terminate()
    child.join()
    # we burned ~1 CPU-second across two processes; the tree must see
    # the bulk of it (scheduler noise allowed)
    assert dt / bench._HZ >= 0.6, (db, dt)
    ext_cores = max(0, db - dt) / bench._HZ / wall
    # a quiet CI box may have real neighbors; the claim is only that
    # OUR burn is not misread as ambient (2 cores of self-burn would
    # read ~2.0 here if attribution were broken)
    assert ext_cores < 1.0, (db, dt, ext_cores)


def test_tree_jiffies_monotone_and_raceproof():
    """Repeated samples never go backwards and never raise, even while
    short-lived children churn procfs under the walk."""
    procs = [
        multiprocessing.Process(target=time.sleep, args=(0.05,))
        for _ in range(8)
    ]
    for p in procs:
        p.start()
    last = bench._tree_cpu_jiffies()
    for _ in range(20):
        cur = bench._tree_cpu_jiffies()
        assert cur >= 0
        last = max(last, cur)
    for p in procs:
        p.join()
    assert bench._total_busy_jiffies() > 0


def test_requeue_budget_bounds_waiting(monkeypatch):
    """On a machine that never quiets, _await_ambient_quiet must stop
    consuming once the run-wide budget is spent — the bench can be
    slow-measured but never stalled for hours."""
    monkeypatch.setenv("SPARK_GRAFT_REQUEUE_BUDGET", "4")
    budget = bench._RequeueBudget()
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # force 'still hot' forever: external delta always huge
    seq = iter(range(0, 10**6, 10**4))
    monkeypatch.setattr(bench, "_total_busy_jiffies", lambda: next(seq))
    monkeypatch.setattr(bench, "_tree_cpu_jiffies", lambda: 0)
    waited = bench._await_ambient_quiet(2.0, budget, max_wait=600.0)
    assert waited <= 4
    assert budget.remaining <= 0
    # a second call with the spent budget returns immediately
    assert bench._await_ambient_quiet(2.0, budget, max_wait=600.0) == 0.0


def _headline_doc(n_queries: int, hot: int = 0) -> dict:
    names = [f"d{i:02d}_some_reasonably_long_query_name" for i in range(n_queries)]
    return {
        "metric": "headline_queries_total_runtime",
        "value": 25.123,
        "unit": "sec",
        "queries": {n: 1.234 for n in names},
        "legacy16_subtotal": 9.876,
        "ambient_load_per_query": {
            n: (1.23 if i < hot else 0.0) for i, n in enumerate(names)
        },
        "ambient_gate": 2.0,
        "bench_requeues": {n: 2 for n in names[:hot]},
        "pipeline_records_per_sec": 267379,
        "streaming_records_per_sec": 153179,
        "streaming_steady_state_rps": 129048,
        "streaming_rps_best": 153179,
        "streaming_rps_median": 129048,
        "streaming_rps_spread": 27600,
        "d05_signature_ab": {
            "projection_sec": 0.6,
            "aggregate_sec": 1.2,
            "shipped": "projection",
            "shipped_is_faster": True,
        },
        "incremental_admit_ab": {
            "stored_index_admit_sec": 1.02,
            "inline_derivation_sec": 1.549,
            "artifact_speedup": 1.52,
        },
        "sf": "/root/testdata/sf0.1",
        "loadavg_start": 2.58,
        "loadavg": 4.81,
        "load_gate_wait_sec": 0,
        "requeue_wait_sec": 0,
        "detail_artifact": "BENCH_HEADLINE.json",
    }


def test_compact_headline_line_fits_driver_tail_window():
    """BENCH_r06.json shipped parsed:null because the stdout JSON line
    outgrew the driver's 2000-char tail capture. The compact line must
    fit with margin at the real headline size (22 queries) AND keep the
    contract fields (metric/value/unit/queries/sf) parseable."""
    import json

    line = bench._compact_headline_line(_headline_doc(len(bench.HEADLINE)))
    assert len(line) <= 1900, len(line)
    parsed = json.loads(line)
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in parsed, k
    assert len(parsed["queries"]) == len(bench.HEADLINE)
    # quiet run: per-query ambient collapses to a max, not 22 zeros
    assert parsed["ambient_max"] == 0.0
    assert "ambient_hot" not in parsed
    assert "ambient_load_definition" not in parsed


def test_compact_headline_line_trims_before_overflowing():
    """With every query hot + requeued (worst-case evidence size), the
    line drops optional fields rather than overflow — contract fields
    survive."""
    import json

    doc = _headline_doc(len(bench.HEADLINE), hot=len(bench.HEADLINE))
    full = bench._compact_headline_line(doc, limit=10**6)
    line = bench._compact_headline_line(doc, limit=1200)
    parsed = json.loads(line)
    assert len(line) < len(full)
    # every droppable was sacrificed before touching contract fields
    assert "ambient_hot" not in parsed and "bench_requeues" not in parsed
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in parsed, k
    # the worst case still fits the REAL window once droppables go
    assert len(line) <= 1900, len(line)


def test_suspect_recapture_pass_policy():
    """Pins the headline outlier re-capture: only rows >1.35x a QUIET
    sweep reference re-capture (threshold tightened from 2x in round
    14; SPARK_GRAFT_SUSPECT_RATIO overrides); the minimum is kept in
    place; evidence records the values; a row still over threshold
    after the first recapture gets exactly one more; hot sweep
    references and absent references are skipped."""
    timings = {
        "stalled": 10.0,     # 5x its quiet ref -> recapture, improves
        "worse": 3.0,        # >ratio but recaptures are slower -> keep first
        "normal": 1.1,       # within 1.35x -> untouched
        "hot_ref": 9.0,      # sweep ref was itself hot -> skipped
        "no_ref": 8.0,       # not in the sweep -> skipped
    }
    ambient = {n: 0.0 for n in timings}
    sweep_q = {"stalled": 2.0, "worse": 1.0, "normal": 1.0, "hot_ref": 1.0}
    sweep_amb = {"stalled": 0.1, "worse": 0.0, "normal": 0.0, "hot_ref": 3.5}
    captured = []

    def capture(name):
        captured.append(name)
        return {"stalled": (2.2, 0.05), "worse": (4.0, 0.0)}[name]

    out = bench._suspect_recapture_pass(
        list(timings), timings, ambient, 2.0, sweep_q, sweep_amb, capture
    )
    # "worse" stays over threshold after its first recapture, so it is
    # captured a second time before being flagged
    assert captured == ["stalled", "worse", "worse"]
    assert timings["stalled"] == 2.2 and ambient["stalled"] == 0.05
    assert timings["worse"] == 3.0  # min kept: recaptures were slower
    assert timings["normal"] == 1.1 and timings["hot_ref"] == 9.0
    assert out["stalled"] == {
        "first_capture": 10.0, "recapture": 2.2, "quiet_sweep_ref": 2.0
    }
    assert out["worse"]["recapture"] == 4.0  # evidence kept either way
    assert out["worse"]["recapture2"] == 4.0
    assert out["worse"]["still_suspect"] is True
    assert "normal" not in out and "hot_ref" not in out and "no_ref" not in out


def test_suspect_recapture_flags_still_suspect():
    """A recapture that ALSO reads over threshold gets one more try
    and is then flagged for the verdict step instead of shipping as
    adjudicated (round-10 ADVICE: the single retry window can itself
    be hot; round-13: so can the second)."""
    timings = {"twice_hot": 10.0}
    ambient = {"twice_hot": 0.0}
    out = bench._suspect_recapture_pass(
        ["twice_hot"],
        timings,
        ambient,
        2.0,
        {"twice_hot": 1.0},
        {"twice_hot": 0.0},
        lambda name: (7.0, 0.1),
    )
    assert out["twice_hot"]["still_suspect"] is True
    assert out["twice_hot"]["recapture2"] == 7.0
    assert timings["twice_hot"] == 7.0  # min still kept


def test_ratio_mover_pass_policy():
    """Pins the round-11 headline self-adjudication: every quiet-ref
    row carries vs_sweep_ratio; only rows whose ratio regressed >1.25x
    against the previous artifact's ratio re-capture; improvements and
    rows without a prior ratio are untouched; a mover whose recapture
    still regresses is flagged still_moved."""
    timings = {
        "drifted": 4.0,      # ratio 4.0 vs prev 1.0 -> recapture, improves
        "stuck": 3.0,        # ratio 3.0 vs prev 1.0 -> recapture stays high
        "steady": 1.2,       # ratio 1.2 vs prev 1.0 -> within 1.25x
        "improved": 0.5,     # ratio down -> never recaptured
        "fresh": 2.0,        # no prev ratio -> skipped
    }
    ambient = {n: 0.0 for n in timings}
    sweep_q = {n: 1.0 for n in timings}
    sweep_amb = {n: 0.0 for n in timings}
    prev = {"drifted": 1.0, "stuck": 1.0, "steady": 1.0, "improved": 1.0}
    captured = []

    def capture(name):
        captured.append(name)
        return {"drifted": (1.1, 0.02), "stuck": (2.9, 0.0)}[name]

    ratios, evidence = bench._ratio_mover_pass(
        list(timings), timings, ambient, 2.0, sweep_q, sweep_amb, prev, capture
    )
    assert captured == ["drifted", "stuck"]
    assert timings["drifted"] == 1.1 and ratios["drifted"] == 1.1
    assert evidence["drifted"]["prev_ratio"] == 1.0
    assert "still_moved" not in evidence["drifted"]
    assert evidence["stuck"]["still_moved"] is True
    assert "improved" not in evidence and "fresh" not in evidence
    # every quiet-ref row carries its ratio, movers or not
    assert set(ratios) == set(timings)
    assert ratios["improved"] == 0.5


def test_tree_jiffies_recoup_reaped_children():
    """Round-11 artifact wart: a pyspark worker reaped mid-window made
    its lifetime burn vanish from the live tree and the 'external'
    residue read 80 cores on a 32-vCPU box. The tree measure must
    recoup reaped descendants via the parent's cutime/cstime — burn
    CPU in a child that exits and is waited on, and the tree delta
    must contain that burn."""
    import subprocess
    import sys

    before = bench._tree_cpu_jiffies()
    subprocess.run(
        [sys.executable, "-c", "i=0\nfor _ in range(2 * 10**7): i += 1"],
        check=True,
    )
    after = bench._tree_cpu_jiffies()
    # the loop burns well over 0.3 s of CPU on any machine this runs on
    assert after - before >= int(0.3 * bench._HZ), (
        f"reaped child's burn missing from the tree: delta "
        f"{after - before} jiffies"
    )
