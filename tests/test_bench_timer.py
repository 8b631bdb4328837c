"""Round-12 bench evidence units: the sleep-timer health gate that
adjudicates the 10 ms streaming rows, the carried-rows provenance that
refuses to overwrite committed values from a degraded window, the
reap-sentinel cap in the ambient wait, and the fresh-session mover
check's verdict mapping. All probe-free logic is tested directly; the
one real probe runs with small parameters so a CI box finishes in
under a second."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

import pytest

# Round-14 suite tiering: this module is in the SLOW tier (excluded from
# the driver's default `pytest tests/ -q` run by addopts; run with -m slow).
# See pyproject.toml [tool.pytest.ini_options] for the rationale.
pytestmark = pytest.mark.slow



def test_timer_health_shape_and_consistency():
    """The probe must report p50/p90/p99 in ms, count every sample,
    and derive `healthy` from p90 vs 1.5x nominal — the exact
    threshold the artifact's carry decision keys on."""
    probe = bench._timer_health(nominal_ms=5.0, threads=4, sleeps=3)
    assert probe["samples"] == 12
    assert probe["nominal_ms"] == 5.0
    # sleep(5ms) can never return early; p50 ordering is structural
    assert 5.0 <= probe["p50_ms"] <= probe["p90_ms"] <= probe["p99_ms"]
    assert probe["healthy"] == (probe["p90_ms"] <= 7.5)


def test_await_timer_health_returns_immediately_when_healthy(monkeypatch):
    calls = []

    def fake_probe(*a, **k):
        calls.append(1)
        return {"healthy": True, "p90_ms": 10.1}

    monkeypatch.setattr(bench, "_timer_health", fake_probe)
    budget = bench._RequeueBudget()
    probe = bench._await_timer_health(budget)
    assert probe["wait_sec"] == 0
    assert len(calls) == 1
    assert budget.spent == 0


def test_await_timer_health_bounded_on_degraded_window(monkeypatch):
    """A window that never heals must stop at the wait bound (and at
    the shared requeue budget), not spin forever."""
    monkeypatch.setattr(
        bench, "_timer_health", lambda *a, **k: {"healthy": False, "p90_ms": 30.0}
    )
    slept = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    budget = bench._RequeueBudget()
    probe = bench._await_timer_health(budget, max_wait=45.0)
    assert probe["healthy"] is False
    assert probe["wait_sec"] == 45  # 3 x 15 s re-probe waits
    assert budget.spent == 45


def test_await_ambient_quiet_breaks_on_persistent_reap_sentinel(monkeypatch):
    """A persistent reap pattern makes every sample read the 99.0
    sentinel; the wait must break after 5 consecutive sentinels
    instead of burning the entire budget before capturing hot anyway
    (round-11 ADVICE)."""
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "_total_busy_jiffies", lambda: 0)
    monkeypatch.setattr(bench, "_tree_cpu_jiffies", lambda: 0)
    monkeypatch.setattr(
        bench, "_ext_cores", lambda *a: bench.AMBIENT_REAP_CORRUPTED
    )
    budget = bench._RequeueBudget()
    waited = bench._await_ambient_quiet(10.0, budget, max_wait=240.0)
    assert waited == 10.0  # 5 corrupted 2 s windows, then break


def test_await_ambient_quiet_sentinel_streak_resets(monkeypatch):
    """An isolated corrupted window between hot samples must NOT trip
    the cap — only a consecutive run means quiet is unobservable."""
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "_total_busy_jiffies", lambda: 0)
    monkeypatch.setattr(bench, "_tree_cpu_jiffies", lambda: 0)
    seq = iter(
        [bench.AMBIENT_REAP_CORRUPTED, 50.0] * 4 + [0.0]  # quiet at last
    )
    monkeypatch.setattr(bench, "_ext_cores", lambda *a: next(seq))
    budget = bench._RequeueBudget()
    waited = bench._await_ambient_quiet(10.0, budget, max_wait=240.0)
    assert waited == 18.0  # 9 windows: streak never reached 5


def _healthy_prev() -> dict:
    doc = {k: 1 for k in bench._KEYS_10MS}
    doc["timer_health"] = {"healthy": True, "p90_ms": 10.2}
    return doc


def test_carried_rows_from_healthy_prev():
    rows = bench._carried_10ms_rows(_healthy_prev())
    assert rows["streaming_10ms_timer_degraded"] is True
    assert rows["streaming_10ms_carry_age"] == 1
    assert all(rows[k] == 1 for k in bench._KEYS_10MS)


def test_carried_rows_chain_through_prior_carry():
    """A prev artifact that was itself carrying (degraded probe, but
    marked) chains forward with the hop count incremented — its values
    originate from a healthy capture."""
    prev = _healthy_prev()
    prev["timer_health"] = {"healthy": False, "p90_ms": 31.0}
    prev["streaming_10ms_carry_age"] = 2
    rows = bench._carried_10ms_rows(prev)
    assert rows["streaming_10ms_carry_age"] == 3
    assert rows["streaming_rps_10ms_work"] == 1


def test_carried_rows_refuse_unproven_legacy_artifact():
    """An artifact with no timer_health (every round <= 11) may be a
    degraded capture — it must NOT launder forward; the keys ship as
    explicit nulls."""
    prev = {k: 1 for k in bench._KEYS_10MS}  # values present, no probe
    rows = bench._carried_10ms_rows(prev)
    assert rows["streaming_10ms_timer_degraded"] is True
    assert "streaming_10ms_carry_age" not in rows
    assert all(rows[k] is None for k in bench._KEYS_10MS)


def test_carried_rows_refuse_incomplete_prev():
    prev = _healthy_prev()
    prev.pop("work_overlap_ab")
    rows = bench._carried_10ms_rows(prev)
    assert all(rows[k] is None for k in bench._KEYS_10MS)


def test_ambient_during_passes_result_through():
    """The streaming-row ambient evidence wrapper: fn's return value
    passes through and the measurement is a non-negative core count
    (or the corrupted-window sentinel). The own-burn-lands-in-tree
    attribution property is _ext_cores'/_tree_cpu_jiffies' and is
    pinned in test_bench_ambient.py — asserting a LOW value here would
    make this test fail whenever a real neighbor runs."""
    import time as _t

    def burn():
        end = _t.perf_counter() + 0.2
        x = 0
        while _t.perf_counter() < end:
            x += 1
        return 42

    out, ext = bench._ambient_during(burn)
    assert out == 42
    assert ext >= 0.0


def test_gated_stream_run_retries_hot_window_keep_max(monkeypatch):
    """A streaming capture whose window was hot is re-run after the
    quiet wait; the higher steady rate wins (contention only deflates
    throughput), and the retry is counted."""
    seq = iter([((100, 50), 5.0), ((100, 80), 0.1)])
    monkeypatch.setattr(bench, "_ambient_during", lambda fn: next(seq))
    monkeypatch.setattr(
        bench, "_await_ambient_quiet", lambda g, b, **k: 0.0
    )
    budget = bench._RequeueBudget()
    r, ext, rq = bench._gated_stream_run(lambda: None, 2.0, budget)
    assert (r, ext, rq) == ((100, 80), 0.1, 1)


def test_gated_stream_run_keeps_faster_first_capture(monkeypatch):
    """If the hot first capture was nevertheless FASTER, it stays —
    with its hot ambient attached, so the artifact shows its work."""
    seq = iter([((100, 90), 5.0), ((100, 40), 0.1)])
    monkeypatch.setattr(bench, "_ambient_during", lambda fn: next(seq))
    monkeypatch.setattr(
        bench, "_await_ambient_quiet", lambda g, b, **k: 0.0
    )
    budget = bench._RequeueBudget()
    r, ext, rq = bench._gated_stream_run(lambda: None, 2.0, budget)
    assert (r, ext, rq) == ((100, 90), 5.0, 1)


def test_gated_stream_run_quiet_window_no_retry(monkeypatch):
    calls = []

    def once(fn):
        calls.append(1)
        return (100, 70), 0.2

    monkeypatch.setattr(bench, "_ambient_during", once)
    budget = bench._RequeueBudget()
    r, ext, rq = bench._gated_stream_run(lambda: None, 2.0, budget)
    assert (r, ext, rq) == ((100, 70), 0.2, 0)
    assert len(calls) == 1


class _FakeProc:
    def __init__(self, stdout: str):
        self.stdout = stdout
        self.stderr = ""
        self.returncode = 0


def test_fresh_session_check_verdicts(monkeypatch):
    """Verdict mapping from the fresh best-of-3: a mover that relaxed
    back is session_weather; one still over the _is_mover threshold
    while the sentinel sits at its prev level is confirmed_fresh."""
    import subprocess

    fresh = {
        bench._FRESH_SENTINEL: 0.50,
        "d08_similarity_topk": 0.9,  # prev 0.8 -> relaxed back
        "d62_ivf_cell_profile": 3.0,  # prev 1.0 -> still 3x + >0.3s
    }

    def fake_run(*a, **k):
        return _FakeProc("noise\nFRESHJSON:" + json.dumps(fresh) + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = bench._fresh_session_check(
        "/unused",
        {"d08_similarity_topk": 0.8, "d62_ivf_cell_profile": 1.0},
        sentinel_prev=0.51,
    )
    assert out["sentinel"]["ratio"] < 1.25
    assert out["movers"]["d08_similarity_topk"]["verdict"] == "session_weather"
    assert out["movers"]["d62_ivf_cell_profile"]["verdict"] == "confirmed_fresh"


def test_fresh_session_check_drifted_sentinel(monkeypatch):
    """When the sentinel itself reads >1.25x prev, the fresh session
    is also bad weather — no mover verdict can be concluded."""
    import subprocess

    fresh = {bench._FRESH_SENTINEL: 0.80, "d62_ivf_cell_profile": 3.0}

    def fake_run(*a, **k):
        return _FakeProc("FRESHJSON:" + json.dumps(fresh))

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = bench._fresh_session_check(
        "/unused", {"d62_ivf_cell_profile": 1.0}, sentinel_prev=0.51
    )
    assert (
        out["movers"]["d62_ivf_cell_profile"]["verdict"]
        == "fresh_session_also_drifted"
    )


def test_fresh_session_check_no_output(monkeypatch):
    import subprocess

    monkeypatch.setattr(
        subprocess, "run", lambda *a, **k: _FakeProc("no marker here")
    )
    out = bench._fresh_session_check("/unused", {"x": 1.0}, 0.5)
    assert "error" in out


def test_headline_carry_candidates_prefers_committed_headline(tmp_path, monkeypatch):
    """Round-12 ADVICE #3: a degraded-timer run with a FRESH --out path
    must fall back to committed headline artifacts — BENCH_HEADLINE
    first, then the newest BENCH_r{NN} — never ship nulls while a
    healthy committed capture exists, and never list its own out
    path."""
    monkeypatch.setattr(bench, "_REPO_DIR", str(tmp_path))
    for name in ("BENCH_HEADLINE.json", "BENCH_r11.json", "BENCH_r12.json"):
        (tmp_path / name).write_text("{}")
    cands = bench._headline_carry_candidates(str(tmp_path / "BENCH_r13.json"))
    names = [os.path.basename(p) for p in cands]
    assert names == ["BENCH_HEADLINE.json", "BENCH_r12.json", "BENCH_r11.json"]
    # writing over an EXISTING committed artifact excludes it
    cands2 = bench._headline_carry_candidates(
        str(tmp_path / "BENCH_HEADLINE.json")
    )
    assert os.path.basename(cands2[0]) == "BENCH_r12.json"


def test_carry_fallback_reads_committed_headline_rows(tmp_path, monkeypatch):
    """End-to-end shape of the fallback: out_path missing, committed
    BENCH_HEADLINE healthy — the carry sources its rows, not nulls."""
    monkeypatch.setattr(bench, "_REPO_DIR", str(tmp_path))
    committed = _healthy_prev()
    (tmp_path / "BENCH_HEADLINE.json").write_text(json.dumps(committed))
    out_path = str(tmp_path / "BENCH_r13.json")
    prev_10ms = {}
    for cand in [out_path, *bench._headline_carry_candidates(out_path)]:
        try:
            with open(cand) as f:
                prev_10ms = json.load(f)
            break
        except (OSError, json.JSONDecodeError):
            continue
    rows = bench._carried_10ms_rows(prev_10ms)
    assert rows["streaming_10ms_carry_age"] == 1
    assert all(rows[k] == 1 for k in bench._KEYS_10MS)


def _sweep_doc(queries, ambient=None, total=None, loadavg=0.5):
    return {
        "queries": queries,
        "ambient_load_per_query": ambient or {n: 0.0 for n in queries},
        "value": total if total is not None else round(sum(queries.values()), 1),
        "loadavg_start": loadavg,
    }


def test_anchor_delta_flags_persisted_elevation(tmp_path, monkeypatch):
    """Round-12 verdict What's-wrong #2: a step-change that persists
    reads as an IMPROVEMENT in the round-over-round delta (r12 vs r11
    after stepping up in r11); the anchor delta keeps it flagged until
    it returns to anchor level. q02 stepped 1.0 -> 2.0 and stayed —
    sweep_delta vs prev sees 2.0 -> 1.9 (green), anchor sees 1.9x."""
    monkeypatch.setattr(bench, "_REPO_DIR", str(tmp_path))
    monkeypatch.setattr(bench, "_ambient_gate", lambda: 8.0)
    anchor = _sweep_doc({"q01_pricing_summary": 0.5, "q02": 1.0, "q03": 3.0})
    prev = _sweep_doc({"q01_pricing_summary": 0.55, "q02": 2.0, "q03": 3.1})
    (tmp_path / "SWEEP_r10.json").write_text(json.dumps(anchor))
    (tmp_path / "SWEEP_r11.json").write_text(json.dumps(prev))
    cur = _sweep_doc({"q01_pricing_summary": 0.56, "q02": 1.9, "q03": 3.0})
    out_path = str(tmp_path / "SWEEP_r12.json")

    apath = bench._anchor_sweep_artifact(out_path)
    assert os.path.basename(apath) == "SWEEP_r10.json"
    ad = bench._anchor_delta(cur, apath)
    assert ad["anchor_artifact"] == "SWEEP_r10.json"
    assert ad["vs_anchor_ratio"]["q02"] == 1.9
    assert list(ad["rows_elevated_vs_anchor"]) == ["q02"]
    # while the round-over-round delta reads q02 as an improvement
    sd = bench._sweep_delta(cur, str(tmp_path / "SWEEP_r11.json"))
    assert "q02" not in sd["movers"]


def test_anchor_delta_ignores_hot_rows_and_small_absolutes(tmp_path, monkeypatch):
    """Rows hot in EITHER artifact aren't compared (the standing
    evidence rule), and a 1.5x ratio on a sub-0.3s delta is not an
    elevation (the shared two-part mover discipline)."""
    monkeypatch.setattr(bench, "_REPO_DIR", str(tmp_path))
    monkeypatch.setattr(bench, "_ambient_gate", lambda: 8.0)
    anchor = _sweep_doc(
        {"q01_pricing_summary": 0.5, "qhot": 1.0, "qtiny": 0.1},
        ambient={"q01_pricing_summary": 0.0, "qhot": 50.0, "qtiny": 0.0},
    )
    (tmp_path / "SWEEP_r10.json").write_text(json.dumps(anchor))
    cur = _sweep_doc(
        {"q01_pricing_summary": 0.5, "qhot": 9.0, "qtiny": 0.2}
    )
    ad = bench._anchor_delta(cur, str(tmp_path / "SWEEP_r10.json"))
    assert "qhot" not in ad["vs_anchor_ratio"]  # hot in the anchor
    assert ad["vs_anchor_ratio"]["qtiny"] == 2.0
    assert "qtiny" not in ad["rows_elevated_vs_anchor"]  # < 0.3s abs
    assert "bisect_flag" not in ad


def test_anchor_delta_bisect_flag_on_cumulative_drift(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_REPO_DIR", str(tmp_path))
    monkeypatch.setattr(bench, "_ambient_gate", lambda: 8.0)
    anchor = _sweep_doc({"qa": 10.0, "qb": 10.0})
    (tmp_path / "SWEEP_r06.json").write_text(json.dumps(anchor))
    cur = _sweep_doc({"qa": 16.0, "qb": 15.0})
    ad = bench._anchor_delta(cur, str(tmp_path / "SWEEP_r06.json"))
    assert ad["quiet_subtotal_ratio_vs_anchor"] >= 1.5
    assert "bisect_flag" in ad


def test_sentinel_series_spans_all_committed_sweeps(tmp_path, monkeypatch):
    """The q01/total trend is carried IN the artifact, oldest first,
    current run last — the monotone-creep view (0.488 -> 0.626 -> 0.91
    across r10-r12) that used to require opening every artifact."""
    monkeypatch.setattr(bench, "_REPO_DIR", str(tmp_path))
    for rnd, q01 in ((10, 0.488), (11, 0.626), (12, 0.91)):
        (tmp_path / f"SWEEP_r{rnd}.json").write_text(
            json.dumps(
                _sweep_doc({"q01_pricing_summary": q01}, total=100.0 + rnd)
            )
        )
    cur = _sweep_doc({"q01_pricing_summary": 0.88}, total=115.0)
    series = bench._sentinel_series(str(tmp_path / "SWEEP_r13.json"), cur)
    assert [s["artifact"] for s in series] == [
        "SWEEP_r10.json", "SWEEP_r11.json", "SWEEP_r12.json", "SWEEP_r13.json"
    ]
    assert [s["q01"] for s in series] == [0.488, 0.626, 0.91, 0.88]
    assert series[-1]["total"] == 115.0
