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
    sample: exited-and-reaped children's jiffies are not recouped,
    the documented — and for a persistent-JVM bench, irrelevant —
    limitation.)"""
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
