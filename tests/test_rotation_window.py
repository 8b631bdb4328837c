"""The FLAGSHIP_50 driver window must equal the machine computation.

Round 8's verdict caught the hand-maintained window silently dropping
d24_dup_clusters from its own rationale comment. This test makes that
class of drift a CI failure: the literal in queries/__init__.py must
equal `rotation.compute_window` over the committed CORRECTNESS
artifacts and the live registry. No Spark session needed — the
computation is pure registry + JSON.
"""

from __future__ import annotations

import os

from kpipe_spark.queries import FLAGSHIP_50, QUERIES, all_queries
from kpipe_spark.queries.rotation import (
    SENTINELS,
    WINDOW_SIZE,
    compute_window,
    current_window,
    latest_grades,
)


def test_flagship_matches_computation():
    """INTENTIONAL TRIPWIRE at round start: when a new
    CORRECTNESS_r{N}.json lands, the stalest-first order changes and
    this fails until the window is rotated. Fix = run
    `python -m kpipe_spark.queries.rotation` and paste its output
    into FLAGSHIP_50 (kpipe_spark/queries/__init__.py)."""
    computed = current_window()
    missing = sorted(set(computed) - set(FLAGSHIP_50))
    extra = sorted(set(FLAGSHIP_50) - set(computed))
    assert FLAGSHIP_50 == computed, (
        "FLAGSHIP_50 is stale vs the committed CORRECTNESS artifacts "
        f"(should gain: {missing}; should drop: {extra}) — rotate with "
        "`python -m kpipe_spark.queries.rotation` (docstring above)"
    )


def test_window_shape():
    all_queries()
    assert len(FLAGSHIP_50) == WINDOW_SIZE
    assert len(set(FLAGSHIP_50)) == WINDOW_SIZE
    assert FLAGSHIP_50[: len(SENTINELS)] == SENTINELS
    # every windowed entry exists and (sentinels aside) is oracle-backed
    for name in FLAGSHIP_50:
        assert name in QUERIES, name
        assert QUERIES[name].oracle is not None, (
            f"{name} is rows-only; it would spend a hash-pass slot on an "
            f"err=no_oracle row — see rotation.py"
        )


def test_first_time_grades_lead_the_rotation():
    """New ops (never driver-graded) must precede every re-grade."""
    all_queries()
    grades = latest_grades()
    tail = FLAGSHIP_50[len(SENTINELS):]
    seen_regrade = False
    for name in tail:
        if name in grades:
            seen_regrade = True
        else:
            assert not seen_regrade, (
                f"first-time grade {name} appears after a re-grade slot"
            )


def test_regrades_are_stalest_first():
    all_queries()
    grades = latest_grades()
    rounds = [grades[n] for n in FLAGSHIP_50[len(SENTINELS):] if n in grades]
    assert rounds == sorted(rounds)


def test_compute_window_rejects_oversubscription():
    import pytest

    with pytest.raises(ValueError):
        compute_window(
            registry_order=[f"n{i}" for i in range(10)],
            oracle_backed={f"n{i}" for i in range(10)},
            grades={},
            size=4,
            sentinels=(),
        )


def test_window_is_import_order_independent():
    """Round-10 regression: a module importing one query module
    directly (tests/test_llm_ops13.py does, at collection time) hoists
    that module's registrations to the front of the raw QUERIES dict
    for the whole process — the rotation computation must not see
    that. canonical_order() keys on QUERY_MODULES + within-module
    registration, so the window is a pure function of committed state
    in ANY import order. Compares a POLLUTED subprocess computation
    against an UNPOLLUTED one — deliberately never the FLAGSHIP_50
    literal, so at a round boundary only test_flagship_matches_
    computation (the armed tripwire) fires, not this test too
    (round-10 verdict: "exactly one expected red at round start")."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def window_in_subprocess(polluted: bool) -> str:
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            + (
                "import kpipe_spark.queries.llm_ops13\n"  # the pollution
                if polluted
                else ""
            )
            + "from kpipe_spark.queries import QUERIES, all_queries\n"
            "from kpipe_spark.queries.rotation import current_window\n"
            "all_queries()\n"
            + (
                "assert list(QUERIES)[0].startswith('d86'), "
                "'pollution did not hoist'\n"
                if polluted
                else ""
            )
            + "print('\\n'.join(current_window()))\n"
        ) % (repo,)
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert proc.returncode == 0, proc.stderr[-1500:]
        return proc.stdout

    assert window_in_subprocess(polluted=True) == window_in_subprocess(
        polluted=False
    )
