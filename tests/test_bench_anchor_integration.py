"""_confirm_anchor_elevations against a live session: verdict mapping,
the reuse_best3 handoff from movers_confirmation, and the
drifted-session stamp — with deterministic outcomes (every elevated
row's best-of-3 is injected through reuse_best3; only the q01 sentinel
is genuinely timed, ~4 warm builds at sf0.001)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from kpipe_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _delta(rows):
    return {"rows_elevated_vs_anchor": dict.fromkeys(rows, 9.99)}


def test_verdict_mapping_and_reuse(spark):
    queries = all_queries()
    a, b = "q42_distinct_projection", "q46_union_by_name"
    anchor_q = {
        "q01_pricing_summary": 100.0,  # sentinel can't read drifted
        a: 100.0,  # injected 0.1 fails the two-part test -> noise
        b: 1.0,  # injected 5.0 passes (>0.3 abs, >1.5x) -> persisted
    }
    out = bench._confirm_anchor_elevations(
        spark,
        SF,
        queries,
        _delta([a, b]),
        anchor_q,
        reuse_best3={a: 0.1, b: 5.0},
    )
    assert out[a]["verdict"] == "single_capture_noise"
    assert out[b]["verdict"] == "persisted_elevation"
    # the handoff is recorded so a reader knows no third timing ran
    assert out[a]["best3_from"] == "movers_confirmation"
    assert out[a]["best3"] == 0.1 and out[b]["best3"] == 5.0
    # the sentinel really ran, against its anchor value
    assert out["_sentinel"]["query"] == "q01_pricing_summary"
    assert out["_sentinel"]["best3"] > 0
    assert out["_sentinel"]["anchor"] == 100.0


def test_drifted_session_stamps_every_row(spark):
    """A confirmation session whose sentinel reads >1.5x its anchor
    value can't produce trustable verdicts — every row is stamped
    session_drifted instead (an absurdly small sentinel anchor forces
    the condition)."""
    queries = all_queries()
    a = "q42_distinct_projection"
    anchor_q = {"q01_pricing_summary": 1e-9, a: 1.0}
    out = bench._confirm_anchor_elevations(
        spark, SF, queries, _delta([a]), anchor_q, reuse_best3={a: 5.0}
    )
    assert out[a]["verdict"] == "session_drifted"


def test_rows_missing_from_anchor_or_registry_are_skipped(spark):
    queries = all_queries()
    out = bench._confirm_anchor_elevations(
        spark,
        SF,
        queries,
        _delta(["not_a_query", "q42_distinct_projection"]),
        {"q01_pricing_summary": 100.0},  # q42 absent from the anchor
        reuse_best3={},
    )
    assert set(out) == {"_sentinel"}
