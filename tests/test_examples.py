"""The examples/ scripts are living documentation of the API surface —
run each end-to-end so they can't rot."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

# Round-14 suite tiering: this module is in the SLOW tier (excluded from
# the driver's default `pytest tests/ -q` run by addopts; run with -m slow).
# See pyproject.toml [tool.pytest.ini_options] for the rationale.
pytestmark = pytest.mark.slow


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize(
    "script,expect",
    [
        ("examples/json_pipeline.py", "outcomes:"),
        ("examples/streaming_dlq.py", "DLQ-parked per batch: [10]"),
        ("examples/multi_topic.py", "unrouted dropped: 5"),
        ("examples/corpus_curation.py", "curation funnel:"),
        ("examples/avro_static.py", "v2 field silently dropped = True"),
        ("examples/schema_registry_mode.py", "v2 field preserved + bad envelope contained = True"),
        ("examples/protobuf_sr.py", "envelope routing parsed: 3 of 4"),
        ("examples/circuit_breaker.py", "CLOSED -> OPEN -> HALF_OPEN -> CLOSED = True"),
        ("examples/tracing_propagation.py", "preserved trace-id, fresh span-id = True"),
        ("examples/custom_format.py", "decode + error-path contract = True"),
        ("examples/backpressure_roll.py", "shrink -> roll -> restore = True"),
        ("examples/incremental_admission.py", "incremental == full recompute = True"),
        ("examples/corpus_assembly.py", "budget + mixture + shard audit consistent = True"),
        ("examples/passage_retrieval.py", "copied chunk retrieves its source at cosine ~1.0 = True"),
        ("examples/data_selection.py", "DSIR + novelty + budget admission invariant holds = True"),
        # one run, both contract lines (the snapshot report and the
        # streaming-monitor audit) — a second parametrize row would
        # re-run the heaviest example end-to-end for no added coverage
        (
            "examples/corpus_monitoring.py",
            (
                "corpus health invariants hold = True",
                "streaming monitors match oracle queries, replay-safe = True",
            ),
        ),
        ("examples/ann_serving.py", "search == oracle-checked d88 rows = True"),
        ("examples/cluster_reuse.py", "stored == inline for all consumers, keep-one + attach sound = True"),
        (
            "examples/release_cadence.py",
            (
                "append-without-fold refused with repair recipe = True",
                "incremental fold == full rebuild, stored reports == graded shape, keep-one + ledger sound = True",
            ),
        ),
        ("examples/ann_streaming_append.py", "replay-safe streaming append -> advisory -> compact, search == oracle d88 rows = True"),
        ("examples/ann_streaming_serving.py", "streaming ANN serving sound = True"),
        ("examples/tokenizer_training.py", "stored vocab == oracle-checked d90 rows = True"),
        ("examples/streaming_admission.py", "replay admitted 0, gate sound, index and bitmap unchanged = True"),
        ("examples/streaming_cluster_fold.py", "streaming cluster fold sound = True"),
    ],
)
def test_example_runs(script, expect):
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, script), "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    for line in (expect,) if isinstance(expect, str) else expect:
        assert line in proc.stdout
