"""User-facing test kit (SURVEY §5): deterministic crash-restart
harness and a capturing sink — the Spark rebuild of kpipe's
``kpipe-test`` module (CrashRestartHarness.java:24-63,
CapturingSink.java:21-52).

The reference harness expresses crash geometry as seeded ranges, not
wall-clock timing: consumer A processes ``[0, P)`` but commits only
``[0, k)``, then a fresh consumer B is driven over the resume window
``[k, N)`` — so the uncommitted tail ``[k, P)`` provably reappears in
B's output, which is where a pipeline's idempotency/dedup gets tested.

The Spark translation keeps the same geometry with checkpoints instead
of MockConsumer offsets: each range becomes one file = one micro-batch
(``maxFilesPerTrigger=1``); phase A's sink CAPTURES the ``[k, P)``
batch and then raises, so foreachBatch fails and the checkpoint commit
for that batch is withheld — processed-but-uncommitted, exactly what an
abrupt kill leaves behind. Phase B restarts on the same checkpoint and
replays from ``k``.
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from kpipe_spark.pipeline import Pipeline
from kpipe_spark.streaming import ProcessingMode, StreamRunner
from kpipe_spark.streaming.sources import file_source


class CapturingSink:
    """A sink callable that records every delivered row, for assertions.

    Thread-safe (CapturingSink.java:21-52 semantics): ``captured()``
    returns a snapshot list, so assertions never observe a half-appended
    batch. Usable anywhere a ``(df, batch_id)`` callable is accepted —
    ``StreamRunner.sink``, ``dlq_writer``, or a batch sink.
    """

    def __init__(self) -> None:
        self._rows: list = []
        self._lock = threading.Lock()

    def __call__(self, df, batch_id: int) -> None:
        rows = df.collect()
        with self._lock:
            self._rows.extend(rows)

    def captured(self) -> list:
        with self._lock:
            return list(self._rows)

    def count(self) -> int:
        with self._lock:
            return len(self._rows)

    def clear(self) -> None:
        with self._lock:
            self._rows.clear()


class _CrashingSink:
    """Captures every batch, then raises once the crash batch arrives."""

    def __init__(self, inner: CapturingSink, crash_on_batch_index: int) -> None:
        self.inner = inner
        self.crash_on = crash_on_batch_index
        self.seen = 0

    def __call__(self, df, batch_id: int) -> None:
        idx = self.seen
        self.seen += 1
        self.inner(df, batch_id)
        if idx == self.crash_on:
            raise RuntimeError("simulated crash: batch processed but not committed")


@dataclass
class CrashRestartResult:
    """Outcome of one harness run (CrashRestartHarness.Result analogue)."""

    first_run: list
    second_run: list
    uncommitted_tail: list[dict]
    seed: list[dict]

    def second_run_ids(self, id_col: str) -> set:
        return {r[id_col] for r in self.second_run}

    def tail_ids(self, id_col: str) -> set:
        return {r[id_col] for r in self.uncommitted_tail}


@dataclass
class CrashRestartHarness:
    """Builder-style deterministic crash-restart driver.

    ```python
    result = (
        CrashRestartHarness(spark, schema, str(tmp_path))
        .with_pipeline(Pipeline().add_field("stage", "v1"))
        .seed(rows)          # N records
        .commit_up_to(3)     # A commits through offset 3
        .crash_after(7)      # A processes [0, 7), then crashes
        .restart()           # B's resume window is [3, N)
    )
    assert result.tail_ids("event_id") <= result.second_run_ids("event_id")
    ```

    Under ``ProcessingMode.PARALLEL`` (default) the captured order is
    not the seed order — make assertions order-insensitive, same caveat
    as the reference (CrashRestartHarness.java:104-109).
    """

    spark: SparkSession
    schema: str
    workdir: str
    mode: ProcessingMode = ProcessingMode.PARALLEL
    _pipeline: Pipeline = field(default_factory=Pipeline)
    _seed: list[dict] | None = None
    _commit_up_to: int = -1
    _crash_after: int = -1
    _dlq_writer: Any = None

    def with_pipeline(self, pipeline: Pipeline) -> CrashRestartHarness:
        self._pipeline = pipeline
        return self

    def with_dlq(self, dlq_writer: Any) -> CrashRestartHarness:
        """Attach a DLQ writer to BOTH phases — the crash geometry then
        exercises the replayed-park path (a batch that parked to the
        DLQ, crashed before commit, and re-parks on restart), which is
        where a DLQ sink's idempotency is proven or broken."""
        self._dlq_writer = dlq_writer
        return self

    def with_processing_mode(self, mode: ProcessingMode) -> CrashRestartHarness:
        self.mode = mode
        return self

    def seed(self, rows: list[dict]) -> CrashRestartHarness:
        if not rows:
            raise ValueError("seed cannot be empty")
        self._seed = list(rows)
        return self

    def commit_up_to(self, k: int) -> CrashRestartHarness:
        self._commit_up_to = k
        return self

    def crash_after(self, p: int) -> CrashRestartHarness:
        self._crash_after = p
        return self

    def _write(self, sub: str, name: str, rows: list[dict]) -> str:
        d = os.path.join(self.workdir, sub)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        return d

    def restart(self) -> CrashRestartResult:
        """Run phase A (process ``[0, P)``, commit ``[0, k)``, crash),
        then phase B (same checkpoint, resume window ``[k, N)``)."""
        if self._seed is None:
            raise ValueError("seed(...) is required")
        n, k, p = len(self._seed), self._commit_up_to, self._crash_after
        if not (0 < k < p <= n):
            raise ValueError(
                f"crash geometry must satisfy 0 < commit_up_to ({k}) < "
                f"crash_after ({p}) <= len(seed) ({n})"
            )
        src = os.path.join(self.workdir, "src")
        ckpt = os.path.join(self.workdir, "ckpt")
        # one file per range => one micro-batch per range. Ranges are
        # DRIVEN one at a time (write file, drain, write next): the file
        # source orders same-mtime files arbitrarily, so pre-writing
        # both ranges would leave the batch order to a directory-listing
        # race — the exact nondeterminism this harness exists to avoid.
        self._write("src", "part-000-committed.json", self._seed[:k])
        captured_a = CapturingSink()
        runner_a = StreamRunner(
            pipeline=self._pipeline,
            sink=_CrashingSink(captured_a, crash_on_batch_index=1),
            dlq_writer=self._dlq_writer,
            mode=self.mode,
        )
        handle_a = runner_a.start(
            self._stream(src), ckpt, query_name="kpipe-crash-phase-a"
        )
        try:
            handle_a.process_all_available()  # [0, k) commits
            self._write("src", "part-001-uncommitted.json", self._seed[k:p])
            try:
                handle_a.process_all_available()  # [k, p) crashes mid-batch
            except Exception:  # noqa: BLE001 — the simulated crash
                pass
        finally:
            handle_a.close()

        # phase B: the rest of the log lands while we're "down"
        if p < n:
            self._write("src", "part-002-tail.json", self._seed[p:])
        captured_b = CapturingSink()
        runner_b = StreamRunner(
            pipeline=self._pipeline,
            sink=captured_b,
            dlq_writer=self._dlq_writer,
            mode=self.mode,
        )
        handle_b = runner_b.start(
            self._stream(src), ckpt, query_name="kpipe-crash-phase-b"
        )
        handle_b.process_all_available()
        handle_b.close()

        return CrashRestartResult(
            first_run=captured_a.captured(),
            second_run=captured_b.captured(),
            uncommitted_tail=self._seed[k:p],
            seed=self._seed,
        )

    def _stream(self, src: str) -> Any:
        return file_source(self.spark, src, self.schema)
