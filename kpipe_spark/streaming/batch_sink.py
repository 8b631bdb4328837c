"""Batch sink with the per-record coverage contract (SURVEY §2.3 K4).

kpipe's BatchSink buffers records and flushes at maxSize/maxAge; the
sink returns a BatchResult with per-index outcomes, under a coverage
contract (BatchPipelineWrapper.java:93-304, BatchResult.java:28-70):

- reported failure index        -> that record Failed
- unaccounted (missing) index   -> synthetic failure ("unaccounted")
- out-of-range index            -> logged, ignored
- sink throws / returns None    -> the WHOLE batch Failed
- everything else               -> succeeded

Spark mapping: the micro-batch is the buffer and the trigger interval
is the age bound, so only maxSize chunking and outcome classification
remain. The sink runs executor-side inside mapInPandas — records are
chunked to ``max_size``, the user function is called per chunk, and
each record comes back with a (status, error) pair that the
StreamRunner routes like any other outcome (failed -> DLQ).

The user sink receives ``list[dict]`` (records) and returns
``dict[int, str | None]``: index -> None for success or an error
message — the Python shape of BatchResult. Returning ``{}`` with
``ofVoid`` semantics (all succeeded) is ``{i: None for i in range(n)}``
or simply ``None`` is NOT allowed (whole-batch failure, per contract).
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kpipe_spark.pipeline.result import ERROR_COL, FAILED, PASSED, STATUS_COL

log = logging.getLogger(__name__)

BatchSinkFn = Callable[[list[dict]], "dict[int, str | None] | None"]


def apply_batch_sink(
    df: DataFrame,
    sink_fn: BatchSinkFn,
    max_size: int = 100,
) -> DataFrame:
    """Run sink_fn over ``max_size`` chunks of df executor-side; return
    df + (_status, _error) per the coverage contract. Input df is the
    PASSED rows of a pipeline (already stripped of outcome columns)."""
    import pandas as pd

    in_cols = df.columns
    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += f", {STATUS_COL} string, {ERROR_COL} string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_total = len(pdf)
            statuses = [PASSED] * n_total
            errors: list[str | None] = [None] * n_total
            for lo in range(0, n_total, max_size):
                chunk = pdf.iloc[lo : lo + max_size]
                records = chunk.to_dict("records")
                n = len(records)
                try:
                    result = sink_fn(records)
                except Exception as exc:  # noqa: BLE001 — whole batch fails
                    result = {i: f"{type(exc).__name__}: {exc}" for i in range(n)}
                if result is None:
                    # null result ⇒ whole-batch failure (BatchResult.java:28-70)
                    result = {i: "batch sink returned null result" for i in range(n)}
                covered = set()
                for idx, err in result.items():
                    if idx < 0 or idx >= n:
                        # out-of-range ⇒ logged, ignored
                        log.warning("batch sink reported out-of-range index %d", idx)
                        continue
                    covered.add(idx)
                    if err is not None:
                        statuses[lo + idx] = FAILED
                        errors[lo + idx] = str(err)
                for idx in range(n):
                    if idx not in covered:
                        # unaccounted ⇒ synthetic failure -> DLQ
                        statuses[lo + idx] = FAILED
                        errors[lo + idx] = "unaccounted record in batch result"
            out = pdf.copy()
            out[STATUS_COL] = statuses
            out[ERROR_COL] = errors
            yield out

    return df.mapInPandas(run, out_schema)


def batch_sink_terminal(
    sink_fn: BatchSinkFn,
    dlq_writer: Callable[[DataFrame, int], None] | None = None,
    max_size: int = 100,
) -> Callable[[DataFrame, int], None]:
    """Wrap a batch sink as a StreamRunner-compatible terminal: records
    the sink fails are routed to the DLQ writer; if any record failed
    and no DLQ is configured, the micro-batch is failed (commit held ⇒
    replay), mirroring the lockstep DLQ contract for the batch path
    (RecordProcessor.java:143-184).

    The DLQ writer gets the same deal as StreamRunner's: rows pass
    through ``dlq_frame`` (the x-dlq-* envelope — a writer
    implementation serves both paths without schema skew), and when a
    writer is configured it is invoked on EVERY batch, empty frame
    included — an idempotent batch-keyed park (IdempotentDlqParquet)
    needs the empty write as the tombstone that clears a pre-crash
    attempt's parks when the failures were transient and the replay
    succeeded. Give the batch-sink terminal its OWN park path (not
    the StreamRunner dlq_writer's): both key writes by batch_id, so
    sharing one IdempotentDlqParquet instance would have the second
    write of a batch clobber the first's parks."""
    from kpipe_spark.pipeline.sinks import dlq_frame

    def terminal(passed_df: DataFrame, batch_id: int) -> None:
        outcomes = apply_batch_sink(passed_df, sink_fn, max_size)
        outcomes.persist()
        try:
            n_failed = outcomes.filter(F.col(STATUS_COL) == FAILED).count()
            if n_failed and dlq_writer is None:
                raise RuntimeError(
                    f"batch sink failed {n_failed} records and no DLQ configured"
                )
            if dlq_writer is not None:
                dlq_writer(
                    dlq_frame(outcomes, error_class="BatchSinkException"),
                    batch_id,
                )
        finally:
            outcomes.unpersist()

    return terminal
