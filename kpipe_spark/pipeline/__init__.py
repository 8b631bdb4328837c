"""The kpipe pipeline API, re-expressed over DataFrames.

Reference semantics (all /root/reference): a pipeline is
``deserialize -> operators -> sink`` with a sealed three-way outcome per
record — Passed / Filtered / Failed (kpipe-core Result.java:31-103).
A thrown exception becomes Failed, a null return becomes Filtered, and
both short-circuit downstream operators (TypedPipelineBuilder.java:150-162).

Here the outcome is a pair of ordinary columns (``_status``, ``_error``)
so Catalyst optimizes the whole pipeline as one expression tree; "filter
is not a silent drop" (Result.java:18-23) falls out for free because
filtered rows stay in the frame until a terminal splits them.
"""

from kpipe_spark.pipeline.result import (  # noqa: F401
    ERROR_COL,
    FAILED,
    FILTERED,
    PASSED,
    STATUS_COL,
    ensure_outcome,
    outcome_counts,
)
from kpipe_spark.pipeline.files import read_jsonl  # noqa: F401
from kpipe_spark.pipeline.pipeline import Pipeline  # noqa: F401
from kpipe_spark.pipeline.registry import PipelineRegistry  # noqa: F401
