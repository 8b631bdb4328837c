"""Named operator library mirroring kpipe's Operators (Operators.java).

Each helper returns a single-step Pipeline fragment so it can be
registered by name in a PipelineRegistry and composed config-driven
(docs/ESCAPE-HATCHES.md:193-199). kpipe ships exactly these primitives
(Operators.java:42-223): filter, drop, peek, map, compose, safe,
requireField, rename, removeFields, addField.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from kpipe_spark.pipeline.pipeline import ColumnLike, Pipeline


def pipe(name: str, expr: ColumnLike) -> Pipeline:
    return Pipeline().pipe(name, expr)


def map_(name: str, expr: ColumnLike) -> Pipeline:
    """Alias for pipe (Operators.map, Operators.java:96-98)."""
    return pipe(name, expr)


def peek(observation, *metrics) -> Pipeline:
    """Observe-only side channel (Operators.peek, Operators.java:76-81)."""
    return Pipeline().peek(observation, *metrics)


def filter_(pred: ColumnLike) -> Pipeline:
    return Pipeline().filter(pred)


def drop(pred: ColumnLike) -> Pipeline:
    return Pipeline().drop_when(pred)


def require_field(name: str) -> Pipeline:
    return Pipeline().require_field(name)


def rename(src: str, dst: str) -> Pipeline:
    return Pipeline().rename(src, dst)


def remove_fields(*names: str) -> Pipeline:
    """Scrub fields in place — the reference's PII example is
    removeFields("password","ssn") (docs/FORMATS.md:27)."""
    return Pipeline().remove_fields(*names)


def add_field(name: str, value: Any) -> Pipeline:
    return Pipeline().add_field(name, value)


def when(pred: ColumnLike, name: str, if_true: ColumnLike, if_false: ColumnLike) -> Pipeline:
    return Pipeline().when(pred, name, if_true, if_false)


def fail_when(pred: ColumnLike, error: str) -> Pipeline:
    return Pipeline().fail_when(pred, error)


def compose(*fragments: Pipeline) -> Pipeline:
    """Left-to-right chaining with inherent null/failure short-circuit
    (Operators.compose, Operators.java:171-181)."""
    out = Pipeline()
    for f in fragments:
        out = out.compose(f)
    return out


def safe(name: str, expr: ColumnLike, fallback: ColumnLike | None = None) -> Pipeline:
    """Attempt a transform; on null/failed evaluation keep the original
    value (Operators.safe, Operators.java:114-116). Expression analogue:
    coalesce(attempted, original)."""
    e = expr if isinstance(expr, Column) else F.col(expr)
    fb = fallback if fallback is not None else F.col(name)
    fb = fb if isinstance(fb, Column) else F.col(fb)
    return Pipeline().pipe(name, F.coalesce(e, fb))
