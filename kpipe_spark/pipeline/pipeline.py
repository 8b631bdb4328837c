"""The Stream<T>-shaped pipeline builder.

Mirrors the fluent surface of kpipe's Stream (kpipe-api Stream.java:24-44):
``pipe / filter / drop / when / peek / skip_bytes`` plus the Operators
library (operators.py), with kpipe's execution contract
(TypedPipelineBuilder.java:150-162):

- predicate false        -> Filtered (status transition, row retained)
- operator raises        -> Failed(cause) (captured as data, task survives)
- otherwise              -> Passed(value)
- filtered/failed rows short-circuit every later operator.

Implementation notes (Spark-first):
- Column-expression steps are folded into the lineage guarded by
  ``_status = 'passed'`` so one whole-stage-codegen region evaluates the
  entire operator chain; nothing is materialized between steps.
- Python steps are vectorized pandas UDFs; per-row exceptions are caught
  inside the UDF and surfaced as (value, error) pairs — a poison record
  fails that record, never the Spark task (SURVEY §7 risk register).
- The builder is immutable: every call returns a new Pipeline, matching
  DefaultStream's copy-on-write records (DefaultStream.java:34-57).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, replace
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kpipe_spark.pipeline.result import (
    ERROR_COL,
    FAILED,
    FILTERED,
    PASSED,
    STATUS_COL,
    ensure_outcome,
)

ColumnLike = Column | str


def _as_col(c: ColumnLike) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _passed() -> Column:
    # built lazily: classic-mode Column construction needs a live session
    return F.col(STATUS_COL) == PASSED


@dataclass(frozen=True)
class Pipeline:
    """Immutable chain of outcome-aware steps over a DataFrame.

    Build with ``Pipeline()`` then fluent calls; ``apply(df)`` compiles
    the chain onto a DataFrame lineage (no execution until an action).
    """

    steps: tuple[Callable[[DataFrame], DataFrame], ...] = ()

    def _with(self, step: Callable[[DataFrame], DataFrame]) -> "Pipeline":
        return replace(self, steps=self.steps + (step,))

    # -- core fluent surface (Stream.java:46-81) ---------------------------

    def pipe(self, name: str, expr: ColumnLike) -> "Pipeline":
        """Set/overwrite column ``name``; evaluated only for passed rows.

        The Spark analogue of Stream.pipe(UnaryOperator<T>) for
        expression-shaped transforms (null result does NOT filter here —
        use require_field/filter for kpipe's null-means-filtered contract
        on schema-less payloads).
        """
        e = _as_col(expr)

        def step(df: DataFrame) -> DataFrame:
            old = F.col(name) if name in df.columns else F.lit(None)
            return df.withColumn(
                name, F.when(_passed(), e).otherwise(old)
            )

        return self._with(step)

    def filter(self, pred: ColumnLike) -> "Pipeline":
        """Keep iff pred; false/null => Filtered (Stream.java:55-62)."""
        p = _as_col(pred)

        def step(df: DataFrame) -> DataFrame:
            return df.withColumn(
                STATUS_COL,
                F.when(
                    _passed() & ~F.coalesce(p, F.lit(False)), FILTERED
                ).otherwise(F.col(STATUS_COL)),
            )

        return self._with(step)

    def drop_when(self, pred: ColumnLike) -> "Pipeline":
        """Inverse filter (Operators.drop, Operators.java:59-61)."""
        return self.filter(~F.coalesce(_as_col(pred), F.lit(False)))

    def when(
        self, pred: ColumnLike, name: str, if_true: ColumnLike, if_false: ColumnLike
    ) -> "Pipeline":
        """Conditional transform; both branches required — drop-on-else is
        rejected by the reference API too (Stream.java:73-81, docs/API.md:37).
        """
        return self.pipe(
            name, F.when(_as_col(pred), _as_col(if_true)).otherwise(_as_col(if_false))
        )

    def fail_when(self, pred: ColumnLike, error: ColumnLike | str) -> "Pipeline":
        """Mark matching passed rows Failed with an error message.

        Expression-level analogue of an operator throwing
        (MessagePipeline.java:8-19: exception => Failed(cause)).
        """
        err = F.lit(error) if isinstance(error, str) else error
        p = _as_col(pred)

        def step(df: DataFrame) -> DataFrame:
            hit = _passed() & F.coalesce(p, F.lit(False))
            return df.withColumn(
                ERROR_COL, F.when(hit, err).otherwise(F.col(ERROR_COL))
            ).withColumn(
                STATUS_COL, F.when(hit, FAILED).otherwise(F.col(STATUS_COL))
            )

        return self._with(step)

    def require_field(self, name: str) -> "Pipeline":
        """Null/missing field => Filtered (Operators.java:130-132).

        ``name`` may be a nested path ('payload.id'): a resolvable
        path is null-checked; only a genuinely unresolvable name
        filters everything (the missing-field contract). A top-level
        column whose NAME contains a dot is matched literally first."""

        def step(df: DataFrame) -> DataFrame:
            from pyspark.errors import AnalysisException

            if name in df.columns:
                present = F.col(f"`{name}`").isNotNull()
            else:
                try:
                    df.select(F.col(name))  # probe: does the path resolve?
                    present = F.col(name).isNotNull()
                except AnalysisException:
                    present = F.lit(False)
            return df.withColumn(
                STATUS_COL,
                F.when(_passed() & ~present, FILTERED).otherwise(
                    F.col(STATUS_COL)
                ),
            )

        return self._with(step)

    def safe_cast(self, name: str, src: ColumnLike, dtype: str) -> "Pipeline":
        """Cast with kpipe's failure contract under ANSI SQL.

        This session runs ANSI mode (Spark 4 default), where a plain
        CAST on a poison value throws and fails the TASK — kpipe's
        contract is exception ⇒ Failed(that record) only
        (MessagePipeline.java:8-19). try_cast yields null on a bad
        value; a null result from a non-null input is therefore a
        per-row cast failure: status Failed, error recorded, task
        survives.
        """
        s = _as_col(src)

        def step(df: DataFrame) -> DataFrame:
            casted = s.try_cast(dtype)
            # preserve the pre-step value on already-Filtered/Failed
            # rows (pipe()'s rule): a record that short-circuited must
            # carry its last value to the DLQ/filter split, not NULL.
            # The column must take ONE type, so preservation is typed:
            # old.try_cast(dtype) — representable values survive, an
            # unrepresentable one degrades to NULL (what EVERY
            # short-circuited row got before this rule) instead of an
            # ANSI runtime throw from branch-type coercion.
            old = (
                F.col(name).try_cast(dtype)
                if name in df.columns
                else F.lit(None).cast(dtype)
            )
            bad = _passed() & s.isNotNull() & casted.isNull()
            # outcome columns FIRST: for an in-place overwrite
            # (name == the source column), writing the value first
            # would make `bad`/the error message read the REWRITTEN
            # column — a poison value then slips through as
            # passed-with-NULL instead of Failed (latent until
            # round 10's preserve-rule test exposed it). With status
            # updated first, the value write's _passed() routes rows
            # failed BY this step to the preserved-old branch too.
            return (
                df.withColumn(
                    ERROR_COL,
                    F.when(
                        bad,
                        F.concat(
                            F.lit(f"CastException: cannot cast to {dtype}: "),
                            s.cast("string"),
                        ),
                    ).otherwise(F.col(ERROR_COL)),
                )
                .withColumn(
                    STATUS_COL, F.when(bad, FAILED).otherwise(F.col(STATUS_COL))
                )
                .withColumn(name, F.when(_passed(), casted).otherwise(old))
            )

        return self._with(step)

    def peek(self, observation: Any, *metrics: Column) -> "Pipeline":
        """Observe-only side channel; the plan is unchanged
        (Stream.peek / Operators.peek, Stream.java:64-71 — side effect,
        value untouched).

        Spark-first mapping: per-record callbacks don't exist executor-
        side, so peek registers named aggregate metrics via
        ``df.observe`` — computed during the action / micro-batch with
        zero extra passes, retrievable through ``Observation.get`` in
        batch or ``StreamingQueryListener`` observedMetrics in
        streaming. Defaults to row count when no metrics are given.
        ``observation`` is a name or a ``pyspark.sql.Observation``.
        """
        ms = metrics or (F.count(F.lit(1)).alias("rows"),)

        def step(df: DataFrame) -> DataFrame:
            return df.observe(observation, *ms)

        return self._with(step)

    # -- field surgery (Operators.java:147-223) ----------------------------

    def rename(self, src: str, dst: str) -> "Pipeline":
        """Move field src->dst; absent src = passthrough (Operators.java:147-153)."""

        def step(df: DataFrame) -> DataFrame:
            if src not in df.columns:
                return df
            return df.withColumnRenamed(src, dst)

        return self._with(step)

    def remove_fields(self, *names: str) -> "Pipeline":
        def step(df: DataFrame) -> DataFrame:
            return df.drop(*[n for n in names if n in df.columns])

        return self._with(step)

    def add_field(self, name: str, value: Any) -> "Pipeline":
        """Set field to a literal, overwrite allowed (Operators.java:217-223)."""
        return self.pipe(name, F.lit(value))

    # -- Python escape hatch ------------------------------------------------

    def pipe_pandas(
        self, name: str, fn: Callable, input_cols: list[str], return_type: str
    ) -> "Pipeline":
        """Vectorized Python transform with per-row failure capture.

        ``fn(pandas.Series, ...) -> pandas.Series`` runs inside a pandas
        UDF; a raising row yields Failed for that row only. This is the
        slow path — prefer ``pipe`` with built-in expressions.
        """
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        def guarded(*cols):
            try:
                # fast path: whole batch at once
                vals = fn(*cols)
                return pd.DataFrame(
                    {"value": list(vals), "error": [None] * len(vals)}
                )
            except Exception:
                # slow path: per-row so one poison record fails alone
                values, errors = [], []
                for row in zip(*cols):
                    try:
                        values.append(fn(*[pd.Series([v]) for v in row]).iloc[0])
                        errors.append(None)
                    except Exception as exc:  # noqa: BLE001 — error becomes data
                        values.append(None)
                        errors.append(f"{type(exc).__name__}: {exc}")
                return pd.DataFrame({"value": values, "error": errors})

        # functional form (no type hints): varargs signatures can't be
        # hint-inferred by pandas_udf
        guarded = pandas_udf(guarded, f"struct<value: {return_type}, error: string>")

        def step(df: DataFrame) -> DataFrame:
            res = guarded(*[F.col(c) for c in input_cols])
            old = F.col(name) if name in df.columns else F.lit(None).cast(return_type)
            df = df.withColumn("_udf_res", F.when(_passed(), res))
            df = (
                df.withColumn(
                    name,
                    F.when(
                        _passed() & F.col("_udf_res.error").isNull(),
                        F.col("_udf_res.value"),
                    ).otherwise(old),
                )
                .withColumn(
                    ERROR_COL,
                    F.when(
                        _passed() & F.col("_udf_res.error").isNotNull(),
                        F.col("_udf_res.error"),
                    ).otherwise(F.col(ERROR_COL)),
                )
                .withColumn(
                    STATUS_COL,
                    F.when(
                        _passed() & F.col("_udf_res.error").isNotNull(), FAILED
                    ).otherwise(F.col(STATUS_COL)),
                )
            )
            return df.drop("_udf_res")

        return self._with(step)

    # -- composition ---------------------------------------------------------

    def compose(self, other: "Pipeline") -> "Pipeline":
        """Chain another pipeline's steps (Operators.compose,
        Operators.java:171-181) — short-circuiting is inherent because every
        step guards on status."""
        return replace(self, steps=self.steps + other.steps)

    # -- compile -------------------------------------------------------------

    def apply(self, df: DataFrame) -> DataFrame:
        """Compile onto a DataFrame: attach outcome columns, fold steps."""
        out = ensure_outcome(df)
        for step in self.steps:
            out = step(out)
        return out

    # -- terminals (batch; streaming terminals in kpipe_spark.streaming) -----

    def split(self, df: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
        """(passed, filtered, failed) views of one applied frame."""
        applied = self.apply(df)
        return (
            applied.filter(F.col(STATUS_COL) == PASSED),
            applied.filter(F.col(STATUS_COL) == FILTERED),
            applied.filter(F.col(STATUS_COL) == FAILED),
        )
