"""Exact per-partition prefix sums without a partition-wide window.

The packing family (d39 / d51 / m07) needs, for every document, the
total weight of all preceding documents in the same source — an
EXCLUSIVE running sum over (source) ordered by doc_id. The direct
window (`Window.partitionBy("source").orderBy("doc_id")`) is correct
but serializes each source into ONE task: a real corpus is dominated
by a single web-crawl source, so at 100 TB that one task walks tens of
terabytes while 999 executors idle.

``ranged_prefix_sum`` computes the identical value with the same
two-phase decomposition d57's budget selection uses:

1. quantize the (integer) order column into contiguous ranges
   ``rng = floor(order / range_width)`` — monotone in the order
   column, so the global per-partition order is exactly
   (rng asc, order asc);
2. aggregate a per-(partition, rng) weight total — ordinary map-side
   partial aggregation; the result is |partitions|·|ranges| rows,
   corpus_size / range_width, NOT corpus-sized;
3. exclusive-prefix-sum that range ledger with a window over the
   LEDGER (per-partition task count = ranges, each row a scalar);
4. join the per-range offsets back and run the within-range exclusive
   window partitioned by (partition, rng) — parallelism is now
   |partitions| × |ranges| and each task holds ≤ range_width rows.

Equivalence: prefix(row) = (sum of full ranges before row's range) +
(prefix within row's range), both ordered by the order column; NULL
weights are skipped by every SUM involved exactly as the one-window
formulation skips them, so the decomposition is value-identical.
tests/test_scale_utils.py checks it against the single-window plan on
randomized data including NULL weights.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranged_prefix_sum(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    weight: Column,
    out: str = "_before",
    range_width: int = 4096,
) -> DataFrame:
    """Append ``out`` = exclusive prefix sum of ``weight`` over
    ``part_cols`` partitions ordered by the integer column
    ``order_col``, computed range-parallel (see module docstring).

    NULL weights contribute nothing to any prefix (SUM-skip semantics,
    identical to the single-window formulation); the row itself still
    receives its (non-NULL) prefix value.
    """
    parts = list(part_cols)
    q = df.withColumn("_w", weight).withColumn(
        "_rng", F.floor(F.col(order_col) / F.lit(range_width)).cast("long")
    )
    ledger = q.groupBy(*parts, "_rng").agg(F.sum("_w").alias("_rng_w"))
    w_led = (
        Window.partitionBy(*parts)
        .orderBy("_rng")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # single-task-per-partition, but over the RANGE LEDGER (scalar rows,
    # corpus_size / range_width of them), never the data
    ledger = ledger.withColumn(
        "_offset", F.coalesce(F.sum("_rng_w").over(w_led), F.lit(0).cast("long"))
    ).drop("_rng_w")
    w_in = (
        Window.partitionBy(*parts, "_rng")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # no broadcast hint: the ledger is tiny at bench scale (AQE will
    # broadcast it) but grows with corpus_size/range_width — at 100 TB
    # it is a normal equi-join whose (parts, _rng) keys match the
    # within-range window partitioning, so the exchange is reused.
    return (
        q.join(ledger, [*parts, "_rng"])
        .withColumn(
            out,
            F.col("_offset")
            + F.coalesce(F.sum("_w").over(w_in), F.lit(0).cast("long")),
        )
        .drop("_rng", "_offset", "_w")
    )
