"""Small plan-shaping utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the session's
    parallelism.

    CPU-heavy derivations (shingle hashing, feature extraction, cosine
    scoring) inherit the scan's partitioning; a small dimension-sized
    parquet arrives as ONE split (< maxPartitionBytes) and would run the
    whole derivation on one core. At 100 TB inputs already exceed core
    count and this is a no-op — the guard only pays the (tiny) shuffle
    when the input is under-split.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
