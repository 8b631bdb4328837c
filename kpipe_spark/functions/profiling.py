"""Dataset profiling / governance operators.

Column profiling (null counts, cardinalities) and k-anonymity auditing
— the data-quality gates a training-data pipeline runs before a corpus
ships. Everything is one aggregation pass; nothing collects more than
the profile itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile -> (column, n_rows, n_nulls, n_distinct).

    ONE pass over the table: all per-column aggregates run in a single
    groupBy-less aggregation (partial-aggregated map-side), then the
    1-row result unpivots to long form via an inline array — the
    unpivot touches one row, so the profile costs exactly one scan
    regardless of column count.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.isnull(c).cast("long")).alias(f"_nulls_{c}"))
        aggs.append(F.count_distinct(c).alias(f"_dist_{c}"))
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_dist_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(entries).alias("p")).select(
        "p.column", "p.n_rows", "p.n_nulls", "p.n_distinct"
    )


def k_anonymity(
    df: DataFrame, quasi_identifiers: list[str], k: int = 10
) -> DataFrame:
    """Equivalence-class audit over quasi-identifier columns ->
    (qi columns..., class_size, at_risk).

    A row is k-anonymous iff its quasi-identifier combination is shared
    by >= k rows; classes below k are re-identification risks that a
    release gate must generalize or suppress. One map-side-combined
    shuffle on the QI tuple.
    """
    return df.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).alias("class_size")
    ).withColumn("at_risk", F.col("class_size") < k)
