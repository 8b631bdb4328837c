"""Dataset profiling / governance operators.

Column profiling (null counts, cardinalities) and k-anonymity auditing
— the data-quality gates a training-data pipeline runs before a corpus
ships. Everything is one aggregation pass; nothing collects more than
the profile itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile -> (column, n_rows, n_nulls, n_distinct).

    ONE scan of the table, then a 1-row unpivot to long form. Honest
    scale caveat on the DISTINCT counts: N exact count_distinct
    aggregates in one agg make Catalyst plan an Expand — each input
    row is replicated ~(N+1)x into the shuffle because exact distinct
    aggregates cannot fully map-side combine. Fine for profiling a
    dimension or a sample; for a wide 100 TB fact table pass
    ``exact_distinct=False`` to use approx_count_distinct (HLL
    sketches, no Expand, genuinely map-side partial) — cardinality
    profiling rarely needs exactness.
    """
    cols = columns or df.columns
    distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.isnull(c).cast("long")).alias(f"_nulls_{c}"))
        aggs.append(distinct(c).alias(f"_dist_{c}"))
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
