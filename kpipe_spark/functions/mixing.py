"""Source-mixing math shared by the sampling-weight ops (d44, d55).

The T=0.5 temperature normalizer is the one piece of float arithmetic
in the mixing family that is NOT trivially cross-engine exact: the
denominator is a sum of sqrt terms, and each engine is free to add
partial aggregates in any order. d44's contract (docstring there) is
an explicit SEQUENTIAL left fold over the key-sorted term list —
Spark `F.aggregate` mirrors DuckDB `list_reduce` addition-for-addition
— because even an ordered window SUM may be evaluated pairwise
(segment tree) and drift 1 ulp. That subtlety must live in exactly one
place; this module is it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def temperature_normalize(
    df: DataFrame, tokens_col: str, key_col: str = "source"
) -> DataFrame:
    """Append ``_t`` (exact integer total), ``_pt`` (sqrt of the token
    share — pow(x, 0.5) is correctly rounded in IEEE-754, so both
    engines agree bit-for-bit) and ``_denom`` (the sequential fold of
    ``_pt`` ordered by ``key_col``) to a per-source aggregate frame.
    ``df`` is |sources|-sized; everything here is driver-free 1-row
    aggregate work that broadcasts back."""
    t = F.sum(tokens_col).over(Window.partitionBy())  # exact (ints)
    p = df.withColumn("_t", t).withColumn(
        "_pt", F.sqrt(F.col(tokens_col) * 1.0 / F.col("_t"))
    )
    # Sequential left fold over (key, pt) sorted by key: the same
    # addition order as the oracle's list_reduce, bit-for-bit. The 0.0
    # init is exact (0.0 + x == x for the positive pt values).
    denom = p.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col(key_col), F.col("_pt")))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["_pt"],
        ).alias("_denom")
    )
    return p.crossJoin(F.broadcast(denom))


def temperature_norm_sql(src: str, tokens: str, key: str = "source") -> str:
    """DuckDB CTEs (tot, p, dn) mirroring temperature_normalize over a
    prior CTE ``src`` holding one row per source with integer token
    column ``tokens``. Splice after ``src`` inside a WITH chain.
    ``key`` must name the same column as temperature_normalize's
    ``key_col`` — the fold order (ORDER BY key) is part of the
    bit-exactness contract, so the two parameters must move together."""
    return f"""
    tot AS (SELECT CAST(sum({tokens}) AS BIGINT) AS t FROM {src}),
    p AS (
      SELECT {src}.*, t, sqrt({tokens} * 1.0 / t) AS pt FROM {src}, tot
    ),
    dn AS (
      SELECT list_reduce(list(pt ORDER BY {key}),
                         (acc, v) -> acc + v) AS denom
      FROM p
    )
    """
