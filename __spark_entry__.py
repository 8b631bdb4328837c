"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check at sf0.001.
queries()    — every implemented operator from SURVEY.md §2, one callable
               per name, derived from the central registry
               (kpipe_spark.queries.QUERIES).
oracle_sql() — matching DuckDB SQL for the SQL-expressible subset.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue by nation (lineitem⋈orders⋈customer⋈nation)."""
    from kpipe_spark.queries import all_queries

    return all_queries()["q02_revenue_by_nation"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kpipe_spark.queries import all_queries

    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from kpipe_spark.queries import all_queries

    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
