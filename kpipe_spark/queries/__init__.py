"""Central query registry.

Every operator the engine claims in SURVEY.md §2 registers here as a
``Query``: a Spark builder (spark, sf_dir) -> DataFrame plus, when the
semantics are SQL-expressible, the equivalent DuckDB oracle SQL. The
driver contract (``__spark_entry__``) and the pytest oracle suite both
iterate this registry, so there is exactly one source of truth.

Column-name discipline: every computed column is aliased identically in
the Spark builder and the oracle SQL (the driver hashes values under
sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name, fn, oracle, description, tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # import side effect populates QUERIES
    from kpipe_spark.queries import (  # noqa: F401
        llm_ops,
        llm_ops2,
        llm_ops3,
        llm_ops4,
        llm_ops5,
        llm_ops6,
        llm_ops7,
        pipeline_queries,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        relational7,
    )

    return QUERIES
