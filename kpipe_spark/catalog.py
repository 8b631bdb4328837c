"""Table catalog over the driver-generated parquet layout.

``load_tables`` returns plain DataFrames — the engine never materializes
driver-side. Reads are straight ``spark.read.parquet`` so Catalyst keeps
predicate pushdown, column pruning, and partition pruning on the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). Spark 4.1+ (the
        # deployed runtime — probed: the legacy conf is a no-op there)
        # reads it natively as TIMESTAMP_NTZ truncated to micros (the
        # same truncation DuckDB applies to TIMESTAMP_NS), so the
        # native read is attempted FIRST and the caller session's conf
        # is never touched on it (round-10 ADVICE: the old
        # unconditional session-wide nanosAsLong turned every later
        # unrelated nanos read in the session into raw LongType).
        # Older Spark rejects NANOS at schema conversion unless read
        # as raw int64 — only that fallback sets the legacy conf, and
        # it must be session-wide there: the returned frame is lazy
        # and the conf is consulted at scan time, so a scoped/restored
        # conf would break the frame (known old-Spark-only trade).
        try:
            df = spark.read.parquet(table_path(sf_dir, name))
        except Exception as e:
            # engage the fallback ONLY for the nanos schema-conversion
            # refusal — a bare except here would set the session-wide
            # legacy conf on ANY failure (missing path, permissions),
            # re-introducing the pollution this branch exists to avoid
            msg = str(e)
            if "NANOS" not in msg and "PARQUET_TYPE_ILLEGAL" not in msg:
                raise
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(table_path(sf_dir, name))
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        if isinstance(df.schema["ts"].dataType, LongType):
            # FLOOR division to micros: `ts div 1000` truncates toward
            # zero, which diverges from DuckDB's (and native NTZ's)
            # floor for pre-epoch nanos; subtracting pmod first makes
            # the dividend an exact multiple, so div == floor for any
            # sign with no double-precision loss
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000")),
            )
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


class LazyTables:
    """Tables as attributes, constructed on first touch.

    Building a DataFrame costs a driver round-trip (file listing +
    footer schema read); eagerly constructing all 10 per query call
    added ~1s of driver overhead to every single-table query. Resolved
    frames are memoized per (session, sf_dir), so repeated queries in
    one session share the analyzed scan relation.
    """

    _cache: dict[tuple[str, str, str], DataFrame] = {}

    def __init__(self, spark: SparkSession, sf_dir: str) -> None:
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise AttributeError(name)
        key = (self._spark.sparkContext.applicationId, self._sf_dir, name)
        df = LazyTables._cache.get(key)
        if df is None:
            # a new applicationId means prior sessions' entries can
            # never hit again — evict them, or a session-restarting
            # process (notebook, test harness) leaks DataFrames bound
            # to dead sessions for the life of the interpreter
            stale = [k for k in LazyTables._cache if k[0] != key[0]]
            for k in stale:
                del LazyTables._cache[k]
            df = load_table(self._spark, self._sf_dir, name)
            LazyTables._cache[key] = df
        return df


def load_tables(spark: SparkSession, sf_dir: str) -> LazyTables:
    """All tables as attributes: ``t = load_tables(...); t.lineitem``."""
    return LazyTables(spark, sf_dir)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
