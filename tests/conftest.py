"""Shared test fixtures: one SparkSession per session + the DuckDB
oracle comparator mirroring the driver's check (row count + schema-width
+ order-insensitive value comparison under sorted column names)."""

from __future__ import annotations

import math

import duckdb
import pytest

from kpipe_spark.catalog import TABLE_NAMES, table_path
from kpipe_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kpipe-spark-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()


def _normalize(v):
    """Engine-neutral value form: floats rounded-ish via repr of rounded,
    timestamps/dates to ISO strings, bytes to hex."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def compare_with_oracle(spark_df, oracle_con, sql: str) -> None:
    """Assert spark result == duckdb result, order-insensitive, columns
    matched by sorted name (the driver's comparison shape)."""
    sdf = spark_df.toPandas()
    odf = oracle_con.sql(sql).df()

    s_cols = sorted(sdf.columns)
    o_cols = sorted(odf.columns)
    assert s_cols == o_cols, f"column mismatch: spark={s_cols} oracle={o_cols}"

    s_rows = sorted(
        [tuple(_normalize(v) for v in row) for row in sdf[s_cols].itertuples(index=False)],
        key=repr,
    )
    o_rows = sorted(
        [tuple(_normalize(v) for v in row) for row in odf[o_cols].itertuples(index=False)],
        key=repr,
    )
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"value mismatches (first 5): {mismatches[:5]}"
