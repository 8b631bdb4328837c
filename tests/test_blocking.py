"""blocking_enrich: correctness (values + order), genuine overlap of
blocking waits, and error propagation."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from kpipe_spark.functions.blocking import blocking_enrich

# Round-14 suite tiering: this module is in the SLOW tier (excluded from
# the driver's default `pytest tests/ -q` run by addopts; run with -m slow).
# See pyproject.toml [tool.pytest.ini_options] for the rationale.
pytestmark = pytest.mark.slow



def test_blocking_enrich_values_and_order(spark):
    """fn sees each row as a dict; the result column lines up with its
    row (ordering inside every partition is the input order — the
    KEY_ORDERED guarantee the docstring makes)."""
    df = spark.range(200).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    out = blocking_enrich(
        df, lambda r: r["id"] * 1000 + r["v"], "tag", "bigint"
    )
    rows = out.collect()
    assert len(rows) == 200
    assert all(r["tag"] == r["id"] * 1000 + r["v"] for r in rows)
    # within-partition order preserved (compare against the un-enriched
    # per-partition sequence)
    base = [
        [r["id"] for r in part]
        for part in df.rdd.glom().collect()
    ]
    enriched = [
        [r["id"] for r in part]
        for part in out.rdd.glom().collect()
    ]
    assert sorted(map(tuple, enriched)) == sorted(map(tuple, base))


def test_blocking_enrich_overlaps_waits(spark):
    """The point of the operator: 128 rows x 50 ms of blocking wait on
    ONE partition is 6.4 s serial; with a 64-thread pool it must
    complete in a small multiple of two wait-rounds. (time.sleep
    releases the GIL — the same class as network I/O.)"""
    df = spark.range(128).coalesce(1)
    out = blocking_enrich(
        df,
        lambda r: time.sleep(0.05) or int(r["id"]),
        "io",
        "bigint",
        concurrency=64,
    )
    t0 = time.perf_counter()
    n = out.count()
    elapsed = time.perf_counter() - t0
    assert n == 128
    # 2 rounds x 50 ms = 0.1 s ideal; generous 3 s bound still rules
    # out anything close to the 6.4 s serial floor
    assert elapsed < 3.0, f"no overlap: {elapsed:.2f}s for 6.4s of waits"


def test_blocking_enrich_propagates_errors(spark):
    df = spark.range(4)

    def boom(r):
        raise RuntimeError("external service said no")

    with pytest.raises(Exception, match="external service said no"):
        blocking_enrich(df, boom, "x").collect()


def test_blocking_enrich_rejects_bad_concurrency(spark):
    with pytest.raises(ValueError, match="concurrency"):
        blocking_enrich(spark.range(1), lambda r: 1, "x", concurrency=0)


def test_blocking_enrich_rejects_result_col_collision(spark):
    """Overwriting an existing column would yield a duplicate-name
    schema downstream; refuse up front (round-9 advice)."""
    df = spark.range(3).select(F.col("id"), F.lit("x").alias("tag"))
    with pytest.raises(ValueError, match="already exists"):
        blocking_enrich(df, lambda r: 1, "tag")


def test_blocking_enrich_quotes_exotic_column_names(spark):
    """Input columns (and the result column) with spaces, dots, or
    hyphens must survive the DDL round-trip — they break an unquoted
    schema string (round-9 advice)."""
    df = spark.range(5).select(
        F.col("id").alias("doc id"),
        (F.col("id") * 2).alias("a.b-c"),
    )
    out = blocking_enrich(
        df, lambda r: r["doc id"] + r["a.b-c"], "out col", "bigint"
    )
    rows = out.collect()
    assert out.columns == ["doc id", "a.b-c", "out col"]
    assert all(r["out col"] == r["doc id"] + r["a.b-c"] for r in rows)


def test_blocking_enrich_inside_foreach_batch(spark, tmp_path):
    """The operator composes with the streaming runner's sink path —
    the frame a sink receives belongs to a CLONED session (the r9
    CmsSketch bug class), and blocking_enrich must work on it: 2
    micro-batches through StreamRunner, the sink enriches with a
    blocking wait and the waits overlap (wall time far below the
    serial floor)."""
    import os

    from kpipe_spark.pipeline import Pipeline
    from kpipe_spark.streaming import StreamRunner

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.range(300).selectExpr("id AS doc_id").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.range(300, 600).selectExpr("id AS doc_id").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    seen: list[int] = []
    spans: list[float] = []

    def sink(df, batch_id):
        t0 = time.perf_counter()
        out = blocking_enrich(
            df,
            lambda r: time.sleep(0.02) or int(r["doc_id"]) * 2,
            "scored",
            "bigint",
            concurrency=64,
        )
        rows = out.collect()
        spans.append(time.perf_counter() - t0)
        assert all(r["scored"] == r["doc_id"] * 2 for r in rows)
        seen.append(len(rows))

    runner = StreamRunner(
        pipeline=Pipeline().require_field("doc_id"), sink=sink
    )
    stream = (
        spark.readStream.schema("doc_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    handle = runner.start(stream, str(tmp_path / "ckpt"), "blocking-sink")
    try:
        handle.process_all_available()
    finally:
        handle.close()
    assert sorted(seen) == [300, 300]
    # serial floor per batch = 300 x 20 ms = 6 s; overlapped batches
    # must come in far below it (generous bound for busy CI hosts)
    assert max(spans) < 4.0, f"no overlap in-stream: {spans}"


def test_blocking_enrich_empty_partitions(spark):
    """Empty Arrow batches still carry the result column (schema must
    hold even when no row flows)."""
    df = spark.range(2).repartition(8)  # most partitions empty
    out = blocking_enrich(df, lambda r: "ok", "tag")
    assert out.count() == 2
    assert out.schema["tag"].dataType.simpleString() == "string"
