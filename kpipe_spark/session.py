"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the config block is written for a real
multi-executor cluster: AQE on (runtime re-planning, skew-join splitting,
partition coalescing), Arrow for every Python<->JVM hop, and shuffle
partitioning sized from the parallelism the session actually has rather
than Spark's static default of 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "kpipe-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    On a cluster, ``master`` comes from spark-submit and only the conf
    entries matter; locally we default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = default_parallelism()
    if master is None:
        master = f"local[{cpus}]"
    # 2x cores keeps all slots busy under AQE coalescing at local scale;
    # on a 1000-executor cluster the operator layer re-partitions by data
    # volume instead (see ARCHITECTURE.md "shuffle sizing").
    nshuffle = shuffle_partitions or min(64, max(8, cpus * 2))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime coalescing, skew-join splitting, runtime join demotion
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE rewrite sort-merge -> shuffled-hash at runtime when
        # every post-shuffle partition is under 128 MiB (default 0 =
        # never). The decision uses ACTUAL partition bytes, not
        # estimates; the bound is on SERIALIZED/COMPRESSED post-shuffle
        # bytes, so the in-memory hash map can be a few times larger —
        # still well under executor memory — the static preferSortMergeJoin
        # toggle stays at its default because it trusts pre-execution
        # estimates, which at 100 TB can be join-inflated and build an
        # unbounded hash map. Measured on the band-join family at
        # sf0.1 (interleaved 3-arm A/B, same session): d15 5.38->4.30,
        # d24 3.81->2.77, d05 1.82->1.65, d54/d07 -5-10%; the skipped
        # per-partition sorts are the win and grow with partition
        # size. AQE-only also keeps pre-execution plans (and the
        # plan-shape suite) unchanged.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", str(128 * 1024 * 1024)),
        )
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        # Arrow everywhere Python touches data (pandas UDFs, toPandas)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # deterministic timestamps regardless of host TZ
        .config("spark.sql.session.timeZone", "UTC")
        # dimension tables (region/nation/supplier and SF-scaled customer
        # buckets) should broadcast; 64 MB is safe with 4 GB+ executors
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # read-side split sizing: default 128 MB is right for 100 TB scans
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        # console progress writes \r[Stage ...] lines to the terminal;
        # harmless interactively but they pollute captured stdout/stderr
        # (BENCH_r06.json was beheaded by them + a long JSON line
        # overflowing the driver's 2000-char tail window)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
        # local[N] puts driver + all N task slots in ONE JVM; Spark's 1g
        # default heap thrashes GC at 32 threads (measured: GCLocker
        # retry failures on wide unions, ±30% timing noise on the heavy
        # queries). On a real cluster executor memory comes from
        # spark-submit and this setting only sizes the driver.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
