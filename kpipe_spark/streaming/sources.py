"""Streaming sources (SURVEY §2.1).

The production source is Kafka — one reader regardless of how many
topics/formats are routed (kpipe's MultiBuilder: one consumer, one
group, MultiBuilder.java:209-346). Tests use file/rate sources with the
same Kafka-shaped schema (FIXTURES.md F1), which is exactly Spark's
Kafka source schema, so every pipeline is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int, "
    "headers array<struct<key: string, value: binary>>"
)


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topics: str | list[str] | None = None,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    extra_options: dict[str, str] | None = None,
    subscribe_pattern: str | None = None,
) -> DataFrame:
    """Kafka stream with kpipe's admission knobs mapped to Spark:

    - backpressure high-watermark (BackpressureController.java:34-36)
      -> maxOffsetsPerTrigger (bounds rows per micro-batch)
    - fetch parallelism (docs/GUARANTEES.md:90-99) -> minPartitions
      (splits Kafka partitions into more Spark tasks)
    - regex subscription (KPipeConsumer's Pattern subscribe) ->
      subscribePattern: topics matching later are picked up at the
      next micro-batch — the assignment-set growth the reference's
      rebalance tier exercises (pass INSTEAD of ``topics``)
    """
    if (topics is None) == (subscribe_pattern is None):
        raise ValueError("pass exactly one of topics / subscribe_pattern")
    if isinstance(topics, list):
        topics = ",".join(topics)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("startingOffsets", starting_offsets)
        .option("includeHeaders", "true")
    )
    if subscribe_pattern is not None:
        reader = reader.option("subscribePattern", subscribe_pattern)
    else:
        reader = reader.option("subscribe", topics)
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    for k, v in (extra_options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def file_source(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "json",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-drop stream (the broker-free test source; kpipe's analogue
    is the MockConsumer-backed TestStream, TestStream.java:65-120)."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(path)
    )


def as_kafka_shaped(
    df: DataFrame,
    value_from: str,
    key_from: str | None = None,
    topic: str = "test-topic",
) -> DataFrame:
    """Re-shape any frame into the Kafka envelope so pipelines written
    for the Kafka schema run on test sources unchanged."""
    key = F.col(key_from).cast("string").cast("binary") if key_from else F.lit(None).cast("binary")
    return df.select(
        key.alias("key"),
        F.col(value_from).cast("string").cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.spark_partition_id().alias("partition"),
        (F.monotonically_increasing_id() % F.lit(1 << 40)).alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
        F.array().cast("array<struct<key: string, value: binary>>").alias("headers"),
    )
