"""Payload formats: bytes at the boundary, typed columns inside.

kpipe decodes Kafka byte[] payloads via pluggable MessageFormat
implementations (JSON/Avro/Protobuf/bytes/custom — kpipe-core
MessageFormat.java, docs/FORMATS.md). Spark equivalents are Catalyst
built-ins, so decode is columnar and codegen'd:

- JSON     -> from_json(value cast string, schema)   (JsonFormat.java:27-32)
- Avro     -> from_avro(value, schema_json)          (AvroFormat.java:52-118)
- Protobuf -> from_protobuf(value, msg, desc_file)   (ProtobufFormat.java:80-95)
- bytes    -> identity (BytesFormat.java)
- custom   -> user decode UDF

Confluent Schema Registry framing: 1 magic byte + 4-byte big-endian
schema id before the payload (ConfluentEnvelope.java:10-40); protobuf
adds a zig-zag varint message-index list (ProtobufFormat.java:181-184).
``skip_bytes`` / envelope parsing are binary slices — no copy in Tungsten.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skip_bytes(col: Column | str, n: int) -> Column:
    """Drop a fixed n-byte wire prefix (Stream.skipBytes,
    Stream.java:269-282). Binary substring — a slice, not a copy."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, F.lit(n + 1), F.length(c) - n)


def confluent_schema_id(value: Column | str) -> Column:
    """Big-endian int32 schema id from a Confluent envelope
    (ConfluentEnvelope.java:28-40): byte 0 = magic 0x00, bytes 1-4 = id."""
    v = F.col(value) if isinstance(value, str) else value
    b = [F.conv(F.hex(F.substring(v, i + 2, 1)), 16, 10).cast("long") for i in range(4)]
    return (
        (b[0] * F.lit(16777216) + b[1] * F.lit(65536) + b[2] * F.lit(256) + b[3])
        .cast("int")
        .alias("schema_id")
    )


def confluent_payload(value: Column | str, extra_skip: int = 0) -> Column:
    """Payload after the 5-byte Confluent header (+ optional protobuf
    message-index bytes, docs/FORMATS.md:87-90)."""
    v = F.col(value) if isinstance(value, str) else value
    return skip_bytes(v, 5 + extra_skip)


def decode_json(df: DataFrame, schema: str, value_col: str = "value",
                out_col: str = "payload") -> DataFrame:
    """JSON format: bytes -> struct via one columnar from_json.

    kpipe treats a deserialize failure as the record Failing
    (docs/GUARANTEES.md:45); Spark's PERMISSIVE from_json instead yields
    a null-field struct, so we capture the corrupt record explicitly:
    the output gains ``{out_col}_error`` (null = decoded fine), which a
    Pipeline routes with ``fail_when(col(f"{out_col}_error").isNotNull())``.

    Schema-less mode (kpipe's Map<String,Object>, JsonFormat.java:27-32)
    is schema='map<string,string>' — no corrupt-record tracking there
    (from_json yields null for malformed maps, same signal).
    """
    text = F.col(value_col).cast("string")
    if schema.strip().lower().startswith("map<"):
        return df.withColumn(out_col, F.from_json(text, schema))
    parsed = F.from_json(
        text,
        f"{schema}, _corrupt string",
        {"columnNameOfCorruptRecord": "_corrupt"},
    )
    return (
        df.withColumn("_parsed", parsed)
        .withColumn(f"{out_col}_error", F.col("_parsed._corrupt"))
        .withColumn(out_col, F.col("_parsed").dropFields("_corrupt"))
        .drop("_parsed")
    )


def encode_json(df: DataFrame, payload_col: str = "payload",
                out_col: str = "value") -> DataFrame:
    return df.withColumn(out_col, F.to_json(F.col(payload_col)).cast("binary"))


def decode_avro(df: DataFrame, schema_json: str, value_col: str = "value",
                out_col: str = "payload", skip: int = 0) -> DataFrame:
    """Static-schema Avro (AvroFormat.java:52-118). Requires the
    spark-avro module on the classpath; import is deferred so environments
    without it can still use every other format."""
    from pyspark.sql.avro.functions import from_avro

    v = skip_bytes(value_col, skip) if skip else F.col(value_col)
    return df.withColumn(out_col, from_avro(v, schema_json))


def decode_protobuf(df: DataFrame, message_name: str, desc_file: str,
                    value_col: str = "value", out_col: str = "payload",
                    skip: int = 0) -> DataFrame:
    """Static-descriptor Protobuf (ProtobufFormat.java:80-95); requires
    spark-protobuf."""
    from pyspark.sql.protobuf.functions import from_protobuf

    v = skip_bytes(value_col, skip) if skip else F.col(value_col)
    return df.withColumn(out_col, from_protobuf(v, message_name, desc_file))


def decode_bytes(df: DataFrame, value_col: str = "value",
                 out_col: str = "payload") -> DataFrame:
    """Identity passthrough (BytesFormat.java)."""
    return df.withColumn(out_col, F.col(value_col))
