"""W3C trace-context propagation (SURVEY §2.5 R10).

kpipe extracts ``traceparent`` from consumed headers, opens a CONSUMER
span per record, and injects context on produce + DLQ
(RecordProcessor.java:207-233, KPipeProducer.java:199-204). Columnar
equivalent: the headers column flows through the pipeline untouched;
these helpers read/inject the traceparent header and derive child
span ids per record — pure expressions, no per-record Python."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def extract_traceparent(headers: Column | str = "headers") -> Column:
    """Last-occurrence traceparent header value as string (duplicate
    headers read last, matching KPipeProducer.java:179-183)."""
    h = F.col(headers) if isinstance(headers, str) else headers
    matches = F.filter(h, lambda s: s["key"] == "traceparent")
    return F.when(
        F.size(matches) > 0,
        F.element_at(matches, -1)["value"].cast("string"),
    )


def child_traceparent(parent: Column, record_id: Column) -> Column:
    """Derive a per-record child traceparent: keep version+trace-id,
    substitute a fresh 8-byte span id (hash-derived, deterministic for
    replays — helpful under at-least-once)."""
    trace_id = F.split(parent, "-")[1]
    flags = F.split(parent, "-")[3]
    span = F.lpad(
        F.lower(F.hex(F.abs(F.xxhash64(record_id)))), 16, "0"
    )
    return F.concat_ws("-", F.lit("00"), trace_id, span, flags)


def inject_traceparent(df: DataFrame, traceparent: Column,
                       headers_col: str = "headers") -> DataFrame:
    """Append/overwrite the traceparent header on the outbound frame
    (inject-on-produce, KPipeProducer.java:199-204)."""
    existing = (
        F.filter(F.col(headers_col), lambda s: s["key"] != "traceparent")
        if headers_col in df.columns
        else F.array().cast("array<struct<key:string,value:binary>>")
    )
    new_header = F.struct(
        F.lit("traceparent").alias("key"), traceparent.cast("binary").alias("value")
    )
    return df.withColumn(
        headers_col,
        F.when(
            traceparent.isNotNull(),
            F.concat(F.coalesce(existing, F.array()), F.array(new_header)),
        ).otherwise(F.coalesce(F.col(headers_col) if headers_col in df.columns else existing, F.array())),
    )
