"""File-based ingestion with the kpipe outcome contract.

kpipe's sources are Kafka topics; the equivalent front door of a
training-data pipeline is a lake of line-delimited JSON dumps (crawl
shards, API exports — often .gz). The delivery contract must be the
same as the streaming decode path (docs/GUARANTEES.md: a deserialize
failure is the RECORD failing, never the job): a corrupt line becomes
an outcome-`failed` row carrying the raw line, routed to the DLQ by
the ordinary terminal split, while the rest of the file proceeds.

Why ``text`` + ``from_json`` instead of ``spark.read.json``:

- schema is REQUIRED, never inferred — at 100 TB schema inference is a
  full extra pass over the data before the real one;
- the decode is the exact ``formats.decode_json`` expression the Kafka
  path uses (one columnar from_json, corrupt record captured), so both
  front doors share one contract and one set of tests;
- ``readStream.text`` gives the same code path for incremental
  ingestion (new files appearing in the directory = micro-batches),
  checkpointed by the normal StreamRunner machinery.

Scale: the text scan splits on line boundaries inside
maxPartitionBytes ranges like any Spark file scan (gzip shards are
one-split-per-file — prefer many medium .gz shards over one giant
one); decode is a pure projection; nothing shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kpipe_spark.pipeline.formats import decode_json
from kpipe_spark.pipeline.result import (
    ERROR_COL,
    FAILED,
    STATUS_COL,
    ensure_outcome,
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    streaming: bool = False,
    payload_col: str = "payload",
) -> DataFrame:
    """Line-delimited JSON -> (raw, payload struct, outcome columns).

    Every input line yields exactly one row: parsed lines are
    outcome-`passed` with ``payload`` populated; malformed and blank
    lines are outcome-`failed` with the raw line preserved in ``raw``
    and a DeserializationException message in the error column —
    feed the result to a Pipeline / terminal split as usual.
    """
    reader = spark.readStream if streaming else spark.read
    raw = reader.text(path).withColumnRenamed("value", "raw")
    decoded = decode_json(raw, schema, value_col="raw", out_col=payload_col)
    # from_json flags malformed lines via the corrupt column; a blank
    # line parses to a NULL struct with no corrupt record — both are
    # deserialize failures, not silently-empty payloads. Schema-less
    # map mode has no corrupt column (decode_json docstring): a
    # malformed line is simply a NULL map there.
    err_col = f"{payload_col}_error"
    bad = F.col(payload_col).isNull()
    if err_col in decoded.columns:
        bad = F.col(err_col).isNotNull() | bad
    out = ensure_outcome(decoded)
    return (
        out.withColumn(
            STATUS_COL,
            F.when(bad, F.lit(FAILED)).otherwise(F.col(STATUS_COL)),
        )
        .withColumn(
            ERROR_COL,
            F.when(
                bad,
                F.concat(
                    F.lit("DeserializationException: malformed JSON line: "),
                    F.coalesce(F.col("raw"), F.lit("<null>")),
                ),
            ).otherwise(F.col(ERROR_COL)),
        )
        .drop(f"{payload_col}_error")
    )
