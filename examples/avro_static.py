#!/usr/bin/env python
"""Static-schema Avro consumer — the analogue of the reference's
``examples/avro`` app (examples/avro/.../App.java): fetch ONE schema at
startup, strip the 5-byte Confluent envelope (``skipBytes(5)``), decode
every record against the frozen schema.

## The static-fetch footgun (kept on purpose, like the reference)

The schema id inside each record's envelope is THROWN AWAY by the
5-byte strip. That is fine only while producers never roll the schema:
the moment a producer writes with an evolved v2, those bytes silently
mis-decode against the frozen v1 reader — and deserialization still
"succeeds". This example demonstrates exactly that hazard: the v2
records below decode without error but drop the new field. For
per-record correctness use registry mode instead
(``examples/schema_registry.py``).

Offline note: the spark-avro jar is not in this container, so the
envelope carries JSON bodies and the static decode is ``from_json``
with the frozen schema — the SAME skip-bytes + frozen-reader shape;
swap ``decode_json`` for ``formats.decode_avro`` when spark-avro is on
the classpath.

Run: python examples/avro_static.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.pipeline.formats import skip_bytes  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402

# the "registry" this app statically fetches from at startup
V1_SCHEMA = "name string, city string"


def envelope(schema_id: int, body: dict) -> bytes:
    """Confluent wire format: magic 0 + 4-byte BE schema id + body."""
    return b"\x00" + schema_id.to_bytes(4, "big") + json.dumps(body).encode()


def main() -> None:
    spark = get_spark(app_name="example-avro-static")
    spark.sparkContext.setLogLevel("ERROR")

    records = [
        envelope(1, {"name": "ada", "city": "london"}),
        envelope(1, {"name": "grace", "city": "arlington"}),
        # a producer rolled to v2 (added a field) — static mode can't tell
        envelope(2, {"name": "edsger", "city": "austin", "tier": "gold"}),
    ]
    df = spark.createDataFrame([(r,) for r in records], "value binary")

    # static path: skipBytes(5) throws the per-record schema id away,
    # then decodes with the schema fetched once at startup
    decoded = df.select(
        F.from_json(skip_bytes("value", 5).cast("string"), V1_SCHEMA).alias("rec")
    ).select("rec.*")

    rows = decoded.collect()
    print("decoded with frozen v1 schema:")
    for r in rows:
        print("  ", r.asDict())
    # the v2 record decoded "successfully" — the tier field vanished
    assert all("tier" not in r.asDict() for r in rows)
    print("static-mode hazard: v2 field silently dropped =", True)


if __name__ == "__main__":
    main()
