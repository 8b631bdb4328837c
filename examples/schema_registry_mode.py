#!/usr/bin/env python
"""Registry-mode Avro consumer — the analogue of the reference's
``examples/schema-registry`` app: the schema id is read from EACH
record's Confluent envelope and the writer schema is resolved per id
(cached per executor worker — SR ids are immutable), so schema
evolution decodes correctly. Contrast with ``examples/avro_static.py``,
where the same v2 record silently loses its new field.

The resolver here is an offline dict (``make_dict_resolver``) standing
in for a Confluent Schema Registry client
(ConfluentSchemaResolver.java); the decode path
(``decode_avro_sr``) is identical either way — resolver_factory is the
only pluggable seam.

Run: python examples/schema_registry_mode.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.pipeline.schema_registry import (  # noqa: E402
    decode_avro_sr,
    make_dict_resolver,
)
from kpipe_spark.session import get_spark  # noqa: E402

V1 = json.dumps(
    {
        "type": "record",
        "name": "Customer",
        "fields": [
            {"name": "name", "type": "string"},
            {"name": "city", "type": "string"},
        ],
    }
)
V2 = json.dumps(
    {
        "type": "record",
        "name": "Customer",
        "fields": [
            {"name": "name", "type": "string"},
            {"name": "city", "type": "string"},
            {"name": "tier", "type": "string", "default": "standard"},
        ],
    }
)


def envelope(schema_id: int, body: dict) -> bytes:
    return b"\x00" + schema_id.to_bytes(4, "big") + json.dumps(body).encode()


def resolver_factory():
    """Called once per executor Python worker (the SR-client seam)."""
    return make_dict_resolver({1: V1, 2: V2})


def main() -> None:
    spark = get_spark(app_name="example-schema-registry")
    spark.sparkContext.setLogLevel("ERROR")

    records = [
        envelope(1, {"name": "ada", "city": "london"}),
        envelope(2, {"name": "edsger", "city": "austin", "tier": "gold"}),
        b"\x01garbage-without-magic-byte",
    ]
    df = spark.createDataFrame([(r,) for r in records], "value binary")

    out = decode_avro_sr(df, resolver_factory).select(
        "payload", "payload_schema_id", "payload_error"
    )
    rows = out.collect()
    print("registry-mode decode (per-record writer schema):")
    for r in rows:
        print("  id=%s err=%s payload=%s" % (r[1], r[2], r[0]))

    good = [json.loads(r["payload"]) for r in rows if r["payload_error"] is None]
    # v2's new field SURVIVES — the whole point vs static mode
    assert any(rec.get("tier") == "gold" for rec in good)
    # malformed envelope became data, not an exception (error column)
    assert sum(1 for r in rows if r["payload_error"] is not None) == 1
    print("v2 field preserved + bad envelope contained =", True)


if __name__ == "__main__":
    main()
