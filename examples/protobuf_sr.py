#!/usr/bin/env python
"""Protobuf Schema-Registry consumer — the analogue of the reference's
``examples/protobuf-schema-registry`` app: each record's Confluent
envelope carries the schema id AND a zig-zag varint message-index list
(navigating nested message definitions); the decoder parses both
executor-side in an Arrow-batched UDF and routes on them.

The descriptor-compiling step needs protoc/registry tooling this
container lacks, so the body decode is the documented stub
(``decode_protobuf_sr`` surfaces raw body + routing metadata); the
envelope parsing — the part with reference-specific wire semantics
(ProtobufFormat.java:159-220) — is fully real, including the
``count == 0`` shorthand for index path ``[0]``.

Run: python examples/protobuf_sr.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kpipe_spark.pipeline.schema_registry import decode_protobuf_sr  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402


def zigzag(n: int) -> bytes:
    """Zig-zag varint encode (the Confluent Protobuf index encoding)."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def envelope(schema_id: int, indexes: list[int] | None, body: bytes) -> bytes:
    head = b"\x00" + schema_id.to_bytes(4, "big")
    if indexes is None:
        head += zigzag(0)  # shorthand: first top-level message
    else:
        head += zigzag(len(indexes)) + b"".join(zigzag(i) for i in indexes)
    return head + body


def main() -> None:
    spark = get_spark(app_name="example-protobuf-sr")
    spark.sparkContext.setLogLevel("ERROR")

    records = [
        envelope(7, None, b"\x08\x01"),          # index shorthand [0]
        envelope(7, [1, 2], b"\x08\x02"),        # nested message path
        envelope(300, [0], b"\x08\x03"),         # multi-byte varint id path
        b"\xffnot-an-envelope",
    ]
    df = spark.createDataFrame([(r,) for r in records], "value binary")

    out = decode_protobuf_sr(df).select(
        "payload_schema_id", "payload_message_index", "payload_error"
    )
    rows = out.collect()
    print("protobuf envelope routing:")
    for r in rows:
        print("  schema_id=%s index_path=%s err=%s" % (r[0], r[1], r[2]))

    parsed = [r for r in rows if r["payload_error"] is None]
    assert [list(r["payload_message_index"]) for r in parsed] == [[0], [1, 2], [0]]
    assert [r["payload_schema_id"] for r in parsed] == [7, 7, 300]
    print("envelope routing parsed:", len(parsed), "of", len(rows))


if __name__ == "__main__":
    main()
