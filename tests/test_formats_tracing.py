"""Schema-Registry decode, multimodal plumbing, trace propagation."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kpipe_spark.functions.multimodal import (
    extract_features,
    sample_frames,
    size_class_partitioned,
)
from kpipe_spark.pipeline.schema_registry import decode_avro_sr, make_dict_resolver
from kpipe_spark.streaming.tracing import (
    child_traceparent,
    extract_traceparent,
    inject_traceparent,
)


def _envelope(schema_id: int, body: bytes) -> bytes:
    return b"\x00" + schema_id.to_bytes(4, "big") + body


def test_sr_decode_per_record_schema(spark):
    """Two schema ids interleaved in one frame decode independently;
    bad envelopes become errors, not task failures."""
    rows = [
        (_envelope(1, json.dumps({"id": 1, "name": "a"}).encode()),),
        (_envelope(2, json.dumps({"sku": "x", "qty": 3}).encode()),),
        (_envelope(99, b"{}"),),  # unknown schema id
        (b"\x01garbage",),  # wrong magic byte
    ]
    df = spark.createDataFrame(rows, "value binary")

    def factory():
        return make_dict_resolver({1: '{"type":"record"}', 2: '{"type":"record"}'})

    out = decode_avro_sr(df, factory).collect()
    by_sid = {r["payload_schema_id"]: r for r in out if r["payload_schema_id"]}
    assert json.loads(by_sid[1]["payload"])["name"] == "a"
    assert json.loads(by_sid[2]["payload"])["qty"] == 3
    errors = [r["payload_error"] for r in out if r["payload_error"]]
    assert len(errors) == 2
    assert any("unknown schema id 99" in e for e in errors)
    assert any("magic byte" in e for e in errors)


def test_multimodal_feature_extraction(spark):
    media = spark.createDataFrame(
        [
            (1, "image", bytes(range(256)), None, (16, 16, 1, None, "image/fake")),
            (2, "image", b"", None, (0, 0, 0, None, "image/fake")),  # empty ⇒ error
            (3, "audio", b"\x00" * 64, None, (None, None, None, 44100, "audio/fake")),
        ],
        "media_id bigint, kind string, content binary, media_ref string, "
        "meta struct<width: int, height: int, frames: int, sample_rate: int, mime: string>",
    )
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(out[1]["feature"]) == 8
    assert abs(sum(out[1]["feature"]) - 1.0) < 1e-3  # normalized histogram
    assert out[2]["feature"] is None and "empty media" in out[2]["decode_error"]
    assert out[3]["feature"][0] == 1.0  # all zero bytes -> bucket 0
    # partitioning helper keeps schema
    assert size_class_partitioned(media).columns == media.columns


def test_video_frame_sampling(spark):
    media = spark.createDataFrame(
        [
            (1, "video", b"x", None, (None, None, 25, None, "video/fake")),
            (2, "image", b"x", None, (None, None, None, None, "image/fake")),
        ],
        "media_id bigint, kind string, content binary, media_ref string, "
        "meta struct<width: int, height: int, frames: int, sample_rate: int, mime: string>",
    )
    frames = sample_frames(media, every_n=10).collect()
    got = sorted((r["media_id"], r["frame_index"]) for r in frames)
    assert got == [(1, 0), (1, 10), (1, 20)]  # video only, every 10th


def test_trace_propagation_roundtrip(spark):
    tp = "00-0af7651916cd43dd8448eb211c80319c-b7ad6b7169203331-01"
    df = spark.createDataFrame(
        [
            (1, [("traceparent", tp.encode()), ("other", b"v")]),
            (2, [("traceparent", b"00-dead-beef-01"), ("traceparent", tp.encode())]),
            (3, [("other", b"v")]),
        ],
        "id int, headers array<struct<key: string, value: binary>>",
    )
    parents = {
        r["id"]: r["tp"]
        for r in df.select("id", extract_traceparent().alias("tp")).collect()
    }
    assert parents[1] == tp
    assert parents[2] == tp  # duplicates: last occurrence wins
    assert parents[3] is None

    out = df.withColumn("tp", extract_traceparent())
    out = out.withColumn("child", child_traceparent(F.col("tp"), F.col("id")))
    child = {r["id"]: r["child"] for r in out.collect()}
    assert child[1].split("-")[1] == tp.split("-")[1]  # trace id preserved
    assert child[1].split("-")[2] != tp.split("-")[2]  # fresh span id
    assert len(child[1].split("-")[2]) == 16

    injected = inject_traceparent(out, F.col("child"))
    hdrs = {
        r["id"]: {h["key"]: bytes(h["value"]) for h in r["headers"]}
        for r in injected.collect()
    }
    assert hdrs[1]["traceparent"].decode() == child[1]
    assert hdrs[1]["other"] == b"v"  # non-trace headers preserved
