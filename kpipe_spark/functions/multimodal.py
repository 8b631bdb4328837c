"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape, mapInPandas signatures; the actual codec work is stubbed
behind ``_decode_image_bytes`` (the image/audio libraries are not in
this container) with a deterministic fake so tests pin the contract.

Design for 100 TB:
- media rides as a ``binary`` column next to a metadata struct; large
  blobs can instead carry a storage path (``media_ref``) for lazy
  executor-side fetch — never driver-side,
- decode/featurize are ``mapInPandas`` stages: one Python worker per
  partition, Arrow-batched, bounded memory via maxRecordsPerBatch,
- partition by size class before decode so a few giant videos don't
  straggle a wave of small thumbnails.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, media_ref string, "
    "meta struct<width: int, height: int, frames: int, sample_rate: int, "
    "mime: string>"
)

FEATURE_SCHEMA = "media_id bigint, kind string, feature array<float>, decode_error string"


def _decode_image_bytes(content: bytes) -> list[float]:
    """STUB: real implementation would decode via PIL/ffmpeg and emit a
    feature vector. Deterministic fake: 8 byte-histogram buckets,
    normalized — stable across runs, so tests can assert exact values."""
    if content is None or len(content) == 0:
        raise ValueError("empty media content")
    buckets = [0] * 8
    for b in content:
        buckets[b >> 5] += 1
    n = float(len(content))
    return [round(c / n, 6) for c in buckets]


def extract_features(media: DataFrame) -> DataFrame:
    """binary media -> fixed-width feature vectors via mapInPandas.

    Per-row decode failures become (feature=null, decode_error=msg) —
    the pipeline outcome discipline, never a task failure.
    """
    import pandas as pd

    def decode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, errs = [], []
            for content in pdf["content"]:
                try:
                    feats.append(_decode_image_bytes(content))
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 — error becomes data
                    feats.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "decode_error": errs,
                }
            )

    return media.mapInPandas(decode_partition, FEATURE_SCHEMA)


def size_class_partitioned(media: DataFrame, num_partitions: int = 32) -> DataFrame:
    """Repartition by (kind, size-class) so homogeneous work shares a
    task wave — giant blobs can't straggle a partition of thumbnails."""
    size_class = F.floor(F.log2(F.length("content") + 1)).alias("_size_class")
    return (
        media.withColumn("_size_class", size_class)
        .repartition(num_partitions, F.col("kind"), F.col("_size_class"))
        .drop("_size_class")
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits (media_id,
    frame_index) pairs for frames 0, n, 2n, ... based on meta.frames.
    The actual frame extraction is the stubbed decode step; the fan-out
    shape (explode, no driver loop) is the part that must be right."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.frames"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_index"),
        )
    )
