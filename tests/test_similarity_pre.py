"""cosine_pre (precomputed-norm cosine) must be BIT-identical to
cosine: na/nb carry exactly norm(a)/norm(b) — the same interpreted
fold — so den = na*nb and dot/den are the same IEEE operations in the
same order. This pins the r13 optimization that moved every pair-join
scoring site from ~5 interpreted folds per pair to one."""

from __future__ import annotations

import random
import struct

import pytest
from pyspark.sql import functions as F

from kpipe_spark.functions import similarity as S


def _bits(x):
    return None if x is None else struct.pack("<d", x)


@pytest.fixture(scope="module")
def vec_pairs(spark):
    rng = random.Random(1234)

    def vec(kind):
        if kind == "zero":
            return [0.0] * 8
        if kind == "negzero":
            return [-0.0] * 8
        if kind == "sparse":  # disjoint supports -> all-zero products
            return [rng.uniform(-1, 1) if i < 4 else 0.0 for i in range(8)]
        return [rng.uniform(-2, 2) for _ in range(8)]

    kinds = ["dense", "zero", "negzero", "sparse"]
    rows = []
    for i in range(64):
        a = vec(kinds[i % 4])
        b = vec(kinds[(i // 4) % 4])
        if i % 7 == 0:
            b = [0.0 if j < 4 else rng.uniform(-1, 1) for j in range(8)]
        rows.append((i, a, b))
    return spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )


def test_cosine_pre_bit_identical(vec_pairs):
    df = vec_pairs.withColumn("na", S.norm(F.col("a"))).withColumn(
        "nb", S.norm(F.col("b"))
    )
    out = df.select(
        "id",
        S.cosine(F.col("a"), F.col("b")).alias("plain"),
        S.cosine_pre(
            F.col("a"), F.col("b"), F.col("na"), F.col("nb")
        ).alias("pre"),
    ).collect()
    assert len(out) == 64
    for r in out:
        assert _bits(r["plain"]) == _bits(r["pre"]), (
            r["id"],
            r["plain"],
            r["pre"],
        )
