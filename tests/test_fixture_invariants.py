"""Fixture invariants the dual-oracle algebra rests on. The d27/d13
oracles derive the embedding width from the data via zipped parallel
unnests (round-11 ADVICE retired the hard-coded dim=64), which is exact
only when every vector in a fixture has the SAME width — a mixed-width
fixture would zip positionally and mis-sum silently on the Spark side
too (F.transform over index ranges). Pure-DuckDB checks, no Spark."""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embedding_width_uniform(sf_dir):
    con = duckdb.connect()
    widths = con.sql(
        "SELECT DISTINCT len(embedding) FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    con.close()
    assert len(widths) == 1, f"{sf_dir}: mixed embedding widths {widths}"
    assert widths[0][0] > 0
