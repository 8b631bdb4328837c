"""Randomized cross-engine checks of the two float-determinism
primitives everything else leans on:

- ``util.ieee_round`` vs DuckDB's ``floor(x*10^k + 0.5)/10^k`` — at
  exactly the half-way points where engine-native round() diverges;
- ``mixing.temperature_normalize``'s sequential fold vs DuckDB
  ``list_reduce`` — the 1-ulp-sensitive denominator behind d44/d55.

Both compare at FULL precision (repr), not a tolerance: the whole
oracle strategy rests on these being bit-identical, so a tolerance
here would hide exactly the class of bug the suite exists to catch."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kpipe_spark.functions.mixing import (
    temperature_norm_sql,
    temperature_normalize,
)
from kpipe_spark.util import ieee_round

# Round-14 suite tiering: this module is in the SLOW tier (excluded from
# the driver's default `pytest tests/ -q` run by addopts; run with -m slow).
# See pyproject.toml [tool.pytest.ini_options] for the rationale.
pytestmark = pytest.mark.slow



@given(
    ks=st.lists(
        st.integers(min_value=-(10**7), max_value=10**7),
        min_size=1,
        max_size=50,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ieee_round_matches_duckdb_at_halfway_points(spark, ks):
    """k/10000 values sit EXACTLY on the round4 half-way grid — the
    points where Spark round() (shortest-decimal) and DuckDB round()
    (binary) disagree; the floor form must agree bit-for-bit."""
    # x = k/2e4 makes every other value a .xxxx5 half-way point
    xs = [k / 20000.0 for k in ks]
    sdf = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [
        r["r"] for r in sdf.select(ieee_round(F.col("x"), 4).alias("r"))
        .collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT CAST(floor(? * 10000.0 + 0.5) / 10000.0 AS DOUBLE)",
            [x],
        ).fetchone()[0]
        for x in xs
    ]
    assert [repr(g) for g in got] == [repr(w) for w in want]


@given(
    toks=st.lists(
        st.integers(min_value=1, max_value=10**12),
        min_size=1,
        max_size=30,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_temperature_fold_matches_duckdb_bitwise(spark, toks):
    """sample_prob must agree at FULL double precision for arbitrary
    per-source token counts: sqrt is correctly rounded IEEE, and the
    denominator is the same source-ordered sequential fold on both
    engines — any pairwise/segment-tree evaluation sneaking into
    either side shows up as a 1-ulp repr mismatch here."""
    rows = [(f"src{i:03d}", n) for i, n in enumerate(toks)]
    sdf = spark.createDataFrame(rows, "source string, n long")
    got = {
        r["source"]: repr(r["p"])
        for r in temperature_normalize(sdf, "n")
        .select("source", (F.col("_pt") / F.col("_denom")).alias("p"))
        .collect()
    }
    values = ", ".join(f"('{s}', {n})" for s, n in rows)
    sql = f"""
    WITH s AS (SELECT * FROM (VALUES {values}) AS t(source, n)),
    {temperature_norm_sql('s', 'n')}
    SELECT source, pt / denom AS p FROM p, dn
    """
    con = duckdb.connect()
    want = {s: repr(p) for s, p in con.execute(sql).fetchall()}
    assert got == want


_NFC_ALPHABET = (
    list("abcdeoun ")
    + ["é", "å", "ö", "ñ", "ç"]  # precomposed
    + [
        "́", "̀", "̈", "̊",  # combining marks
        "̧", "̃", "̄", "̆", "̌",
    ]
)


@given(
    chars=st.lists(
        st.sampled_from(_NFC_ALPHABET), min_size=1, max_size=12
    )
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_nfc_matches_duckdb(chars):
    """d79's cross-engine contract: Python unicodedata NFC ==
    DuckDB's utf8proc nfc_normalize, byte for byte, on arbitrary
    precomposed/combining-mark soup (including marks with nothing to
    attach to and multi-mark stacks — the canonical-ordering cases
    where Unicode-version skew between the two libraries would
    surface first)."""
    import unicodedata

    s = "".join(chars)
    con = duckdb.connect()
    db = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
    con.close()
    assert unicodedata.normalize("NFC", s) == db
