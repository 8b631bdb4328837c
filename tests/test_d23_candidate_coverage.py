"""d23's oracle-equality precondition, asserted directly (round-11
ADVICE): the oracle is the EXACT all-pairs distinct-3-gram Jaccard set,
while the builder only reports pairs the seed-fixed 8-table MinHashLSH
net discovers at the loosened 0.45 hashed-distance threshold — equality
is probabilistic (miss ~ (1-s)^8 <= 7e-5 per boundary pair) and holds
on the FIXED fixtures, not universally. This test pins the property the
hash grade rests on: candidate coverage of the exact pair set on each
shipped fixture.

Re-grade step when fixtures regenerate: run this test at every SF the
driver grades (sf0.001 here every run; sf0.01 in the slow marker). A
red run means the net missed a boundary pair on the NEW fixture — the
engine is behaving as designed, and the fix is a looser net (raise the
0.45 threshold) or more hash tables, not a code hunt."""

from __future__ import annotations

import os

import duckdb
import pytest

from kpipe_spark.catalog import TABLE_NAMES, table_path
from kpipe_spark.queries import all_queries
from kpipe_spark.queries.llm_ops2 import d23_candidate_pairs

SF_GRADED = "/root/testdata/sf0.01"


def _exact_pairs(sf_dir: str) -> set[tuple[int, int]]:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, name)}')"
        )
    sql = all_queries()["d23_mllib_minhash_join"].oracle
    rows = con.sql(sql).fetchall()
    con.close()
    return {(r[0], r[1]) for r in rows}


def _assert_coverage(spark, sf_dir: str) -> None:
    exact = _exact_pairs(sf_dir)
    assert exact, "fixture produced no exact pairs — vacuous coverage"
    cand = {
        (r.id_a, r.id_b)
        for r in d23_candidate_pairs(spark, sf_dir)
        .select("id_a", "id_b")
        .collect()
    }
    missed = exact - cand
    assert not missed, (
        f"LSH net missed {len(missed)} exact pair(s) on {sf_dir}: "
        f"{sorted(missed)[:10]} — the d23 hash grade WILL fail; loosen "
        "the 0.45 net or add hash tables (see module docstring)"
    )


def test_candidates_cover_exact_pairs_sf0001(spark):
    _assert_coverage(spark, "/root/testdata/sf0.001")


@pytest.mark.skipif(
    not os.path.isdir(SF_GRADED), reason="graded fixture not present"
)
def test_candidates_cover_exact_pairs_graded_sf(spark):
    """The driver grades at sf0.01 — coverage there is the grade."""
    _assert_coverage(spark, SF_GRADED)


def _drill_fixture(spark, tmp_path) -> str:
    """A deliberately 'regenerated' documents fixture with BOUNDARY
    pairs: each pair shares 24 of 32 distinct 3-grams (exact Jaccard
    sim 0.75, distance 0.25 — inside the <= 0.3 report) — close enough
    to the threshold that a tightened LSH net loses them. Other tables
    symlink to sf0.001 (the oracle view setup needs them present)."""
    sf = tmp_path / "sf_drill"
    sf.mkdir()
    for name in TABLE_NAMES:
        if name != "documents":
            os.symlink(
                table_path("/root/testdata/sf0.001", name),
                table_path(str(sf), name),
            )
    rows = []
    doc_id = 0
    for p in range(5):  # five boundary pairs, disjoint vocabularies
        words = [f"w{p}x{i}" for i in range(30)]
        a = " ".join(words)
        # change the last 4 words: grams starting at 25..28 differ
        b = " ".join(words[:26] + [f"z{p}x{i}" for i in range(4)])
        rows += [(doc_id, a), (doc_id + 1, b)]
        doc_id += 2
    for f in range(10):  # unrelated filler
        rows.append((doc_id, " ".join(f"f{f}y{i}" for i in range(20))))
        doc_id += 1
    # a flat FILE like the real fixtures (DuckDB's read_parquet gets
    # the exact path, not a directory): stage, then move the part file
    import shutil

    stage = tmp_path / "stage_docs"
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(str(stage))
    part = next(
        p
        for p in os.listdir(stage)
        if p.startswith("part-") and p.endswith(".parquet")
    )
    shutil.move(str(stage / part), table_path(str(sf), "documents"))
    return str(sf)


@pytest.mark.slow  # r14 tiering: multi-minute — slow tier
def test_regenerated_fixture_drill_red_then_recover(spark, tmp_path):
    """The re-grade workflow from the module docstring, exercised end
    to end on a 'regenerated' fixture (round-12 verdict #7): a
    TIGHTENED net (threshold 0.01 — only pairs whose seed-fixed hash
    estimate reads 0) demonstrably MISSES boundary pairs (the red
    signal this suite exists to give), and the shipped loosened
    0.45/8 net re-establishes full coverage — red -> loosen -> green
    is a real recipe, not an aspiration."""
    sf = _drill_fixture(spark, tmp_path)
    exact = _exact_pairs(sf)
    assert len(exact) == 5, sorted(exact)  # the five boundary pairs

    tight = {
        (r.id_a, r.id_b)
        for r in d23_candidate_pairs(spark, sf, lsh_threshold=0.01)
        .select("id_a", "id_b")
        .collect()
    }
    assert exact - tight, (
        "the tightened net covered every boundary pair — the drill "
        "fixture no longer exercises the red path; move the pairs "
        "closer to the threshold"
    )

    shipped = {
        (r.id_a, r.id_b)
        for r in d23_candidate_pairs(spark, sf)
        .select("id_a", "id_b")
        .collect()
    }
    assert exact - shipped == set(), sorted(exact - shipped)
