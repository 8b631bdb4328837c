"""Streaming ANN serving (round-11 verdict item #6): a stream of query
vectors searched per micro-batch against the stored cell-partitioned
IVF-PQ index.

The contracts pinned here:

1. per-batch results equal the BATCH path's ``search`` over the same
   queries (the d88 shape per micro-batch — the foreachBatch session
   clone must not change results),
2. every micro-batch's code-table scan carries a STATIC
   PartitionFilters entry restricted to that batch's probe set — the
   serving path never scans cells outside it, no matter how the
   stream's queries drift across cells,
3. the IVFADC+R refine path works per batch with the full-precision
   vectors resolved from a TABLE in the batch's session.
"""

from __future__ import annotations

import os
import re
import uuid

import pytest
from pyspark.sql import functions as F

from kpipe_spark.functions.ann_index import AnnIndex

# Round-14 suite tiering: this module is in the SLOW tier (excluded from
# the driver's default `pytest tests/ -q` run by addopts; run with -m slow).
# See pyproject.toml [tool.pytest.ini_options] for the rationale.
pytestmark = pytest.mark.slow


SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    table = f"ann_serve_{uuid.uuid4().hex[:8]}"
    idx = AnnIndex.build(spark, emb, table)
    yield idx, emb
    idx.drop()


def _run_query_stream(spark, idx, emb, tmp_path, batches, **serve_kw):
    """Drop each batch's query vectors as one parquet file, serve the
    stream with maxFilesPerTrigger=1 (one micro-batch per file), and
    return [(batch_id, rows, executed_plan, probed_cells)] captured by
    the deliver callback."""
    import shutil

    src = tmp_path / "queries"
    src.mkdir()
    for i, pred in enumerate(batches):
        # one flat FILE per micro-batch: the file stream source lists
        # files, not nested directory-writes
        stage = tmp_path / f"stage{i}"
        emb.filter(pred).coalesce(1).write.parquet(str(stage))
        part = next(
            p for p in os.listdir(stage)
            if p.startswith("part-") and p.endswith(".parquet")
        )
        shutil.move(str(stage / part), str(src / f"b{i}.parquet"))
    schema = emb.schema
    captured = []

    def deliver(hits, batch_id):
        rows = hits.collect()
        plan = hits._jdf.queryExecution().executedPlan().toString()
        captured.append((batch_id, rows, plan))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    handle = idx.serve(
        stream,
        str(tmp_path / "ckpt"),
        deliver,
        query_name=f"ann-serve-{uuid.uuid4().hex[:6]}",
        **serve_kw,
    )
    try:
        handle.query.processAllAvailable()
    finally:
        handle.close()
    return captured


def _partition_filter_cells(plan: str, table: str) -> set[int]:
    """The cell ids in the code-table scan's PartitionFilters entry."""
    for ln in plan.splitlines():
        if table in ln and "PartitionFilters" in ln:
            m = re.search(r"PartitionFilters: \[(.*?)\]", ln)
            assert m, ln
            # the filter renders as `cell#NNN IN (4,13)`, as `cell#NNN
            # INSET 0, 1, 4, ...` for longer literal lists, or as
            # `cell#NNN = 4` for one probe — parse the literal list
            # only, never the attribute id
            in_list = re.search(r"IN \(([^)]*)\)", m.group(1))
            if in_list:
                return {int(x) for x in re.findall(r"\d+", in_list.group(1))}
            inset = re.search(r"INSET ([0-9, ]+)", m.group(1))
            if inset:
                return {int(x) for x in re.findall(r"\d+", inset.group(1))}
            eq = re.search(r"= (\d+)", m.group(1))
            assert eq, m.group(1)
            return {int(eq.group(1))}
    raise AssertionError(
        f"no PartitionFilters line for {table} in plan:\n{plan[:4000]}"
    )


def test_streaming_hits_match_batch_search(spark, built, tmp_path):
    idx, emb = built
    preds = ["vec_id % 25 = 0 AND vec_id < 250",
             "vec_id % 25 = 0 AND vec_id >= 250 AND vec_id < 500"]
    captured = _run_query_stream(spark, idx, emb, tmp_path, preds)
    assert len(captured) == 2
    streamed = sorted(
        tuple(r) for _, rows, _ in captured for r in rows
    )
    want = sorted(
        tuple(r)
        for pred in preds
        for r in idx.search(emb.filter(pred), k=10, nprobe=2).collect()
    )
    assert streamed == want
    # batches completed are observable on the handle's metrics
    # (captured already proves delivery; this pins the Handle wiring)


def test_each_batch_scan_prunes_to_its_probe_set(spark, built, tmp_path):
    """Contract 2: the static partition filter is PER BATCH — each
    micro-batch's scan lists exactly the cells its own queries probe,
    a strict subset of the index's cells for a small batch."""
    idx, emb = built
    captured = _run_query_stream(
        spark, idx, emb, tmp_path,
        ["vec_id = 100", "vec_id = 321"],
    )
    assert len(captured) == 2
    n_cells = idx.spark.table(idx._centroids_table).count()
    seen_sets = []
    for batch_id, rows, plan in captured:
        cells = _partition_filter_cells(plan, idx.table)
        # one query, nprobe=2: at most 2 cells in the filter
        assert 1 <= len(cells) <= 2, (batch_id, cells)
        assert len(cells) < n_cells
        # every returned hit sits inside the probed set
        assert {r["cell"] for r in rows} <= cells
        seen_sets.append(cells)
    # the two batches probed independently (filters are per-batch
    # STATIC lists, not a union growing across the stream)
    assert all(len(s) <= 2 for s in seen_sets)


def test_adaptive_probe_budget_varies_with_cell_mass(spark, built, tmp_path):
    """Adaptive serving (round-12 verdict #6): the SAME single-query
    stream probes a different number of cells under different cell-mass
    profiles — uniform mass admits exactly ``budget`` cells, while half
    the corpus sitting in the query's first-ranked cell stops the gate
    at 1 (test_ann_index's exact arithmetic, here asserted on the
    per-batch STATIC PartitionFilters of the serving path)."""
    idx, emb = built
    one = emb.filter("vec_id = 100")
    first_cell = (
        idx.search(one, k=5, nprobe=1).select("cell").distinct().collect()
    )[0]["cell"]
    uniform_t = f"prof_uni_{uuid.uuid4().hex[:8]}"
    skew_t = f"prof_skew_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [(c, 10) for c in range(idx.n_cells)], "cell long, n long"
    ).write.saveAsTable(uniform_t)
    spark.createDataFrame(
        [
            (c, 160 if c == first_cell else 160 // (idx.n_cells - 1))
            for c in range(idx.n_cells)
        ],
        "cell long, n long",
    ).write.saveAsTable(skew_t)
    try:
        probe_sizes = {}
        for name, prof in (("uniform", uniform_t), ("skew", skew_t)):
            sub = tmp_path / name
            sub.mkdir()
            captured = _run_query_stream(
                spark, idx, emb, sub, ["vec_id = 100"],
                probe_budget=2, cell_counts_table=prof,
            )
            ((_, rows, plan),) = captured
            assert rows
            probe_sizes[name] = len(
                _partition_filter_cells(plan, idx.table)
            )
        assert probe_sizes == {"uniform": 2, "skew": 1}, probe_sizes
    finally:
        for t in (uniform_t, skew_t):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_adaptive_default_resolves_stored_profile_per_batch(
    spark, built, tmp_path
):
    """probe_budget with NO cell_counts_table: each micro-batch's
    session clone resolves the artifact's stored ``__cellcounts`` side
    table (maintained at build/append/compact — round-12 verdict #2),
    and the streamed hits equal the adaptive BATCH search that reads
    the same stored profile."""
    idx, emb = built
    assert spark.catalog.tableExists(idx._profile_table)
    pred = "vec_id % 25 = 0 AND vec_id < 250"
    captured = _run_query_stream(
        spark, idx, emb, tmp_path, [pred], probe_budget=2,
    )
    ((_, rows, plan),) = captured
    streamed = sorted(tuple(r) for r in rows)
    want = sorted(
        tuple(r)
        for r in idx.search(emb.filter(pred), k=10, probe_budget=2).collect()
    )
    assert streamed == want
    # the scan still prunes to the batch's (adaptively chosen) cells
    n_cells = idx.spark.table(idx._centroids_table).count()
    assert len(_partition_filter_cells(plan, idx.table)) < n_cells


def test_streaming_refine_resolves_table_in_batch_session(
    spark, built, tmp_path
):
    idx, emb = built
    corpus_table = f"ann_serve_corpus_{uuid.uuid4().hex[:8]}"
    emb.write.saveAsTable(corpus_table, format="parquet")
    try:
        captured = _run_query_stream(
            spark, idx, emb, tmp_path,
            ["vec_id % 25 = 0 AND vec_id < 250"],
            refine_with_table=corpus_table, k=5,
        )
        (batch_id, rows, plan), = captured
        want = sorted(
            tuple(r)
            for r in idx.search(
                emb.filter("vec_id % 25 = 0 AND vec_id < 250"),
                k=5, nprobe=2, refine_with=emb,
            ).collect()
        )
        assert sorted(tuple(r) for r in rows) == want
        assert rows and "exact_dist" in rows[0].asDict()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {corpus_table}")
