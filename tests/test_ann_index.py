"""AnnIndex: the stored IVF-PQ artifact API.

Parity pin: ``search`` over d88's eval panel returns EXACTLY the rows
of the oracle-checked d88 registry query (the API is the artifact form
of that query shape). Plus the storage properties that make it the
100 TB layout: the code-table scan carries a PartitionFilters entry
(only probed cells' files are read), the family round-trips through
TBLPROPERTIES with mismatch validation, and append encodes against
the STORED codebooks (not re-trained ones).
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from kpipe_spark.functions.ann_index import AnnIndex

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    table = f"ann_test_{uuid.uuid4().hex[:8]}"
    idx = AnnIndex.build(spark, emb, table)
    yield idx, emb
    idx.drop()


def test_search_matches_d88_oracle_checked_query(spark, built):
    from kpipe_spark.queries import all_queries

    idx, emb = built
    panel = emb.filter("vec_id % 25 = 0 AND vec_id < 500")
    got = sorted(
        tuple(r) for r in idx.search(panel, k=10, nprobe=2).collect()
    )
    want = sorted(
        tuple(r)
        for r in all_queries()["d88_ivfpq_topk"].build(spark, SF_SMALL).collect()
    )
    assert got == want


def test_search_scan_is_partition_pruned(spark, built):
    idx, emb = built
    one_query = emb.filter("vec_id = 100")
    res = idx.search(one_query, k=5, nprobe=2)
    res.collect()
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the code-table scan must carry a non-empty partition filter on
    # cell — the parquet layout's equivalent of IVF inverted lists
    scan_lines = [
        ln
        for ln in plan.splitlines()
        if idx.table in ln or "PartitionFilters" in ln
    ]
    assert any(
        "PartitionFilters: [cell" in ln.replace(" ", " ")
        and "IN" in ln.upper()
        for ln in scan_lines
    ), plan[:4000]
    # and with nprobe=2 of 16 cells, a single query reads at most 2
    # cells' worth of files
    n_total = len(spark.table(idx.table).inputFiles())
    n_read = len(
        spark.table(idx.table)
        .filter(F.col("cell").isin([0, 1]))
        .inputFiles()
    )
    assert n_read < n_total


def test_attach_roundtrips_and_validates_family(spark, built):
    idx, _ = built
    attached = AnnIndex.attach(spark, idx.table)
    assert (attached.m, attached.sub_dim, attached.k_codes, attached.n_cells) == (
        idx.m,
        idx.sub_dim,
        idx.k_codes,
        idx.n_cells,
    )
    AnnIndex.attach(spark, idx.table, m=idx.m)  # restating is fine
    with pytest.raises(ValueError, match="family mismatch"):
        AnnIndex.attach(spark, idx.table, m=idx.m * 2)
    with pytest.raises(ValueError, match="no such ANN index"):
        AnnIndex.attach(spark, f"ann_missing_{uuid.uuid4().hex[:8]}")


def test_append_uses_stored_codebooks_and_is_searchable(spark, built):
    idx, emb = built
    n_before = spark.table(idx.table).count()
    # append exact copies of two existing vectors under new ids: they
    # must encode to the SAME codes as their originals (stored
    # codebooks, not re-trained) and surface as 0-extra-distance
    # neighbors of their twins
    twins = (
        emb.filter("vec_id IN (100, 200)")
        .select((F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label")
    )
    idx.append(twins)
    assert spark.table(idx.table).count() == n_before + 2
    codes = {
        r["vec_id"]: (list(r["codes"]), r["cell"])
        for r in spark.table(idx.table)
        .filter("vec_id IN (100, 200, 10100, 10200)")
        .collect()
    }
    assert codes[10100] == codes[100]
    assert codes[10200] == codes[200]
    hits = idx.search(emb.filter("vec_id = 100"), k=5, nprobe=2).collect()
    by_rank = {r["rn"]: r for r in hits}
    # the twin has identical codes, so its ADC distance equals the
    # query's own residual-quantization floor — rank 1
    assert by_rank[1]["neighbor_id"] == 10100


def test_append_advisory_then_compact_preserves_search(spark):
    """Steady-state ingest hygiene: append() warns past the per-cell
    advisory threshold, compact() rewrites one file per cell WITHOUT
    changing search results, and the post-compaction scan still
    partition-prunes."""
    import logging

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    table = f"ann_cmp_{uuid.uuid4().hex[:8]}"
    idx = AnnIndex.build(spark, emb.filter("vec_id < 400"), table)
    try:
        idx.advisory_files_per_cell = 1
        with caplog_at(logging.WARNING) as records:
            for i in range(2):
                lo, hi = 400 + i * 50, 450 + i * 50
                idx.append(emb.filter(f"vec_id >= {lo} AND vec_id < {hi}"))
        assert any("compact()" in r.message for r in records)

        panel = emb.filter("vec_id % 25 = 0 AND vec_id < 500")
        before = sorted(map(tuple, idx.search(panel).collect()))
        n_before = len(spark.table(table).inputFiles())

        idx.compact()

        n_after = len(spark.table(table).inputFiles())
        assert n_after <= idx.n_cells
        assert n_after < n_before
        after = sorted(map(tuple, idx.search(panel).collect()))
        assert after == before
        # family properties survive the rewrite; pruning still plans
        assert AnnIndex.attach(spark, table).n_cells == idx.n_cells
        res = idx.search(emb.filter("vec_id = 100"), k=3)
        res.collect()
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [cell" in plan
    finally:
        idx.drop()


def test_build_accepts_pretrained_centroids(spark):
    """Production passes real k-means centroids; the index stores and
    uses THOSE (n_cells adopts the centroid count, search assigns
    against the side table — not the first-k convention)."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    # 4 'trained' centroids: vectors 7, 99, 250, 411 under new cell ids
    cents = (
        emb.filter("vec_id IN (7, 99, 250, 411)")
        .select(
            (F.dense_rank().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.orderBy("vec_id")
            ) - 1).alias("cell"),
            F.col("embedding").alias("centroid"),
        )
    )
    table = f"ann_km_{uuid.uuid4().hex[:8]}"
    idx = AnnIndex.build(spark, emb, table, centroids=cents)
    try:
        assert idx.n_cells == 4
        assert AnnIndex.attach(spark, table).n_cells == 4
        assert spark.table(idx._centroids_table).count() == 4
        cells = {r["cell"] for r in spark.table(table).select("cell").distinct().collect()}
        assert cells <= {0, 1, 2, 3}
        hits = idx.search(emb.filter("vec_id = 7"), k=3, nprobe=1)
        rows = hits.collect()
        assert len(rows) == 3
        # vector 7 IS centroid 0: all its candidates come from cell 0
        assert {r["cell"] for r in rows} == {0}
    finally:
        idx.drop()


from contextlib import contextmanager


@contextmanager
def caplog_at(level):
    import logging

    records = []

    class H(logging.Handler):
        def emit(self, record):
            records.append(record)

    h = H(level=level)
    logger = logging.getLogger("kpipe_spark.functions.ann_index")
    logger.addHandler(h)
    old = logger.level
    logger.setLevel(level)
    try:
        yield records
    finally:
        logger.removeHandler(h)
        logger.setLevel(old)
