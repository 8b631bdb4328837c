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
