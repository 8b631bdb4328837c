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

# Round-14 suite tiering: this module is in the SLOW tier (excluded from
# the driver's default `pytest tests/ -q` run by addopts; run with -m slow).
# See pyproject.toml [tool.pytest.ini_options] for the rationale.
pytestmark = pytest.mark.slow


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


def _warehouse_path(spark) -> str:
    import urllib.parse

    return urllib.parse.urlparse(
        spark.conf.get("spark.sql.warehouse.dir")
    ).path


def test_build_reclaims_orphaned_locations(spark):
    """A crashed prior build leaves managed directories (code table
    AND side tables) with no catalog entry; build() must reclaim all
    three instead of dying with LOCATION_ALREADY_EXISTS on the rerun
    (CorpusIndex's round-7 resilience rule, applied to the ANN
    artifact's three-table layout)."""
    import os

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    table = f"ann_orphan_{uuid.uuid4().hex[:8]}"
    wh = _warehouse_path(spark)
    for t in (table, f"{table}__centroids", f"{table}__codebooks"):
        loc = os.path.join(wh, t)
        os.makedirs(loc)
        with open(os.path.join(loc, "leftover.parquet"), "w") as f:
            f.write("junk from a crashed run")
    idx = AnnIndex.build(spark, emb.filter("vec_id < 200"), table)
    try:
        hits = idx.search(emb.filter("vec_id = 100"), k=3).collect()
        assert len(hits) == 3
    finally:
        idx.drop()
    for t in (table, f"{table}__centroids", f"{table}__codebooks"):
        assert not os.path.exists(os.path.join(wh, t)), t


def test_append_returns_file_count_and_drop_leaves_no_orphan(spark):
    """append()'s return value is the index's actual file count (the
    contract the advisory is computed from — test_corpus_index.py's
    discipline), and drop() removes every warehouse directory: a
    lingering one IS the orphan the next build would have to
    reclaim."""
    import os

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    table = f"ann_files_{uuid.uuid4().hex[:8]}"
    idx = AnnIndex.build(spark, emb.filter("vec_id < 300"), table)
    wh = _warehouse_path(spark)
    try:
        n = idx.append(emb.filter("vec_id >= 300 AND vec_id < 350"))
        assert isinstance(n, int)
        assert n == len(spark.table(table).inputFiles())
        assert n > 0
    finally:
        idx.drop()
    assert not spark.catalog.tableExists(table)
    for t in (table, f"{table}__centroids", f"{table}__codebooks"):
        assert not os.path.exists(os.path.join(wh, t)), t


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


def test_adaptive_probe_uniform_counts_equals_fixed_nprobe(spark, built):
    """Mass-adaptive probing (the d93 gate in the stored artifact):
    with a UNIFORM injected cell profile the gate admits exactly
    ``budget`` cells per query — cum_prev of rank r is (r-1)·n̄ and
    (r-1)·n̄·n_cells < budget·n_cells·n̄ ⇔ r ≤ budget — so the result
    must equal the fixed-nprobe search row for row."""
    idx, emb = built
    panel = emb.filter("vec_id % 25 = 0 AND vec_id < 500")
    uniform = spark.createDataFrame(
        [(c, 10) for c in range(idx.n_cells)], "cell int, n long"
    )
    adaptive = sorted(
        tuple(r)
        for r in idx.search(
            panel, k=10, probe_budget=2, cell_counts=uniform
        ).collect()
    )
    fixed = sorted(
        tuple(r) for r in idx.search(panel, k=10, nprobe=2).collect()
    )
    assert adaptive == fixed


def test_adaptive_probe_full_budget_equals_all_cells(spark, built):
    """budget = n_cells admits every ranked cell (cum_prev < total
    always) — identical to exhaustive fixed probing."""
    idx, emb = built
    panel = emb.filter("vec_id % 50 = 0 AND vec_id < 300")
    adaptive = sorted(
        tuple(r)
        for r in idx.search(panel, k=5, probe_budget=idx.n_cells).collect()
    )
    fixed = sorted(
        tuple(r)
        for r in idx.search(panel, k=5, nprobe=idx.n_cells).collect()
    )
    assert adaptive == fixed


def test_adaptive_probe_skew_widens_and_narrows(spark, built):
    """The point of the rule: a query whose nearest cell is FAT stops
    at 1 probe, one whose nearest cells are TINY probes more — checked
    with injected skewed profiles so the expectation is exact. With
    the top-ranked cell holding half the corpus, rank 2's gate is
    (total/2)·n_cells < 2·total ⇔ n_cells < 4, false at 16 cells ⇒
    exactly 1 probed cell per query; with counts concentrated AWAY
    from everyone's first cells the gate keeps admitting until the
    cumulative prefix holds 2/n_cells of the mass."""
    from pyspark.sql import functions as F  # noqa: F811

    idx, emb = built
    one_query = emb.filter("vec_id = 100")
    ranked_first = (
        idx.search(one_query, k=5, nprobe=1).select("cell").distinct()
    ).collect()[0]["cell"]
    # profile A: the query's own first cell holds half the corpus
    half = [
        (c, 160 if c == ranked_first else 160 // (idx.n_cells - 1))
        for c in range(idx.n_cells)
    ]
    prof_a = spark.createDataFrame(half, "cell int, n long")
    hits_a = idx.search(
        one_query, k=5, probe_budget=2, cell_counts=prof_a
    )
    assert hits_a.select("cell").distinct().count() == 1
    # profile B: every cell tiny and equal except a far one — uniform
    # again, so exactly 2 cells probed; more cells than profile A
    prof_b = spark.createDataFrame(
        [(c, 10) for c in range(idx.n_cells)], "cell int, n long"
    )
    hits_b = idx.search(
        one_query, k=5, probe_budget=2, cell_counts=prof_b
    )
    assert hits_b.select("cell").distinct().count() == 2


def test_adaptive_probe_derives_counts_and_prunes(spark, built):
    """Without an injected profile the counts resolve to the STORED
    cell-count side table; results stay inside the probed cells and
    the code-table scan still carries the static partition filter (the
    probe DECISION must not defeat the pruning it serves)."""
    idx, emb = built
    one_query = emb.filter("vec_id = 100")
    res = idx.search(one_query, k=5, probe_budget=2)
    rows = res.collect()
    assert rows
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert any(
        idx.table in ln and "PartitionFilters: [cell" in ln
        for ln in plan.splitlines()
    ), plan[:4000]


def _profile_of(spark, table, cast_cell: bool = False):
    frame = spark.table(table)
    if cast_cell:
        frame = frame.groupBy(F.col("cell").cast("long").alias("cell")).agg(
            F.count(F.lit(1)).alias("n")
        )
    return {int(r["cell"]): int(r["n"]) for r in frame.collect()}


def test_profile_maintained_across_build_append_compact(spark):
    """The stored cell-count profile tracks the code table exactly at
    every lifecycle point — build seed, N append folds, compact
    recount — so adaptive probing's mass gate always sees the true
    distribution without scanning the index (round-12 verdict #2)."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    table = f"ann_prof_{uuid.uuid4().hex[:8]}"
    idx = AnnIndex.build(spark, emb.filter("vec_id < 300"), table)
    try:
        assert spark.catalog.tableExists(idx._profile_table)
        assert _profile_of(spark, idx._profile_table) == _profile_of(
            spark, idx.table, cast_cell=True
        )
        for lo, hi in ((300, 360), (360, 420)):
            idx.append(emb.filter(f"vec_id >= {lo} AND vec_id < {hi}"))
            assert _profile_of(spark, idx._profile_table) == _profile_of(
                spark, idx.table, cast_cell=True
            ), f"profile diverged after append [{lo},{hi})"
        idx.compact()
        assert _profile_of(spark, idx._profile_table) == _profile_of(
            spark, idx.table, cast_cell=True
        )
        # the profile is ≤ n_cells rows — bounded side state, not index
        assert spark.table(idx._profile_table).count() <= idx.n_cells
    finally:
        idx.drop()
    assert not spark.catalog.tableExists(f"{table}__cellcounts")


def test_probe_decision_reads_profile_not_code_table(spark, built):
    """The 100 TB contract: with a stored profile present, the probe
    decision's input plan scans ``__cellcounts`` and never the code
    table (the table name is anchored with catalog prefix + '[' so the
    side table's prefixed name can't mask a code-table scan)."""
    idx, _ = built
    prof = idx.cell_profile()
    prof.collect()
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "__cellcounts" in plan, plan[:2000]
    code_scan = f".{idx.table}["
    assert not any(
        code_scan in ln for ln in plan.splitlines()
    ), plan[:4000]


def test_cell_profile_falls_back_for_legacy_index(spark):
    """An index built before the profile existed (side table absent)
    still serves adaptive searches via derive-by-scan, and the first
    append migrates it to an exact stored profile."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    table = f"ann_leg_{uuid.uuid4().hex[:8]}"
    idx = AnnIndex.build(spark, emb.filter("vec_id < 300"), table)
    try:
        spark.sql(f"DROP TABLE {idx._profile_table}")  # simulate legacy
        derived = {
            int(r["cell"]): int(r["n"])
            for r in idx.cell_profile().collect()
        }
        assert derived == _profile_of(spark, idx.table, cast_cell=True)
        hits = idx.search(
            emb.filter("vec_id = 100"), k=5, probe_budget=2
        ).collect()
        assert hits
        idx.append(emb.filter("vec_id >= 300 AND vec_id < 330"))
        assert spark.catalog.tableExists(idx._profile_table)
        assert _profile_of(spark, idx._profile_table) == _profile_of(
            spark, idx.table, cast_cell=True
        )
    finally:
        idx.drop()


def test_refine_reranks_toward_exact(spark, built):
    """IVFADC+R (Jégou 2011 §V): re-ranking the ADC shortlist with
    exact distances must (a) return exact_dist-ascending rows drawn
    from the ADC shortlist's candidate pool, and (b) achieve recall vs
    the probed-cells exact ranking at least as high as the plain ADC
    pass — on this corpus the ADC ordering inside the shortlist is
    imperfect, so refinement strictly helps or ties per query."""
    import numpy as np

    idx, emb = built
    panel = emb.filter("vec_id % 25 = 0 AND vec_id < 500")
    plain = idx.search(panel, k=10, nprobe=2).collect()
    refined = idx.search(
        panel, k=10, nprobe=2, refine_with=emb, refine_factor=4
    ).collect()

    # ground truth: exact top-10 over the SAME probed-cell candidate
    # universe (refinement can't resurrect an unprobed cell)
    rows = sorted(
        (r["vec_id"], list(r["embedding"]))
        for r in emb.select("vec_id", "embedding").collect()
    )
    ids = np.array([i for i, _ in rows])
    x = np.array([v for _, v in rows], dtype=np.float64)
    cents = x[: idx.n_cells]
    cd = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cdq = np.floor(cd * (1 << 24) + 0.5).astype(np.int64)
    cell_of = cdq.argmin(axis=1)
    by_id = {int(ids[i]): i for i in range(len(ids))}

    def exact_topk(qid: int) -> set:
        qi = by_id[qid]
        probed = set(np.argsort(cdq[qi], kind="stable")[:2])
        cand = [
            i
            for i in range(len(ids))
            if cell_of[i] in probed and i != qi
        ]
        d = ((x[cand] - x[qi]) ** 2).sum(axis=1)
        order = sorted(zip(np.floor(d * (1 << 24) + 0.5).astype(np.int64),
                           [int(ids[c]) for c in cand]))
        return {vid for _, vid in order[:10]}

    def group(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    g_plain, g_ref = group(plain), group(refined)
    assert set(g_plain) == set(g_ref)
    better, worse = 0, 0
    for qid in g_plain:
        truth = exact_topk(qid)
        r_plain = len(g_plain[qid] & truth)
        r_ref = len(g_ref[qid] & truth)
        assert r_ref >= r_plain, (qid, r_ref, r_plain)
        better += int(r_ref > r_plain)
        worse += int(r_ref < r_plain)
    assert worse == 0
    assert better > 0, "refinement never improved any query — suspicious"
    # structural: exact_dist ascending and rn dense per query
    per_q = {}
    for r in refined:
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in per_q.items():
        rs = sorted(rs, key=lambda r: r["rn"])
        dists = [r["exact_dist"] for r in rs]
        assert dists == sorted(dists)
        assert [r["rn"] for r in rs] == list(range(1, len(rs) + 1))


def test_update_batch_replay_skip_and_crash_window_repair(spark):
    """Streaming ingest contract: update_batch applies a batch id once
    (re-delivery is a no-op), the append/marker crash window CAN
    duplicate code rows — which corrupts ADC distances, not just row
    counts — and compact() repairs it (full-row dedup) while carrying
    the batch marker across the table swap."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    base = emb.filter("vec_id < 400")
    batch = emb.filter("vec_id >= 400")
    n_batch = batch.count()
    table = f"ann_ub_{uuid.uuid4().hex[:8]}"
    idx = AnnIndex.build(spark, base, table)
    try:
        assert idx.update_batch(batch, 0) is True
        assert idx.last_batch_id() == 0
        rows = spark.table(idx.table).count()

        # re-delivered batch (same id, the Structured Streaming replay
        # geometry) is skipped — code table untouched
        assert idx.update_batch(batch, 0) is False
        assert spark.table(idx.table).count() == rows

        panel = emb.filter("vec_id % 25 = 0 AND vec_id < 500")
        want = sorted(map(tuple, idx.search(panel, k=5, nprobe=2).collect()))

        # crash window: marker write lost AFTER the append landed; the
        # replay re-appends the whole batch
        idx._set_props(last_batch_id=-1)
        assert idx.update_batch(batch, 0) is True
        assert spark.table(idx.table).count() == rows + n_batch
        # each append folds its own counts, so even the duplicated
        # state keeps profile == table (the fold tracks table content)
        assert _profile_of(spark, idx._profile_table) == _profile_of(
            spark, idx.table, cast_cell=True
        )

        # compact() is the repair: exact duplicates dropped, search
        # restored, marker preserved across the rename swap — and the
        # profile recounted to match the deduped table
        idx.compact()
        assert spark.table(idx.table).count() == rows
        assert _profile_of(spark, idx._profile_table) == _profile_of(
            spark, idx.table, cast_cell=True
        )
        got = sorted(map(tuple, idx.search(panel, k=5, nprobe=2).collect()))
        assert got == want
        assert idx.last_batch_id() == 0
        # and the NEXT real batch still admits after compaction
        nxt = emb.filter("vec_id = 499").select(
            (F.col("vec_id") + 5000).alias("vec_id"), "embedding", "label"
        )
        assert idx.update_batch(nxt, 1) is True
        assert idx.last_batch_id() == 1
    finally:
        idx.drop()
