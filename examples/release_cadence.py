#!/usr/bin/env python
"""The corpus-release loop, composed from the stored artifacts — what
round 11's `ClusterIndex.refresh_incremental` exists for.

A 100 TB corpus is not re-deduped per batch; the steady state is:

    per batch:    ledger = bands.admit(batch)      # batch-sized equi-join
                  clusters.refresh_incremental(admitted, bands)  # fold FIRST
                  bands.append(admitted)           # then keep index current
    per release:  reports = {n: fn(corpus, clusters.components_df) ...}
                  train   = clusters.survivors(corpus)

The fold-then-append order is ENFORCED by release markers (round-12):
``append`` bumps the band index's ``release_seq`` TBLPROPERTY, the fold
stamps the ``folded_release_seq`` it covered, and
``refresh_incremental`` refuses — repair recipe in the error — when the
band index has moved ahead (a batch appended but never folded would
leave edges the stored labels don't cover). The one tolerated skew is
the documented crash replay: fold landed, append didn't, and the SAME
batch (fingerprint-checked) is re-folded idempotently. An
admission-only deployment (no ClusterIndex — see
examples/streaming_admission.py) appends freely; the markers only bind
indexes that are actually folded from.

The fold never re-reads the old corpus: candidate edges come from the
stored band table (the same join `admit` uses), the old dup graph
participates only as its stored-label contraction, and the write
replaces only the comp_bucket partitions whose components changed.

This example runs one release against a base corpus and proves the
three contracts that make the composition sound:

1. the incremental fold equals the full rebuild over the grown corpus,
   row for row (labels included),
2. the five dedup reports served from the STORED components equal the
   graded queries' self-contained shape on the grown corpus, and
3. keep-one survivors + the admission ledger agree with the component
   table (admitted-novel docs survive; every admission-flagged dup's
   group is represented in the components).

Run: python examples/release_cadence.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.catalog import load_table  # noqa: E402
from kpipe_spark.functions.cluster_index import ClusterIndex  # noqa: E402
from kpipe_spark.functions.corpus_index import CorpusIndex  # noqa: E402
from kpipe_spark.functions.dedup import dup_components  # noqa: E402
from kpipe_spark.functions.dedup_reports import CONSUMERS  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402


def _rows(df) -> set[tuple]:
    return {tuple(r) for r in df.collect()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example-release-cadence")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 10 == 0
    base, release = docs.filter(~is_new), docs.filter(is_new)
    grown = docs

    run = uuid.uuid4().hex[:8]
    bands = CorpusIndex.build(spark, base, f"rc_bands_{run}", num_buckets=8)
    clusters = ClusterIndex.build(spark, base, f"rc_clusters_{run}")
    try:
        # ---- the release ------------------------------------------------
        ledger = bands.admit(release).localCheckpoint(eager=True)
        n_batch = release.count()
        n_admitted = ledger.filter("admitted").count()
        stats = clusters.refresh_incremental(release, bands)
        bands.append(release)  # AFTER the fold (refresh_incremental doc)
        print(
            f"release: {n_batch} docs, {n_admitted} admitted novel, "
            f"fold overwrote {stats['overwritten_buckets']}/"
            f"{stats['num_comp_buckets']} component buckets"
        )

        # ---- contract 1: fold == full rebuild ---------------------------
        fold_ok = _rows(clusters.components_df) == _rows(
            dup_components(grown)
        )

        # ---- contract 2: stored reports == graded self-contained shape --
        comp = clusters.components_df
        inline_comp = dup_components(grown)
        reports_ok = all(
            _rows(fn(grown, comp)) == _rows(fn(grown, inline_comp))
            for fn in CONSUMERS.values()
        )

        # ---- contract 3: survivors/ledger vs components ------------------
        surv = {r["doc_id"] for r in clusters.survivors(grown).collect()}
        members = {
            r["doc_id"]: r["cluster_id"]
            for r in clusters.components_df.collect()
        }
        keep_one_ok = all(
            (d in surv) == (members.get(d, d) == d)
            for d in [r["doc_id"] for r in grown.select("doc_id").collect()]
        )
        # an admission-flagged corpus dup must sit in some component
        dup_ids = {
            r["doc_id"]
            for r in ledger.filter("n_corpus_dups > 0").collect()
        }
        ledger_ok = dup_ids.issubset(set(members))

        # ---- contract 4: the cadence refusal ------------------------------
        # violate the discipline on purpose: append a batch WITHOUT
        # folding it, then try to fold a different one — the marker
        # check must refuse with the repair recipe, not mislabel
        skipped = grown.filter(F.col("doc_id") % 7 == 3).limit(5)
        bands.append(skipped)  # never folded — bands now AHEAD
        refused = False
        try:
            clusters.refresh_incremental(
                grown.filter(F.col("doc_id") % 7 == 5).limit(5), bands
            )
        except ValueError as e:
            refused = "release-cadence violation" in str(e)
        print(f"append-without-fold refused with repair recipe = {refused}")

        ok = fold_ok and reports_ok and keep_one_ok and ledger_ok and refused
        print(
            "incremental fold == full rebuild, stored reports == graded "
            f"shape, keep-one + ledger sound = {ok}"
        )
    finally:
        bands.drop()
        clusters.drop()
        spark.stop()


if __name__ == "__main__":
    main()
