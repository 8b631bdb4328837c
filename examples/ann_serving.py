#!/usr/bin/env python
"""ANN serving against a stored IVF-PQ index — encode once, search
probed cells only (the 100 TB embedding-search loop).

A 100 TB float corpus cannot be scanned per query; the artifact that
makes search cheap is the IVF-PQ index (Jégou 2011): each vector
stored as m small codes, partitioned by its coarse cell, so a query

    assigns itself to nprobe nearest cells      (16-row broadcast)
    builds an ADC lookup table                  (m×k, broadcast)
    scans ONLY the probed cells' code files     (partition pruning)
    ranks candidates by table lookups + adds    (never a decode)

This example runs the whole loop: build the index from the embeddings
table, search a query batch, verify the results equal the
oracle-checked d88 registry query (the index is that query's stored
form), append new vectors encoded against the STORED codebooks, and
confirm an appended twin ranks first for its original.

Run: python examples/ann_serving.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kpipe_spark.catalog import load_table  # noqa: E402
from kpipe_spark.functions.ann_index import AnnIndex  # noqa: E402
from kpipe_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="ann-serving-example", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    idx = AnnIndex.build(spark, emb, f"ann_demo_{uuid.uuid4().hex[:8]}")
    try:
        # search the d88 eval panel; the API must return exactly the
        # oracle-checked registry rows (same family, same panel)
        panel = emb.filter("vec_id % 25 = 0 AND vec_id < 500")
        hits = idx.search(panel, k=10, nprobe=2)
        from kpipe_spark.queries import all_queries

        want = sorted(
            map(tuple, all_queries()["d88_ivfpq_topk"].build(spark, sf_dir).collect())
        )
        got = sorted(map(tuple, hits.collect()))
        print("search == oracle-checked d88 rows =", got == want)

        # day-2: new vectors arrive; encode against the STORED
        # codebooks and serve immediately
        twin = emb.filter("vec_id = 100").select(
            (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
        )
        idx.append(twin)
        top = (
            idx.search(emb.filter("vec_id = 100"), k=3, nprobe=2)
            .orderBy("rn")
            .collect()
        )
        print(
            "appended twin ranks first for its original =",
            top[0]["neighbor_id"] == 10100,
        )
    finally:
        idx.drop()


if __name__ == "__main__":
    main()
