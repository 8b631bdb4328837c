"""CorpusIndex — the stored near-dup index a production corpus runs
incremental admission against, packaged as an API.

The day-to-day 100 TB dedup loop is not "dedup the corpus" (paid once)
but "admit today's batch against what we already have". The artifact
that makes each admission batch-sized is the MinHash band table
``(doc_id, band, bucket)`` materialized BUCKETED on the join key:

    CorpusIndex.build(spark, corpus, "corpus_bands")   # paid once
    ledger = idx.admit(batch)       # batch-sized signatures, equi-join
                                    # into the bucketed table — the
                                    # corpus side plans NO Exchange
    idx.append(admitted_docs)       # keep the index current

``admit`` emits the keep-one admission ledger (d54's semantics with
the classification generalized off the fixture's id%4 convention):
one row per batch doc with corpus/batch partner counts, the lowest
partner id, and the keep-one ``admitted`` verdict — a doc is admitted
iff nothing in the corpus collides with it and no batch partner with
a lower id claims the duplicate group.

Reference parity: kpipe's pipeline surface has no dedup index
(/root/reference/README.md:190-208 declares analytics out of scope);
this is north-star LLM-pipeline surface (SURVEY.md §2.4), the API
form of d54/p04's oracle-checked query shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kpipe_spark.functions.dedup import (
    MINHASH_BANDS,
    MINHASH_NUM_HASHES,
    minhash_bands_df,
    minhash_signature_df,
)


class CorpusIndex:
    """Handle to a stored, bucketed MinHash band table.

    The MinHash family (num_hashes, bands, shingle_k) is part of the
    index's identity — admitting with a different family than the one
    the index was built with would silently miss every collision, so
    the parameters travel with the handle and ``append`` re-uses them.
    """

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        num_hashes: int = MINHASH_NUM_HASHES,
        bands: int = MINHASH_BANDS,
        shingle_k: int = 3,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        self.spark = spark
        self.table = table
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    # -- construction ---------------------------------------------------------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        table: str,
        num_buckets: int = 32,
        **family,
    ) -> "CorpusIndex":
        """Index a corpus: signatures -> bands -> bucketed table on
        (band, bucket). The one corpus-sized pass; every later admit
        joins into the result without re-shuffling it."""
        idx = cls(spark, table, **family)
        from kpipe_spark.util import write_bucketed

        write_bucketed(
            idx._bands_of(corpus),
            table,
            keys=["band", "bucket"],
            num_buckets=num_buckets,
        )
        return idx

    @classmethod
    def attach(cls, spark: SparkSession, table: str, **family) -> "CorpusIndex":
        """Handle to an existing band table (built in a prior session
        or by another job). The caller asserts the family parameters
        match the ones the table was built with."""
        if not spark.catalog.tableExists(table):
            raise ValueError(f"no such index table: {table}")
        return cls(spark, table, **family)

    def _bands_of(self, docs: DataFrame) -> DataFrame:
        return minhash_bands_df(
            minhash_signature_df(
                docs,
                self.text_col,
                self.id_col,
                self.num_hashes,
                self.shingle_k,
            ),
            self.id_col,
            self.num_hashes,
            self.bands,
        )

    @property
    def bands_df(self) -> DataFrame:
        """The stored (id, band, bucket) table — bucketed, so equi-
        joins on (band, bucket) plan no Exchange on this side."""
        return self.spark.table(self.table)

    # -- the admission loop ---------------------------------------------------

    def admit(self, batch: DataFrame) -> DataFrame:
        """Keep-one admission ledger for a new batch: one row per batch
        doc — (id, n_corpus_dups, n_batch_dups, min_dup_id, admitted).

        admitted == no corpus collision AND no batch partner with a
        lower id (the group's lowest id carries the batch's one copy
        forward). Batch-sized signature work; the corpus side is the
        bucketed artifact (two joins unioned AFTER so the bucketed
        side stays exchange-free — see incremental_minhash_partners'
        docstring for why a pre-join union would re-shuffle it)."""
        ids = F.col(self.id_col)
        new_bands = self._bands_of(batch).localCheckpoint(eager=True)
        new_side = new_bands.select(
            ids.alias("id_new"), "band", "bucket"
        )

        def other(frame: DataFrame, origin: str) -> DataFrame:
            return frame.select(
                ids.alias("id_other"),
                "band",
                "bucket",
                F.lit(origin == "corpus").alias("in_corpus"),
            )

        # id_new == id_other is a SELF-pair only on the batch side; a
        # same-id collision against the CORPUS means "this doc is
        # already indexed" (a re-ingest) and must count as a dup —
        # without it, re-admitting an appended batch reports everything
        # novel again
        partners = (
            new_side.join(other(self.bands_df, "corpus"), ["band", "bucket"])
            .unionByName(
                new_side.join(other(new_bands, "batch"), ["band", "bucket"])
            )
            .filter(
                F.col("in_corpus") | (F.col("id_new") != F.col("id_other"))
            )
            .select("id_new", "id_other", "in_corpus")
            .distinct()
        )
        in_c = F.col("in_corpus")
        ledger = (
            batch.select(ids)
            .join(partners, ids == F.col("id_new"), "left")
            .groupBy(self.id_col)
            .agg(
                F.sum(F.when(in_c, 1).otherwise(0)).alias("n_corpus_dups"),
                F.sum(F.when(~in_c, 1).otherwise(0)).alias("n_batch_dups"),
                F.min("id_other").alias("min_dup_id"),
                F.coalesce(
                    F.max(in_c | (F.col("id_other") < F.col("id_new"))),
                    F.lit(False),
                ).alias("_lose"),
            )
        )
        return ledger.select(
            self.id_col,
            "n_corpus_dups",
            "n_batch_dups",
            "min_dup_id",
            (~F.col("_lose")).alias("admitted"),
        )

    def append(self, admitted_docs: DataFrame) -> None:
        """Add admitted docs' bands to the index (same family, same
        bucket spec — Spark validates the bucketing matches on append),
        so the next batch collides against them."""
        spec = (
            self.spark.sql(f"DESCRIBE TABLE EXTENDED {self.table}")
            .filter(F.col("col_name") == "Num Buckets")
            .select("data_type")
            .collect()
        )
        if not spec:
            raise ValueError(
                f"{self.table} is not a bucketed table — append requires "
                "an index created by CorpusIndex.build/write_bucketed "
                "(appending unbucketed bands would silently break the "
                "exchange-free admit join)"
            )
        n_buckets = int(spec[0][0])
        (
            self._bands_of(admitted_docs)
            .write.mode("append")
            .bucketBy(n_buckets, "band", "bucket")
            .saveAsTable(self.table, format="parquet")
        )

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")
