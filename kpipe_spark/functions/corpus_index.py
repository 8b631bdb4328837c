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

    # family + bucket parameters persisted as table properties at build
    # time, so attach()/append() read the table's OWN identity instead
    # of trusting the caller (a family mismatch silently yields zero
    # collisions — exactly the failure mode the class docstring warns
    # about) or string-parsing DESCRIBE output (brittle across Spark
    # catalog-output formats)
    _PROP_PREFIX = "kpipe.index."
    _FAMILY_PROPS = ("num_hashes", "bands", "shingle_k")

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
        idx._write_properties(num_buckets)
        return idx

    def _write_properties(self, num_buckets: int) -> None:
        props = {
            "num_buckets": num_buckets,
            **{p: getattr(self, p) for p in self._FAMILY_PROPS},
        }
        kv = ", ".join(
            f"'{self._PROP_PREFIX}{k}' = '{v}'" for k, v in props.items()
        )
        self.spark.sql(f"ALTER TABLE {self.table} SET TBLPROPERTIES ({kv})")

    def _properties(self) -> dict[str, int]:
        rows = self.spark.sql(f"SHOW TBLPROPERTIES {self.table}").collect()
        return {
            r["key"].removeprefix(self._PROP_PREFIX): int(r["value"])
            for r in rows
            if r["key"].startswith(self._PROP_PREFIX)
        }

    @classmethod
    def attach(cls, spark: SparkSession, table: str, **family) -> "CorpusIndex":
        """Handle to an existing band table (built in a prior session
        or by another job). The MinHash family is read back from the
        table's properties and VALIDATED against any family kwargs the
        caller passes — a silent mismatch would make every admit report
        zero collisions."""
        if not spark.catalog.tableExists(table):
            raise ValueError(f"no such index table: {table}")
        idx = cls(spark, table, **family)
        stored = idx._properties()
        mismatched = {
            p: (family[p], stored[p])
            for p in cls._FAMILY_PROPS
            if p in stored and p in family and family[p] != stored[p]
        }
        if mismatched:
            detail = ", ".join(
                f"{p}: caller {got} != table {want}"
                for p, (got, want) in mismatched.items()
            )
            raise ValueError(
                f"MinHash family mismatch attaching {table} ({detail}) — "
                "admitting with a different family than the index was "
                "built with would silently miss every collision"
            )
        for p in cls._FAMILY_PROPS:  # adopt the table's stored family
            if p in stored:
                setattr(idx, p, stored[p])
        return idx

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

    def _num_buckets(self) -> int:
        props = self._properties()
        if "num_buckets" not in props:
            raise ValueError(
                f"{self.table} carries no {self._PROP_PREFIX}num_buckets "
                "property — append/compact require an index created by "
                "CorpusIndex.build (appending unbucketed bands would "
                "silently break the exchange-free admit join)"
            )
        return props["num_buckets"]

    def append(self, admitted_docs: DataFrame) -> None:
        """Add admitted docs' bands to the index (same family, same
        bucket spec — Spark validates the bucketing matches on append),
        so the next batch collides against them."""
        (
            self._bands_of(admitted_docs)
            .write.mode("append")
            .bucketBy(self._num_buckets(), "band", "bucket")
            .saveAsTable(self.table, format="parquet")
        )

    def compact(self) -> None:
        """Rewrite the band table into one file per bucket, preserving
        the bucket spec (and therefore the exchange-free admit join).

        Every ``append`` batch adds its own file per (task, bucket); at
        100 TB steady state — thousands of admission batches — the
        index accretes small files until open()/footer overhead makes
        the index itself the straggler of every admit (the stored-state
        analogue of kpipe's offset-ledger hygiene,
        /root/reference/docs/OFFSET-INVARIANTS.md). Compaction is one
        index-sized job, NOT corpus-sized: ``repartition(n, band,
        bucket)`` uses the same Murmur3 hash partitioning as the bucket
        spec, so each output task holds exactly one bucket's rows and
        the bucketed write emits one file per bucket. The rewrite goes
        to a side table first and swaps via RENAME, so a failed
        compaction leaves the live index untouched."""
        n_buckets = self._num_buckets()
        tmp = f"{self.table}__compacting"
        self.spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        # reading the table AS bucketed makes the planner elide the
        # explicit repartition (the scan already claims the target
        # partitioning), leaving one output file per (input task,
        # bucket) — the opposite of compaction. Read it as a plain
        # file scan for the rewrite; the WRITE side's bucketBy is
        # unaffected by this conf (measured: 4-bucket index compacts
        # to <= 4 files and still joins exchange-free afterwards).
        conf = "spark.sql.sources.bucketing.enabled"
        prev = self.spark.conf.get(conf, "true")
        self.spark.conf.set(conf, "false")
        try:
            (
                self.bands_df.repartition(
                    n_buckets, F.col("band"), F.col("bucket")
                )
                .write.mode("overwrite")
                .bucketBy(n_buckets, "band", "bucket")
                .saveAsTable(tmp, format="parquet")
            )
        finally:
            self.spark.conf.set(conf, prev)
        live, self.table = self.table, tmp
        try:
            self._write_properties(n_buckets)
        finally:
            self.table = live
        self.spark.sql(f"DROP TABLE {self.table}")
        self.spark.sql(f"ALTER TABLE {tmp} RENAME TO {self.table}")

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")
