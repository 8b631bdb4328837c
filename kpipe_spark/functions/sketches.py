"""Fixed-memory sketch primitives shared by the d96/d97 queries and
the streaming maintenance path: md5-derived integer hash lanes and the
``BloomGate`` stored artifact — a Bloom bitmap (Bloom 1970) persisted
as a managed table and UPDATED per micro-batch, the "fixed-size model
side" the d97 docstring promises.

Why a stored artifact: d97 derives the corpus bit table inline per
query (the oracle contract needs it self-contained), but the 100 TB
admission story is a bitmap that already exists when a batch arrives —
≤ m rows whatever the corpus, broadcastable forever — probed in front
of CorpusIndex's band join so novel documents never pay it.

At-least-once safety: Structured Streaming's foreachBatch re-delivers
a batch (same batchId) after a crash. The gate is safe twice over —
``update_batch`` skips batch ids it has already applied (recorded in
TBLPROPERTIES), and even when the skip marker itself is lost to a
crash between the bit append and the property write, re-applying is
harmless because a Bloom update is SET UNION: inserting the same bits
twice is the identity. The probe reads bits through ``distinct()`` so
a duplicate row from that crash window can never double-count a lane.

kpipe parity: the reference has no sketch surface; this is north-star
LLM-pipeline admission machinery (SURVEY.md §2.4), the streaming
companion of d97 (`queries/llm_ops15.py`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kpipe_spark.functions import text as T

# Bloom geometry: m = 2^14 bits, k = 3 lanes. At the sf0.1 corpus
# (~11k bit insertions) the fill is ~50% and the measured FP rate
# ~0.12 — deliberately non-negligible so the d97 false_positive column
# exercises real collisions at oracle scale. A production gate sizes m
# from the expected distinct-fingerprint count (m ≈ 10·n gives ~1% FP
# at k=3); the table stays broadcast-sized through m = 2^27.
BLOOM_M = 1 << 14
BLOOM_K = 3


def md5_lane(col: Column | str, lane: int, mod: int) -> Column:
    """Integer hash lane ``lane``: 8 hex chars of the md5 digest at
    offset 8·lane, hex→decimal, mod ``mod``. Cross-engine exact (the
    oracle mirror is ``md5_lane_sql``)."""
    return (
        F.conv(F.substring(F.md5(col), 1 + 8 * lane, 8), 16, 10).cast(
            "long"
        )
        % mod
    )


def md5_lane_sql(expr: str, lane: int, mod: int) -> str:
    """DuckDB mirror of ``md5_lane`` for oracle SQL."""
    return (
        f"CAST(concat('0x', substr(md5({expr}), {1 + 8 * lane}, 8)) "
        f"AS BIGINT) % {mod}"
    )


def bloom_bits(fp_col: Column, m: int = BLOOM_M, k: int = BLOOM_K) -> Column:
    """array<bigint> of the k bit positions for one fingerprint. The
    bits derive from the FP STRING's own md5 — one extra digest, so
    the oracle's CASE arms stay plain column expressions (d97's
    convention)."""
    return F.array(*[md5_lane(fp_col, i, m) for i in range(k)])


class BloomGate:
    """Stored-artifact Bloom admission gate — the CorpusIndex/AnnIndex
    lifecycle discipline applied to a sketch: build ONCE from the
    corpus, persist the bit table (≤ m rows, FIXED whatever the
    corpus), probe any number of arriving batches, and keep it current
    per micro-batch with an at-least-once-safe ``update_batch``.

    Storage: one managed table ``(bit bigint)``. The geometry (m, k)
    persists as TBLPROPERTIES and ``attach`` validates it against
    explicit kwargs — probing with a different geometry than the bits
    were written under returns garbage verdicts silently (the AnnIndex
    PQ-family rule). ``kpipe.bloom.last_batch_id`` records the highest
    applied micro-batch for replay skipping.

    Guarantee: NO FALSE NEGATIVES. A document whose fingerprint was
    ever inserted probes positive forever; a bloom-negative document
    is definitely novel and can skip the expensive dup-resolution join
    entirely. False positives (~fill^k) pay the exact check and are
    resolved there — the gate trades a bounded extra-work fraction for
    never touching the corpus-sized side on the novel majority.
    """

    _PROP_PREFIX = "kpipe.bloom."
    _FAMILY_PROPS = ("m", "k")

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        m: int = BLOOM_M,
        k: int = BLOOM_K,
    ) -> None:
        self.spark = spark
        self.table = table
        self.m = m
        self.k = k

    # -- lifecycle ---------------------------------------------------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        docs: DataFrame,
        table: str,
        text_col: str = "text",
        m: int = BLOOM_M,
        k: int = BLOOM_K,
    ) -> "BloomGate":
        """Set the bits of every document fingerprint in ``docs`` and
        persist. One corpus pass -> distinct fingerprints -> distinct
        bits (≤ m rows); contentless docs carry no fingerprint and set
        nothing."""
        gate = cls(spark, table, m=m, k=k)
        return cls.build_from_keys(
            spark, gate._fp_keys(docs, text_col), table, m=m, k=k
        )

    @classmethod
    def build_from_keys(
        cls,
        spark: SparkSession,
        keys: DataFrame,
        table: str,
        key_col: str = "key",
        m: int = BLOOM_M,
        k: int = BLOOM_K,
    ) -> "BloomGate":
        """Build over arbitrary string keys — e.g. the corpus's MinHash
        ``(band, bucket)`` keys, which makes the gate a sound front
        door for CorpusIndex's band join: a batch doc whose EVERY band
        key probes negative has certainly no corpus collision (no
        false negatives per key ⇒ none per doc) and never touches the
        stored index (`examples/streaming_admission.py`)."""
        from kpipe_spark.util import reclaim_orphaned_table_location

        gate = cls(spark, table, m=m, k=k)
        reclaim_orphaned_table_location(spark, table)
        gate._bits_of_keys(keys, key_col).write.mode(
            "overwrite"
        ).saveAsTable(table, format="parquet")
        gate._set_props(last_batch_id=-1)
        return gate

    @classmethod
    def attach(
        cls, spark: SparkSession, table: str, **family: int
    ) -> "BloomGate":
        """Handle to a stored gate; geometry reads back from
        TBLPROPERTIES and is validated against explicit kwargs."""
        if not spark.catalog.tableExists(table):
            raise ValueError(f"no such bloom-gate table: {table}")
        gate = cls(spark, table, **family)
        stored = gate._read_props()
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
                f"bloom geometry mismatch attaching {table} ({detail})"
                " — probing under a different (m, k) than the stored "
                "bits were written with returns garbage verdicts "
                "silently"
            )
        for p in cls._FAMILY_PROPS:
            if p in stored:
                setattr(gate, p, stored[p])
        return gate

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")

    # -- serving -----------------------------------------------------

    @property
    def bits_df(self) -> DataFrame:
        return self.spark.table(self.table)

    def n_bits_set(self) -> int:
        """Distinct bits set — the fill audit (FP rate ≈ fill^k)."""
        return self.bits_df.select("bit").distinct().count()

    def probe(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """(id, fp, bloom_positive int) per document with content: 1
        iff ALL k of its bits are set (d97's gated shape against the
        STORED table). Scale: the bit table broadcasts (≤ m rows
        forever); the probe explode is k rows per batch doc —
        batch-sized, never corpus-sized."""
        batch = docs.filter(F.col(text_col).isNotNull()).select(
            id_col, T.fingerprint(text_col).alias("fp")
        )
        verdicts = self.probe_keys(batch.select("fp"), "fp")
        return batch.join(verdicts, "fp").select(
            id_col, "fp", "bloom_positive"
        )

    def probe_keys(self, keys: DataFrame, key_col: str = "key") -> DataFrame:
        """(key, bloom_positive int) over the DISTINCT keys of
        ``keys``: 1 iff ALL k of the key's bits are set. Callers join
        the verdicts back to their rows (batch-sized both sides)."""
        probe = (
            keys.select(F.col(key_col).alias("key"))
            .filter(F.col("key").isNotNull())
            .distinct()
            .select(
                "key",
                F.explode(
                    bloom_bits(F.col("key"), self.m, self.k)
                ).alias("bit"),
            )
        )
        # distinct: a crash between update_batch's append and its
        # skip-marker write can leave duplicate bit rows (harmless for
        # set membership, fatal for a per-lane sum if left in)
        bits = (
            self.bits_df.select("bit")
            .distinct()
            .withColumn("_set", F.lit(1))
        )
        return (
            probe.join(F.broadcast(bits), "bit", "left")
            .groupBy("key")
            .agg(
                (F.sum(F.coalesce("_set", F.lit(0))) == self.k)
                .cast("int")
                .alias("bloom_positive"),
            )
            .withColumnRenamed("key", key_col)
        )

    # -- streaming maintenance ----------------------------------------

    def last_batch_id(self) -> int:
        return int(self._read_props().get("last_batch_id", -1))

    def update_batch(
        self,
        docs: DataFrame,
        batch_id: int,
        text_col: str = "text",
    ) -> bool:
        """Insert the batch's fingerprint bits; returns False when the
        batch id was already applied (the foreachBatch replay no-op).

        At-least-once safety, in order of defense: (1) replays of an
        applied batch id skip on the TBLPROPERTIES marker; (2) a crash
        BETWEEN the bit append and the marker write re-applies the
        batch, which is harmless — the update is set union, and only
        genuinely new bits are appended (anti-join), so the worst case
        is duplicate rows from two racing appends, which ``probe``
        neutralizes with distinct(). Appends go through an eager
        localCheckpoint to sever lineage from the table being written
        (Spark refuses a plan that reads the table it inserts into).
        """
        return self.update_keys(
            self._fp_keys(docs, text_col), batch_id
        )

    def update_keys(
        self,
        keys: DataFrame,
        batch_id: int,
        key_col: str = "key",
    ) -> bool:
        """Key-level form of ``update_batch`` (same replay contract)."""
        if batch_id <= self.last_batch_id():
            return False
        new_bits = (
            self._bits_of_keys(keys, key_col)
            .join(self.bits_df.select("bit"), "bit", "anti")
            .localCheckpoint(eager=True)
        )
        new_bits.write.mode("append").saveAsTable(self.table)
        self._set_props(last_batch_id=batch_id)
        return True

    # -- internals ----------------------------------------------------

    @staticmethod
    def _fp_keys(docs: DataFrame, text_col: str) -> DataFrame:
        return docs.filter(F.col(text_col).isNotNull()).select(
            T.fingerprint(text_col).alias("key")
        )

    def _bits_of_keys(self, keys: DataFrame, key_col: str) -> DataFrame:
        return (
            keys.select(F.col(key_col).alias("key"))
            .filter(F.col("key").isNotNull())
            .distinct()
            .select(
                F.explode(
                    bloom_bits(F.col("key"), self.m, self.k)
                ).alias("bit")
            )
            .distinct()
        )

    def _set_props(self, **extra: int) -> None:
        props = {p: getattr(self, p) for p in self._FAMILY_PROPS}
        props.update(extra)
        joined = ", ".join(
            f"'{self._PROP_PREFIX}{k}' = '{v}'" for k, v in props.items()
        )
        self.spark.sql(
            f"ALTER TABLE {self.table} SET TBLPROPERTIES ({joined})"
        )

    def _read_props(self) -> dict[str, int]:
        rows = self.spark.sql(
            f"SHOW TBLPROPERTIES {self.table}"
        ).collect()
        return {
            r["key"].removeprefix(self._PROP_PREFIX): int(r["value"])
            for r in rows
            if r["key"].startswith(self._PROP_PREFIX)
        }
