"""Shared catalog lifecycle of every STORED ARTIFACT in the engine —
the "build once, persist as a managed table, attach from any later
session, validate the hyper-parameter family before serving"
discipline that CorpusIndex pioneered and AnnIndex / UnigramTokenizer
/ the sketch trio (BloomGate, CmsSketch, HllSketch) repeat.

Through round 9 each artifact carried its own copy of the same four
blocks (existence check + family validation on ``attach``,
TBLPROPERTIES read/write, batch-marker bookkeeping, ``drop``) — six
near-identical implementations whose only real differences were the
property namespace and the wording of the mismatch error. This base
owns the blocks once; a subclass declares:

- ``_PROP_PREFIX``: the TBLPROPERTIES namespace (``kpipe.ann.`` ...)
- ``_FAMILY_PROPS``: the attribute names that ARE the family — the
  hyper-parameters state was derived under, which serving must match
  (probing/searching/segmenting under a different family returns
  garbage silently; that is why ``attach`` hard-fails on mismatch)
- ``_KIND``: human table kind for the "no such ... table" error
- ``_FAMILY_LABEL`` + ``_MISMATCH_HINT``: the mismatch error's name
  for the family and its consequence clause

and keeps only what genuinely differs: the state derivation, the
merge algebra / serving path, and any artifact-specific maintenance
(compaction, per-batch updates).

All family properties are integers by convention (floats are stored
pre-quantized — the cross-engine determinism rule); ``_read_props``
int-casts accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class StoredArtifact:
    """Base lifecycle for managed-table artifacts (module docstring)."""

    # subclass contract
    _PROP_PREFIX: str
    _FAMILY_PROPS: tuple[str, ...]
    _KIND: str
    _FAMILY_LABEL: str
    _MISMATCH_HINT: str

    spark: SparkSession
    table: str
    id_col: str  # required only by _batch_fingerprint-using artifacts

    # -- lifecycle -----------------------------------------------------

    @classmethod
    def attach(cls, spark: SparkSession, table: str, **family: int):
        """Handle to a stored artifact; the family reads back from
        TBLPROPERTIES and is validated against explicit kwargs."""
        if not spark.catalog.tableExists(table):
            raise ValueError(f"no such {cls._KIND} table: {table}")
        art = cls(spark, table, **family)
        stored = art._read_props()
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
                f"{cls._FAMILY_LABEL} mismatch attaching {table} "
                f"({detail}) — {cls._MISMATCH_HINT}"
            )
        for p in cls._FAMILY_PROPS:  # adopt the table's stored family
            if p in stored:
                setattr(art, p, stored[p])
        return art

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")

    def last_batch_id(self) -> int:
        """Highest micro-batch id applied by an ``update_batch``-style
        maintainer; -1 when never updated (or the artifact kind keeps
        no marker)."""
        return int(self._read_props().get("last_batch_id", -1))

    def _batch_fingerprint(self, batch: DataFrame) -> tuple[int, int]:
        """Order-insensitive batch identity, batch-scaled: (row count,
        sum of pmod(xxhash64(id_col), 2^31)). Lets cadence markers
        distinguish a crash-replay of the SAME batch (allowed,
        idempotent) from a DIFFERENT batch arriving in an inconsistent
        marker state (refused / repaired). The summands are < 2^31, so
        the int64 sum is exact for any batch under 2^32 rows."""
        from pyspark.sql import functions as F

        row = batch.agg(
            F.count(F.lit(1)).alias("_n"),
            F.coalesce(
                F.sum(F.pmod(F.xxhash64(self.id_col), F.lit(1 << 31))),
                F.lit(0),
            ).alias("_h"),
        ).collect()[0]
        return int(row["_n"]), int(row["_h"])

    # -- internals -----------------------------------------------------

    def _replace_table(
        self,
        state: DataFrame,
        partition_by: str | None = None,
        **marker: int,
    ) -> None:
        """(Re)build the artifact table from ``state`` and persist the
        family properties (plus any ``marker`` extras, e.g. the
        initial last_batch_id). Reclaims an orphaned directory first
        so a crashed prior job can't fail the build with
        LOCATION_ALREADY_EXISTS."""
        from kpipe_spark.util import reclaim_orphaned_table_location

        reclaim_orphaned_table_location(self.spark, self.table)
        writer = state.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.saveAsTable(self.table, format="parquet")
        self._set_props(**marker)

    def _compact_unpartitioned_via_park(self, merged_state: DataFrame) -> None:
        """Replace an UNPARTITIONED artifact table's accreted state with
        ``merged_state`` under the park discipline (CmsSketch.compact's
        containment, simplified for tables without partitions):

        1. the merged state is parked in a ``__compacting`` side table,
           then the live table's last_batch_id is recorded on the park
           (marker AFTER data: an unmarked park is an incomplete write
           whose swap never started — live intact, drop and redo);
        2. the swap is one whole-table INSERT OVERWRITE reading from
           the park — a crash mid-swap leaves the complete merged copy
           under the park name and recovery resumes the swap, refusing
           first if the live table applied NEWER batches than the park
           merged (streams restarted after the crash; swapping would
           silently drop their state);
        3. the live table is never dropped/recreated, so family
           TBLPROPERTIES and the replay marker survive untouched.

        Run with streams STOPPED (their checkpoints intact)."""
        from kpipe_spark.util import reclaim_orphaned_table_location

        tmp = f"{self.table}__compacting"
        merged_prop = f"{self._PROP_PREFIX}compact_merged_max_batch_id"
        if not self.spark.catalog.tableExists(tmp):
            reclaim_orphaned_table_location(self.spark, tmp)
            merged_max = self.last_batch_id()
            merged_state.write.mode("overwrite").saveAsTable(
                tmp, format="parquet"
            )
            self.spark.sql(
                f"ALTER TABLE {tmp} SET TBLPROPERTIES "
                f"('{merged_prop}' = '{int(merged_max)}')"
            )
        else:
            park_max = next(
                (
                    int(r["value"])
                    for r in self.spark.sql(
                        f"SHOW TBLPROPERTIES {tmp}"
                    ).collect()
                    if r["key"] == merged_prop
                ),
                None,
            )
            if park_max is None:
                # marker is written AFTER the park data and BEFORE the
                # live overwrite, and these compacts have no pre-marker
                # era: an unmarked park is an incomplete park write,
                # the swap never started, the live table is complete —
                # drop the park and restart the compact from live.
                self.spark.sql(f"DROP TABLE {tmp}")
                self._compact_unpartitioned_via_park(merged_state)
                return
            if self.last_batch_id() > park_max:
                raise RuntimeError(
                    f"compact() recovery refused for {self.table}: the "
                    f"leftover park {tmp} merged batches up to "
                    f"{park_max}, but the live table has applied newer "
                    f"batch ids (last_batch_id="
                    f"{self.last_batch_id()}) — streams were restarted "
                    "after a crashed compact, and resuming the swap "
                    "would drop their state. With streams stopped, "
                    f"INSERT INTO {tmp} the live rows, set "
                    f"'{merged_prop}' = '{self.last_batch_id()}' on "
                    f"{tmp}, then re-run compact()."
                )
        self.spark.sql(
            f"INSERT OVERWRITE TABLE {self.table} SELECT * FROM {tmp}"
        )
        self.spark.sql(f"REFRESH TABLE {self.table}")
        self.spark.sql(f"DROP TABLE {tmp}")

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
