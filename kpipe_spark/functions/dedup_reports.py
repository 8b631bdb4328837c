"""Downstream consumers of the near-dup COMPONENT table, factored so
one component derivation can feed all of them.

Each function takes ``(docs, comp)`` where ``comp`` is the dup-graph
component table in ``dedup.dup_components``' shape — and deliberately
does NOT derive it. The derivation is the expensive subtree (MinHash
signatures -> star-expanded candidate pairs -> label propagation),
and through round 9 the five registered consumers (d24, d47, d52,
d55, d65) each recomputed it from scratch: correct, and required for
oracle grading (each graded query must be self-contained), but the
production shape at 100 TB is "derive once, consume many". The stored
form of "once" is ``functions.cluster_index.ClusterIndex``; these
functions are the shared consumer bodies both forms call:

- the registered queries pass ``dup_components(docs)`` (inline, the
  graded self-contained form — their oracles and results are
  unchanged by this refactor), and
- ``examples/cluster_reuse.py`` / production code pass
  ``ClusterIndex.components_df`` (the stored artifact), paying the
  subtree once per corpus instead of once per report.

Every function is a small aggregation over one corpus scan joined
with the component frame through the size-gated
``dedup.join_components`` (broadcast-hinted only when the component
table's plan-stat size is under the reviewed bound — at realistic
web dup rates the dup graph is corpus-order and must shuffle-join) —
the per-consumer marginal cost the artifact buys down to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kpipe_spark.functions.dedup import (
    clusters_from_components,
    join_components,
    md5_hash60,
)
from kpipe_spark.functions.mixing import temperature_normalize
from kpipe_spark.util import ieee_round


def cluster_stats(
    docs: DataFrame, comp: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """d24's report: per non-singleton cluster, its size and canonical
    count (always 1 — the min-id member)."""
    return (
        clusters_from_components(docs, comp, id_col)
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.sum(F.col("is_canonical").cast("int")).alias("n_canonical"),
        )
        .filter(F.col("cluster_size") > 1)
        .orderBy("cluster_id")
    )


def survivors_by_source(docs: DataFrame, comp: DataFrame) -> DataFrame:
    """d47's report: per source, documents and chars surviving
    keep-one dedup vs totals."""
    is_canonical = (
        F.coalesce("cluster_id", F.col("doc_id")) == F.col("doc_id")
    )
    return (
        join_components(docs.select("doc_id", "source", "n_chars"), comp)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(is_canonical.cast("int")).alias("n_kept"),
            F.sum(
                F.when(is_canonical, F.col("n_chars")).otherwise(0)
            ).alias("kept_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def leakage_safe_split(docs: DataFrame, comp: DataFrame) -> DataFrame:
    """d52's report: 80/10/10 split hashed on the CLUSTER id so every
    member of a duplicate component lands in the same split."""
    h = md5_hash60(F.col("cluster_id").cast("string")) % 100
    split = F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    return (
        join_components(docs.select("doc_id"), comp)
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .select("doc_id", "cluster_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
    )


def dedup_adjusted_mixture(docs: DataFrame, comp: DataFrame) -> DataFrame:
    """d55's report: T=0.5 temperature mixture weights over the tokens
    that SURVIVE keep-one dedup, per source."""
    kept = (
        F.coalesce("cluster_id", F.col("doc_id")) == F.col("doc_id")
    ).cast("int")
    tok = join_components(
        docs.select(
            "doc_id", "source", F.size(F.split("text", " ")).alias("_n")
        ),
        comp,
    ).select("source", "_n", kept.alias("_kept"))
    s = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("raw_docs"),
        F.sum("_kept").alias("kept_docs"),
        F.sum(
            F.when(F.col("_kept") == 1, F.col("_n")).otherwise(0)
        ).alias("kept_tokens"),
    )
    p = temperature_normalize(s, "kept_tokens")
    return p.select(
        "source",
        "raw_docs",
        "kept_docs",
        "kept_tokens",
        ieee_round(F.col("_pt") / F.col("_denom"), 6).alias("sample_prob"),
    )


def cluster_size_histogram(docs: DataFrame, comp: DataFrame) -> DataFrame:
    """d65's report: cluster count at each size, plus the singleton
    row (documents in no candidate pair)."""
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )
    singles = (
        docs.agg(F.count(F.lit(1)).alias("_total"))
        .crossJoin(F.broadcast(comp.agg(F.count(F.lit(1)).alias("_dup"))))
        .select(
            F.lit(1).cast("long").alias("cluster_size"),
            (F.col("_total") - F.col("_dup")).alias("n_clusters"),
        )
    )
    return (
        hist.select(
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
        )
        .unionByName(singles)
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
        )
    )


#: name -> consumer body, for iterating the family (example + bench A/B)
CONSUMERS = {
    "d24_dup_clusters": cluster_stats,
    "d47_dedup_survivors": survivors_by_source,
    "d52_leakage_safe_split": leakage_safe_split,
    "d55_dedup_adjusted_mixture": dedup_adjusted_mixture,
    "d65_cluster_size_histogram": cluster_size_histogram,
}
