"""Budget-constrained greedy selection without a global ordered scan.

The problem: admit rows in (order_key desc, id asc) order, accumulating
``weight``, until the running total reaches ``budget`` (the classic
"best N tokens" corpus cut — a row is admitted iff the total weight of
all strictly-preceding rows is < budget). The direct translation is a
cumulative sum over a TOTAL order — in Spark a window with no
partitionBy, i.e. a single task walking the whole dataset.

``budget_select`` computes the identical admission set with the
exact-quantile two-phase shape instead:

1. quantize ``order_key`` to an integer bucket (callers pass a key that
   is already discrete, e.g. a round4-scaled score — the quantization
   must be order-preserving and collision-free for DISTINCT key
   values, so equal buckets ⟺ equal keys);
2. aggregate a per-bucket weight histogram (ordinary partial agg; the
   histogram is |distinct keys| rows — thousands, not billions) and
   prefix-sum it with a window over the HISTOGRAM;
3. buckets whose prefix fits entirely under budget admit orderlessly;
   only the single boundary bucket — the bucket the budget boundary
   falls inside — flows through an ordered window, partitioned to
   that bucket.

Equivalence to the global greedy: higher bucket ⟹ strictly greater
order_key, and within a bucket every row has the SAME order_key, so the
global order (key desc, id asc) is exactly (bucket desc, id asc) — the
boundary-bucket window ordered by id reproduces the scan's order for
the only rows whose order matters.
tests/test_llm_ops10.py::test_budget_select_matches_global_greedy
checks the equivalence against a plain-Python reference on randomized
inputs (including None weights).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def budget_select(
    df: DataFrame,
    bucket: Column,
    weight: Column,
    budget: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``df`` admitted by the greedy (bucket desc, id asc) scan
    under ``budget`` (a 1-row aggregate DataFrame is NOT taken — pass a
    scalar Column usable in a literal/broadcast context via
    ``F.lit(...)`` or join the budget in beforehand).

    ``bucket`` must be an integer-valued, order-preserving quantization
    of the ranking key (ties in the real key ⟺ same bucket). Returns
    the admitted rows with their original columns.
    """
    src_cols = df.columns
    # NULL weight = zero weight (a null-text doc costs nothing): without
    # the coalesce, one all-NULL bucket makes _bucket_w NULL and BOTH
    # admission filters evaluate to NULL, silently dropping the bucket —
    # the greedy contract (before < budget) admits zero-weight rows.
    q = df.withColumn("_bucket", bucket).withColumn(
        "_w", F.coalesce(weight, F.lit(0))
    )
    hist = q.groupBy("_bucket").agg(F.sum("_w").alias("_bucket_w"))
    w_desc = Window.orderBy(F.col("_bucket").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # the single-task window runs over the histogram, never the data
    hist = hist.withColumn(
        "_above", F.coalesce(F.sum("_bucket_w").over(w_desc), F.lit(0))
    )
    qa = q.join(F.broadcast(hist), "_bucket").withColumn("_budget", budget)
    # strict <: a zero-weight row sitting EXACTLY at the boundary has
    # before == budget and must be rejected (before < budget is the
    # admission rule) — with <=, whole-bucket admission would take it.
    # Buckets ending exactly at the budget go through the boundary
    # window instead, which applies the rule row-by-row.
    full = qa.filter(F.col("_above") + F.col("_bucket_w") < F.col("_budget"))
    boundary = qa.filter(
        (F.col("_above") < F.col("_budget"))
        & (F.col("_above") + F.col("_bucket_w") >= F.col("_budget"))
    )
    w_in = Window.partitionBy("_bucket").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    boundary = boundary.withColumn(
        "_before", F.coalesce(F.sum("_w").over(w_in), F.lit(0))
    ).filter(F.col("_above") + F.col("_before") < F.col("_budget"))
    return full.select(*src_cols).unionByName(boundary.select(*src_cols))


# -- DSIR importance scoring --------------------------------------------------

DSIR_BUCKETS_DEFAULT = 4096


def dsir_log_weights(
    docs: DataFrame,
    target_sources: tuple[str, ...],
    n_buckets: int = DSIR_BUCKETS_DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """DSIR hashed-bigram importance weights (Xie et al. 2023): per
    document, sum over its bigram occurrences of
    ``log10 p_target(bucket) - log10 p_raw(bucket)`` with Laplace
    smoothing, where buckets are ``md5_hash60(bigram) % n_buckets``
    (cross-engine exact) and the target distribution is fit on the
    documents whose ``source_col`` is in ``target_sources``.

    Returns (id_col, n_bigrams, logw[round 4]); documents with <2
    tokens (no bigrams) or no content produce no row. Scale shape: the
    explode feeds one per-(doc,bucket) partial aggregate; the model
    side is an ``n_buckets``-row table plus a 1-row total, both
    broadcast — nothing vocabulary- or corpus-sized joins. The source
    column rides in the GROUPING KEY (functionally dependent on
    id_col, so no extra rows) rather than through ``any_value`` —
    ``any_value``/``first`` forces a corpus-sized Sort+SortAggregate
    where the pure-key form stays a partial-combining HashAggregate
    (measured A/B at sf0.1: SortAggregate eliminated, ~8% faster;
    at 100 TB a corpus-wide sort is the difference that matters).
    tests/test_llm_ops11.py checks the math against a plain-Python
    reference on randomized corpora; d68's DuckDB oracle pins it
    cross-engine.
    """
    from kpipe_spark.functions.dedup import md5_hash60
    from kpipe_spark.functions.text import tokens

    content = F.col(text_col).isNotNull() & F.col(text_col).rlike(r"\S")
    # tokens projected ONCE per row: the inline form re-ran the
    # split+filter HOF per reference (two slices + the size — the
    # shingles_from_tokens lesson)
    t = F.col("_tk")
    n = F.size(t)
    bigrams = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = (
        docs.filter(content)
        .select(id_col, source_col, tokens(text_col).alias("_tk"))
        .select(id_col, source_col, F.explode(bigrams).alias("g"))
    )
    from kpipe_spark.util import materialize

    # materialized ONCE: cnt feeds three plan branches (the score
    # join plus the broadcast stats and total), and broadcast
    # exchanges cannot reuse a shuffle exchange, so without this
    # the corpus tokenize+explode+md5 runs 3x per call (measured
    # 1.7 s -> 0.48 s at sf0.1). doc_id-keyed = corpus-scaled, so the
    # strategy is injectable (util.set_materializer): a cluster
    # installs table_materializer and this becomes the stored
    # hashed-feature table production DSIR keeps anyway.
    cnt = materialize(
        bg.withColumn("bucket", md5_hash60(F.col("g")) % n_buckets)
        .groupBy(id_col, source_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c")),
        scale="corpus",
    )
    stats = cnt.groupBy("bucket").agg(
        F.sum("c").alias("cr"),
        F.coalesce(
            F.sum(
                F.when(F.col(source_col).isin(*target_sources), F.col("c"))
            ),
            F.lit(0),
        ).alias("ct"),
    )
    tot = stats.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    lr = F.log10((F.col("ct") + 1) / (F.col("nt") + n_buckets)) - F.log10(
        (F.col("cr") + 1) / (F.col("nr") + n_buckets)
    )
    return (
        cnt.join(F.broadcast(stats), "bucket")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.round(F.sum(F.col("c") * lr), 4).alias("logw"),
        )
    )
