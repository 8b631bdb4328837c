"""Relational inventory, part 5: the remaining TPC-H classic shapes the
trimmed test schema supports (no partsupp table, no commit/receipt
dates, so Q2/Q9/Q11/Q16/Q20 are out of reach and Q12/Q21 are adapted to
shipdate-vs-orderdate lateness).

Covered here: Q13 (outer-join count distribution), Q14 (promo revenue
ratio), Q17 (correlated per-key average threshold), Q19 (disjunctive
predicate join), Q21 (multi-exists "only late supplier"), Q8 (market
share ratio per year).

Determinism rule for money sums: cast the addend to DECIMAL(18,4) on
BOTH sides before SUM so the aggregate is exact and order-independent
(double summation order differs between Spark partial aggs and DuckDB).

Scale notes per query; common rules: part/supplier/nation/region
broadcast, lineitem-side aggregates are map-side-combined shuffles on
their natural keys, AQE reuses the l_orderkey exchange where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kpipe_spark.catalog import load_tables
from kpipe_spark.queries import register


@register(
    "q58_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey AS c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    description="TPC-H Q13 shape: customers-per-order-count histogram via "
    "a left outer join with an ON-clause (not WHERE) filter, then two "
    "cascaded aggregations. Scale: join shuffles on custkey; the first "
    "agg reuses that partitioning (no extra exchange); the second agg's "
    "domain is tiny (distinct order counts) so its shuffle is trivial.",
    tags=("join", "outer", "agg"),
)
def q58_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    per_cust = (
        t.customer.join(
            t.orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q59_promo_revenue",
    oracle="""
    SELECT CAST(round(
             100.00 * sum(CASE WHEN p_type = 'PROMO'
                          THEN CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,4)) ELSE 0 END)
             / sum(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(18,4))), 4) AS DOUBLE) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    description="TPC-H Q14 shape: conditional-revenue ratio over a "
    "fact-to-dim equi-join in one date window. Scale: part broadcasts "
    "(filter+project first), shipdate predicate pushes to the parquet "
    "scan, single global agg of two partial sums — no wide shuffle.",
    tags=("join", "agg", "broadcast"),
)
def q59_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(F.broadcast(t.part.select("p_partkey", "p_type")),
                F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0)))
                / F.sum(vol),
                4,
            )
            .cast("double")
            .alias("promo_revenue")
        )
    )


@register(
    "q60_small_quantity_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))) / 7.0, 2)
           AS DOUBLE) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#23'
      AND l_quantity < (
            SELECT 0.2 * avg(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = p_partkey
          )
    """,
    description="TPC-H Q17 shape: correlated per-partkey average "
    "threshold. Spark plan: per-part thresholds computed once "
    "(groupBy(l_partkey).avg — map-side combined), restricted to the "
    "brand's parts via a broadcast semi-join BEFORE the heavy agg, then "
    "broadcast back onto lineitem. At 100 TB the threshold table is "
    "|parts-in-brand| rows — tiny — so both joins broadcast; lineitem "
    "is scanned twice but never shuffled.",
    tags=("join", "subquery", "agg", "broadcast"),
)
def q60_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    brand_parts = t.part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    thresholds = (
        t.lineitem.join(
            F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
        )
        .groupBy("l_partkey")
        .agg((0.2 * F.avg("l_quantity")).alias("qty_threshold"))
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    return (
        t.lineitem.join(
            F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey")
        )
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) / 7.0, 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q61_disjunctive_part_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ( (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 21)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35
             AND l_quantity BETWEEN 20 AND 40) )
    """,
    description="TPC-H Q19 shape: disjunctive (OR-of-ANDs) predicate "
    "mixing join-side and fact-side columns. Catalyst extracts the "
    "common p_partkey = l_partkey equi-key so this stays a broadcast "
    "hash join (NOT a cartesian/BNL) with the disjunction evaluated as "
    "a post-join filter; the l_quantity bounds (1..40 overall) are "
    "CNF-extracted and pushed to the lineitem scan.",
    tags=("join", "filter", "broadcast"),
)
def q61_disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    joined = t.lineitem.join(
        F.broadcast(t.part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return joined.filter(
        arm("Brand#15", 15, 1, 21)
        | arm("Brand#23", 25, 10, 30)
        | arm("Brand#19", 35, 20, 40)
    ).agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )


@register(
    "q62_waiting_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
            SELECT * FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
      AND NOT EXISTS (
            SELECT * FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_7'
    GROUP BY s_name
    """,
    description="TPC-H Q21 shape (lateness = shipped >60 days after "
    "order date since the trimmed schema lacks commit/receipt dates): "
    "multi-supplier 'F' orders where exactly one supplier was late. "
    "The correlated EXISTS / NOT EXISTS pair is decorrelated into one "
    "per-order aggregate — countDistinct(supplier) >= 2 AND "
    "countDistinct(late supplier) == 1 — computed on the SAME "
    "l_orderkey shuffle as the join, so the whole query is one "
    "exchange over lineitem plus broadcasts (orders-F projected to two "
    "columns; supplier+nation tiny). No repeated correlated scans.",
    tags=("join", "subquery", "agg", "decorrelate"),
)
def q62_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ord_f = t.orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        ord_f, F.col("l_orderkey") == F.col("o_orderkey")
    )
    late = F.col("l_shipdate") > F.date_add(
        F.col("o_orderdate").cast("date"), 60
    ).cast("timestamp")
    flagged = li.withColumn("is_late", late)
    # Per-order distinct-supplier counts as WINDOWS over the same
    # l_orderkey shuffle that already carries the rows, instead of a
    # groupBy + left-semi back onto a second `flagged` subtree: the
    # self-referencing shape planned lineitem TWICE (two scans, two
    # exchanges, a sort-merge semi-join); this shape scans it once
    # with one exchange. collect_set skips nulls exactly as
    # countDistinct(when(...)) does, so the counts — and the rows the
    # filter keeps — are identical.
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_orderkey")
    culprit_rows = (
        flagged.withColumn(
            "_nsupp", F.size(F.collect_set("l_suppkey").over(w))
        )
        .withColumn(
            "_nlate_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(
            F.col("is_late")
            & (F.col("_nsupp") >= 2)
            & (F.col("_nlate_supp") == 1)
        )
    )
    supp = t.supplier.join(
        F.broadcast(t.nation.filter(F.col("n_name") == "NATION_7")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        culprit_rows.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q63_market_share",
    oracle="""
    SELECT o_year,
           CAST(round(
             sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 4) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(CAST(o_orderdate AS DATE)) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
               AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer,
           nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        AND s_nationkey = n2.n_nationkey
        AND p_type = 'ECONOMY'
    )
    GROUP BY o_year
    """,
    description="TPC-H Q8 shape: one nation's share of regional revenue "
    "per year — an 8-table join tree. Scale: the only big-big join is "
    "lineitem-orders (shuffle on orderkey); part (filtered to one "
    "type), supplier, customer, nation x2, region all broadcast, so "
    "the plan is one exchange plus a chain of broadcast hash joins, "
    "then a tiny per-year agg of decimal sums.",
    tags=("join", "agg", "broadcast"),
)
def q63_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust_region = (
        t.customer.join(
            F.broadcast(
                t.nation.join(
                    F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select(F.col("n_nationkey").alias("cn_nationkey"))
            ),
            F.col("c_nationkey") == F.col("cn_nationkey"),
        )
    ).select("c_custkey")
    supp_nation = t.supplier.join(
        F.broadcast(t.nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    econ_parts = t.part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    joined = (
        t.lineitem.join(
            F.broadcast(econ_parts), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"),
              "left_semi")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        joined.select(
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                        F.lit(0)
                    )
                )
                / F.sum("volume"),
                4,
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


@register(
    "q64_returned_item_revenue",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC
    LIMIT 20
    """,
    description="TPC-H Q10 shape: top-20 customers by lost revenue from "
    "returned items in one quarter. Scale: returnflag + orderdate "
    "predicates push to both scans; orders-lineitem shuffles on "
    "orderkey; customer+nation broadcast; the ORDER BY .. LIMIT 20 "
    "compiles to TakeOrderedAndProject (per-partition top-20, no "
    "global sort). Ties below rank 20 are impossible in practice at "
    "4-decimal revenue, and the driver compare is order-insensitive.",
    tags=("join", "agg", "topk", "broadcast"),
)
def q64_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ord_q = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    return (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .join(ord_q, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc())
        .limit(20)
    )


@register(
    "q65_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    description="TPC-H Q15 shape: supplier(s) with the quarter's maximum "
    "revenue — the view + global-scalar-subquery pattern. Spark plan: "
    "the revenue aggregate is computed once and the global max is an "
    "unpartitioned window over that supplier-sized frame (the "
    "broadcast-scalar form planned the revenue subtree and its "
    "lineitem scan twice); supplier broadcasts. At 100 TB the only "
    "heavy stage is the suppkey aggregate over the date-pruned "
    "lineitem scan.",
    tags=("join", "subquery", "agg", "broadcast"),
)
def q65_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    revenue = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    # Global max as an UNPARTITIONED window over the aggregated frame:
    # the scalar-subquery form (revenue.agg(max) broadcast back onto
    # revenue) planned the revenue subtree — and its lineitem scan —
    # TWICE; the window computes it on the one copy. The window's
    # single partition holds |suppliers-with-revenue| rows (supplier-
    # order, never corpus-order), and max over identical doubles keeps
    # exactly the same tie set.
    from pyspark.sql.window import Window

    w_all = Window.partitionBy()
    return (
        revenue.withColumn("max_revenue", F.max("total_revenue").over(w_all))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(t.supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q66_stat_aggregates",
    oracle="""
    SELECT l_returnflag,
           CAST(0.0 + round(stddev_samp(l_quantity), 4) AS DOUBLE) AS qty_stddev,
           CAST(0.0 + round(var_pop(l_quantity), 4) AS DOUBLE) AS qty_varpop,
           CAST(0.0 + round(corr(l_quantity, l_extendedprice), 6) AS DOUBLE)
             AS qty_price_corr,
           CAST(0.0 + round(covar_samp(l_discount, l_tax), 6) AS DOUBLE)
             AS disc_tax_covar,
           CAST(0.0 + round(regr_slope(l_extendedprice, l_quantity), 4) AS DOUBLE)
             AS price_per_qty_slope,
           CAST(0.0 + round(regr_intercept(l_extendedprice, l_quantity), 4)
                AS DOUBLE) AS price_intercept
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="Statistical aggregate family: stddev/variance, "
    "correlation, covariance and linear-regression slope/intercept per "
    "return flag (skewness/kurtosis excluded deliberately — Spark uses "
    "population moments, DuckDB sample-corrected, so they are not "
    "cross-engine comparable). Scale: all are single-pass moment "
    "aggregates with map-side partial merge — one tiny shuffle on a "
    "3-value group key; no row ever leaves its scan partition "
    "unaggregated.",
    tags=("agg", "stats"),
)
def q66_stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        (F.round(F.stddev_samp("l_quantity"), 4) + 0.0).cast("double").alias("qty_stddev"),
        (F.round(F.var_pop("l_quantity"), 4) + 0.0).cast("double").alias("qty_varpop"),
        (F.round(F.corr("l_quantity", "l_extendedprice"), 6) + 0.0)
        .cast("double")
        .alias("qty_price_corr"),
        (F.round(F.covar_samp("l_discount", "l_tax"), 6) + 0.0)
        .cast("double")
        .alias("disc_tax_covar"),
        (F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4) + 0.0)
        .cast("double")
        .alias("price_per_qty_slope"),
        (F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4) + 0.0)
        .cast("double")
        .alias("price_intercept"),
    )


@register(
    "q67_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    isl AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp, count(*) AS len
      FROM isl GROUP BY user_id, grp
    )
    SELECT user_id, count(*) AS n_streaks, max(len) AS longest_streak
    FROM streaks
    GROUP BY user_id
    """,
    description="Gaps-and-islands: per-user consecutive-active-day "
    "streaks via the date-minus-row_number grouping trick. Scale: the "
    "(user, day) distinct is map-side-combined; the window, both "
    "aggregations, and the final rollup all share the user_id hash "
    "partitioning, so after the first exchange everything is "
    "partition-local — no global sort anywhere.",
    tags=("window", "agg", "events"),
)
def q67_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    days = (
        t.events.select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("grp", F.date_sub("d", F.row_number().over(w)))
    streaks = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak"),
    )


@register(
    "q68_argmax_aggregates",
    oracle="""
    SELECT n_name,
           max_by(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 100000000
                          + c_custkey) AS richest_customer,
           min_by(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 100000000
                          + c_custkey) AS poorest_customer,
           CAST(count_if(c_acctbal > 5000) AS BIGINT) AS n_above_5k
    FROM customer, nation
    WHERE c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    description="Argmax aggregate family: max_by / min_by / count_if "
    "per nation. The ordering key encodes (acctbal cents, custkey) in "
    "one bigint so ties are deterministic on BOTH engines — bare "
    "max_by(x, acctbal) picks an arbitrary row under ties, which the "
    "driver's value-hash would flag. Scale: single-pass map-side "
    "combinable aggregates over a broadcast dim join; the argmax "
    "partial state is one (key, value) pair per group per partition.",
    tags=("agg", "argmax", "broadcast"),
)
def q68_argmax_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    key = (
        F.round(F.col("c_acctbal") * 100).cast("bigint") * F.lit(100000000)
        + F.col("c_custkey")
    )
    return (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .agg(
            F.max_by("c_name", key).alias("richest_customer"),
            F.min_by("c_name", key).alias("poorest_customer"),
            F.count_if(F.col("c_acctbal") > 5000).alias("n_above_5k"),
        )
    )


@register(
    "q69_lateral_topk",
    oracle="""
    SELECT n_name, top.c_name, top.c_acctbal
    FROM nation,
    LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) AS top
    """,
    description="Correlated LATERAL subquery with per-row ORDER BY + "
    "LIMIT: top-2 customers per nation (tie-broken by custkey so both "
    "engines agree). Spark decorrelates the lateral into a "
    "rank-window over the child — the same physical plan as the "
    "row_number() <= k idiom (q11), i.e. one hash partition on the "
    "correlation key, per-partition top-k heaps, no per-outer-row "
    "rescan of customer.",
    tags=("join", "subquery", "lateral", "topk"),
)
def q69_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    t.nation.createOrReplaceTempView("_q69_nation")
    t.customer.createOrReplaceTempView("_q69_customer")
    return spark.sql(
        """
        SELECT n_name, top.c_name, top.c_acctbal
        FROM _q69_nation,
        LATERAL (
          SELECT c_name, c_acctbal FROM _q69_customer
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) AS top
        """
    )
