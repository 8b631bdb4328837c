"""Relational inventory, part 4: TPC-H-classic join/subquery shapes the
earlier parts didn't cover (Q18 large-volume IN-over-having, Q7
dual-dimension nation pairs, Q22 NOT EXISTS + global scalar), plus the
exact-median/mode and FILTER-clause aggregate families.

All Spark built-ins with DuckDB oracles. Scale notes are per-query; the
common rule: dimension sides broadcast, fact-side aggregations are
map-side-combined shuffles on their group keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kpipe_spark.catalog import load_tables
from kpipe_spark.queries import register


@register(
    "q53_large_volume_orders",
    oracle="""
    SELECT c_name, o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 150
          )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    """,
    description="TPC-H Q18 shape: IN over a grouped-HAVING subquery on "
    "the fact table itself. The qualifying-orders condition is a "
    "window sum over the SAME l_orderkey shuffle the orders join "
    "needs anyway — the groupBy + semi-join-back form planned "
    "lineitem twice (subquery and outer branch plan independently); "
    "this shape scans it once with one exchange.",
    tags=("join", "subquery", "agg"),
)
def q53_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    # The qualifying-orders HAVING as a WINDOW over the same l_orderkey
    # shuffle the orders join needs anyway: the groupBy + semi-join-back
    # form planned lineitem TWICE (the subquery branch and the outer
    # scan plan independently). sum(l_quantity) is exact under any
    # order (integer-valued doubles, 1-50), so the window total equals
    # the groupBy total bit-for-bit and the same rows qualify.
    w = Window.partitionBy("l_orderkey")
    return (
        t.lineitem.withColumn("_oq", F.sum("l_quantity").over(w))
        .filter(F.col("_oq") > 150)
        .drop("_oq")
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


@register(
    "q54_nation_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(round(sum(CAST(volume AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(CAST(l_shipdate AS DATE)) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND n1.n_name <> n2.n_name
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H Q7 shape: cross-border trade volume by "
    "(supplier-nation, customer-nation, year). Both nation dims and "
    "supplier broadcast; the only big shuffle is lineitem><orders on "
    "orderkey, then one map-side-combined agg on a 25x25xYears key "
    "space — skew-free by construction",
    tags=("join", "agg", "multi-dim"),
)
def q54_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).alias("l_year"),
        )
        .agg(
            # decimal-sum: FP double addition is order-sensitive and a
            # 4188-group result WILL flip a cent vs any other engine;
            # per-row double->decimal(18,4) is deterministic, and the
            # decimal sum is exact, so the result is engine-independent
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
    )


@register(
    "q55_inactive_rich_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_cust,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 350000.0)
    GROUP BY c_mktsegment
    """,
    description="TPC-H Q22 shape: above-average-balance customers with "
    "no high-value orders (global scalar subquery + NOT EXISTS with a "
    "correlated filter). The "
    "scalar avg is a 1-row broadcast; the anti-join shuffles only "
    "custkeys; Catalyst decorrelates NOT EXISTS to left-anti",
    tags=("subquery", "anti-join", "agg"),
)
def q55_inactive_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    t.customer.createOrReplaceTempView("_q55_customer")
    t.orders.createOrReplaceTempView("_q55_orders")
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_cust,
               round(sum(c_acctbal), 2) AS total_bal
        FROM _q55_customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM _q55_customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM _q55_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 350000.0)
        GROUP BY c_mktsegment
        """
    )


@register(
    "q56_exact_median",
    oracle="""
    SELECT o_orderpriority,
           round(median(o_totalprice), 2) AS med_price,
           round(avg(o_totalprice), 2) AS avg_price,
           count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
    description="exact median (interpolated percentile-0.5) per group — "
    "the exact counterpart of q33's approx percentiles; Spark computes "
    "it with a per-group sort inside ObjectHashAggregate, no extra "
    "shuffle beyond the group-by",
    tags=("agg", "percentile"),
)
def q56_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    return o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 2).alias("med_price"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q57_filtered_aggregates",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           bool_or(l_quantity = 50.0) AS has_max_qty,
           bool_and(l_extendedprice > 0.0) AS all_positive,
           round(avg(l_extendedprice) FILTER (WHERE l_tax = 0.0), 2)
             AS avg_untaxed,
           round(max(l_extendedprice * (1 - l_discount))
                 FILTER (WHERE l_shipdate >= '1995-01-01'), 2)
             AS max_recent_net
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="FILTER-clause aggregate family (count_if / bool_or / "
    "bool_and / conditional avg+max): many conditional aggregates in "
    "ONE pass over the fact table — the alternative to N self-joins; "
    "all partial-aggregated map-side",
    tags=("agg", "conditional"),
)
def q57_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir).lineitem
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.bool_or(F.col("l_quantity") == 50.0).alias("has_max_qty"),
        F.bool_and(F.col("l_extendedprice") > 0.0).alias("all_positive"),
        F.round(
            F.avg(F.when(F.col("l_tax") == 0.0, F.col("l_extendedprice"))), 2
        ).alias("avg_untaxed"),
        F.round(
            F.max(F.when(F.col("l_shipdate") >= "1995-01-01", net)), 2
        ).alias("max_recent_net"),
    )
