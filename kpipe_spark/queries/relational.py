"""Relational operator inventory (SURVEY.md §2.4).

kpipe explicitly has no joins/windows/aggregations (reference
README.md:203-208); this module declares the engine's relational surface
as idiomatic Catalyst plans over the TPC-H-ish tables, each paired with
its DuckDB oracle SQL.

Conventions:
- dimension tables (region/nation/supplier/customer at test SF) get a
  ``broadcast()`` hint; fact-fact joins shuffle on their keys and rely
  on AQE for skew splitting,
- money-valued SUMs round to 2 decimals, AVGs to 4, in BOTH the Spark
  plan and the oracle (double summation order differs between engines),
- timestamps in output are formatted to strings so value hashing is
  engine-neutral,
- every LIMIT has a total deterministic ORDER BY underneath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kpipe_spark.catalog import load_tables
from kpipe_spark.queries import register

# --------------------------------------------------------------------------
# Aggregations over a single fact scan
# --------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_extendedprice), 4)                               AS avg_price,
           round(avg(l_discount), 4)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1-style pricing summary: filtered scan + 8-way agg "
    "(partial agg map-side, single shuffle on the 2 low-cardinality keys)",
    tags=("agg", "scan"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir).lineitem
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q06_revenue_forecast",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount >= 0.02 AND l_discount <= 0.06
      AND l_quantity < 24
    """,
    description="TPC-H Q6-style: pure pushed-down filter + global agg; the "
    "plan must show PushedFilters on the parquet scan",
    tags=("agg", "pushdown"),
)
def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir).lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q19_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS distinct_parts,
           count(DISTINCT l_suppkey) AS distinct_supps,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="multi distinct-agg (expand + two-phase agg under Catalyst)",
    tags=("agg", "distinct"),
)
def q19_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q27_conditional_agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS open_total,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS finished_total,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS pending_total,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    description="manual pivot via conditional aggregation (stays in one "
    "whole-stage-codegen agg, no extra shuffle per column)",
    tags=("agg", "case"),
)
def q27_conditional_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    def status_total(s: str):
        return F.round(
            F.sum(F.when(F.col("o_orderstatus") == s, F.col("o_totalprice")).otherwise(0.0)), 2
        )
    return o.groupBy("o_orderpriority").agg(
        status_total("O").alias("open_total"),
        status_total("F").alias("finished_total"),
        status_total("P").alias("pending_total"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q26_having_filter",
    oracle="""
    SELECT c_nationkey, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    GROUP BY c_nationkey
    HAVING count(*) >= 3 AND sum(c_acctbal) > 0
    """,
    description="group-by + HAVING (post-aggregation filter)",
    tags=("agg", "having"),
)
def q26_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir).customer
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("c_acctbal").alias("_raw_bal"),
        )
        .filter((F.col("n_customers") >= 3) & (F.col("_raw_bal") > 0))
        .select(
            "c_nationkey",
            "n_customers",
            F.round(F.col("_raw_bal"), 2).alias("total_bal"),
        )
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@register(
    "q02_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    description="flagship: fact-fact shuffle join (lineitem⋈orders) then "
    "broadcast dims (customer at test SF, nation always); group by nation",
    tags=("join", "agg", "flagship"),
)
def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q03_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
    description="TPC-H Q3-style: selective join + top-10 by aggregated "
    "revenue (TakeOrderedAndProject, no full sort)",
    tags=("join", "agg", "topk"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        F.broadcast(t.customer.filter(F.col("c_mktsegment") == "BUILDING"))
        .join(t.orders.filter(F.col("o_orderdate") < cutoff),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(t.lineitem.filter(F.col("l_shipdate") > cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("orderkey", "revenue", "orderdate", "orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    description="TPC-H Q4-style: LEFT SEMI join (EXISTS) then count by "
    "priority",
    tags=("join", "semi"),
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        o.join(
            t.lineitem,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q05_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    description="TPC-H Q5-style: 6-table join, theta condition "
    "(c_nationkey = s_nationkey) folded into the supplier join",
    tags=("join", "agg"),
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.customer.join(
            t.orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t.supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q07_join_left_outer",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           count(o.o_orderkey) AS order_count,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    description="left outer join preserving customers with zero orders",
    tags=("join", "outer"),
)
def q07_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@register(
    "q08_join_anti",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    description="LEFT ANTI join: customers with no URGENT order",
    tags=("join", "anti"),
)
def q08_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.customer.join(
        t.orders.filter(F.col("o_orderpriority") == "1-URGENT"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    ).select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))


@register(
    "q09_join_semi",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
    )
    """,
    description="LEFT SEMI join: customers with at least one big order",
    tags=("join", "semi"),
)
def q09_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.customer.join(
        t.orders.filter(F.col("o_totalprice") > 100000),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_semi",
    ).select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))


@register(
    "q10_join_full_outer",
    oracle="""
    WITH cn AS (
      SELECT c_nationkey AS nk, count(*) AS num_customers FROM customer GROUP BY c_nationkey
    ), sn AS (
      SELECT s_nationkey AS nk, count(*) AS num_suppliers FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           coalesce(cn.num_customers, 0) AS num_customers,
           coalesce(sn.num_suppliers, 0) AS num_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    description="full outer join of two pre-aggregated sides",
    tags=("join", "outer"),
)
def q10_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cn = t.customer.groupBy(F.col("c_nationkey").alias("cnk")).agg(
        F.count(F.lit(1)).alias("num_customers")
    )
    sn = t.supplier.groupBy(F.col("s_nationkey").alias("snk")).agg(
        F.count(F.lit(1)).alias("num_suppliers")
    )
    return cn.join(sn, F.col("cnk") == F.col("snk"), "full_outer").select(
        F.coalesce(F.col("cnk"), F.col("snk")).alias("nationkey"),
        F.coalesce(F.col("num_customers"), F.lit(0)).alias("num_customers"),
        F.coalesce(F.col("num_suppliers"), F.lit(0)).alias("num_suppliers"),
    )


@register(
    "q28_range_join",
    oracle="""
    SELECT p.p_partkey AS partkey, count(*) AS n_matches
    FROM part p
    JOIN lineitem l
      ON l.l_partkey = p.p_partkey
     AND l.l_quantity BETWEEN p.p_size - 2 AND p.p_size + 2
    GROUP BY p.p_partkey
    """,
    description="range/theta join: equi key plus a BETWEEN band condition "
    "(Catalyst keeps the equi part hashable, band as post-filter)",
    tags=("join", "range"),
)
def q28_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        F.broadcast(t.part)
        .join(
            t.lineitem,
            (F.col("l_partkey") == F.col("p_partkey"))
            & (F.col("l_quantity") >= F.col("p_size") - 2)
            & (F.col("l_quantity") <= F.col("p_size") + 2),
        )
        .groupBy(F.col("p_partkey").alias("partkey"))
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@register(
    "q11_window_topk_per_customer",
    oracle="""
    SELECT custkey, orderkey, totalprice, rn FROM (
      SELECT o_custkey AS custkey, o_orderkey AS orderkey,
             round(o_totalprice, 2) AS totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    description="top-k per group via row_number window (single shuffle on "
    "the partition key; no global sort)",
    tags=("window", "topk"),
)
def q11_window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q12_window_running_total",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total,
           round(lag(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
           round(lead(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS next_price
    FROM orders
    """,
    description="analytic windows: running sum + lag/lead over an explicit "
    "ROWS frame",
    tags=("window",),
)
def q12_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.sum("o_totalprice").over(wr), 2).alias("running_total"),
        F.round(F.lag("o_totalprice").over(wo), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(wo), 2).alias("next_price"),
    )


@register(
    "q13_window_rank",
    oracle="""
    SELECT p_partkey AS partkey, p_brand AS brand, p_size AS size,
           rank()       OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS rnk,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS drnk
    FROM part
    """,
    description="rank vs dense_rank with genuine ties (p_size)",
    tags=("window", "rank"),
)
def q13_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir).part
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_brand").alias("brand"),
        F.col("p_size").alias("size"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube
# --------------------------------------------------------------------------


@register(
    "q14_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    description="ROLLUP hierarchy totals (Catalyst Expand, one shuffle)",
    tags=("agg", "rollup"),
)
def q14_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir).lineitem
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q15_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    description="CUBE over two dims",
    tags=("agg", "cube"),
)
def q15_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "q25_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS total_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    description="explicit GROUPING SETS (disjoint single-key sets)",
    tags=("agg", "grouping-sets"),
)
def q25_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    t.lineitem.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS total_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


@register(
    "q16_union",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    """,
    description="UNION (distinct) of two key sets",
    tags=("setop",),
)
def q16_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t.orders.select(F.col("o_custkey").alias("custkey"))
    b = t.customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@register(
    "q17_intersect",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    """,
    description="INTERSECT of two key sets",
    tags=("setop",),
)
def q17_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t.orders.select(F.col("o_custkey").alias("custkey"))
    b = t.customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    return a.intersect(b)


@register(
    "q18_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 280000
    """,
    description="EXCEPT: customers minus those with orders",
    tags=("setop",),
)
def q18_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t.customer.select(F.col("c_custkey").alias("custkey"))
    b = t.orders.filter(F.col("o_totalprice") > 280000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b).distinct()


# --------------------------------------------------------------------------
# Sorts / limits / top-k
# --------------------------------------------------------------------------


@register(
    "q24_topk_orders",
    oracle="""
    SELECT o_orderkey AS orderkey, o_custkey AS custkey,
           round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    description="global top-k (TakeOrderedAndProject: per-partition heap + "
    "driver merge, never a full sort)",
    tags=("sort", "topk"),
)
def q24_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


# --------------------------------------------------------------------------
# Scalar functions (string / date / math / json / array)
# --------------------------------------------------------------------------


@register(
    "q20_scalar_string_math",
    oracle="""
    SELECT p_partkey AS partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           substr(p_name, 1, 5) AS name_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           p_size % 7 AS size_mod,
           abs(p_size - 25) AS size_dist,
           round(sqrt(p_retailprice), 4) AS price_sqrt,
           round(ln(p_retailprice + 1), 4) AS price_ln
    FROM part
    """,
    description="scalar string + math function battery, pure projection "
    "(one codegen stage, zero shuffles)",
    tags=("scalar",),
)
def q20_scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir).part
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.round(F.sqrt("p_retailprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1), 4).alias("price_ln"),
    )


@register(
    "q21_date_functions",
    oracle="""
    SELECT year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY year(o_orderdate), month(o_orderdate)
    """,
    description="date part extraction + agg by (year, month)",
    tags=("scalar", "date"),
)
def q21_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    return o.groupBy(
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "q23_json_extract",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    description="JSON scalar extraction from the events props payload "
    "(kpipe's schema-less JSON Map surface, JsonFormat.java:27-32)",
    tags=("scalar", "json"),
)
def q23_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q29_string_agg",
    oracle="""
    SELECT s_nationkey AS nationkey,
           string_agg(s_name, ',' ORDER BY s_name) AS supplier_csv,
           count(*) AS n_suppliers
    FROM supplier
    GROUP BY s_nationkey
    """,
    description="ordered string aggregation (collect_list + array_sort + "
    "array_join on the Spark side)",
    tags=("agg", "string"),
)
def q29_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_tables(spark, sf_dir).supplier
    return s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
            "supplier_csv"
        ),
        F.count(F.lit(1)).alias("n_suppliers"),
    )


# --------------------------------------------------------------------------
# Events (time-series over the Kafka-shaped table)
# --------------------------------------------------------------------------


@register(
    "q22_events_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    description="tumbling 1h aggregation in batch form (streaming analogue: "
    "window(ts, '1 hour') + watermark, see kpipe_spark.streaming)",
    tags=("events", "window-time"),
)
def q22_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    return e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_ts"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "q30_events_top_users",
    oracle="""
    SELECT user_id, round(sum(value), 2) AS purchase_total, count(*) AS n_purchases
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    ORDER BY purchase_total DESC, user_id
    LIMIT 10
    """,
    description="filtered top-k users by aggregate",
    tags=("events", "topk"),
)
def q30_events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.round(F.sum("value"), 2).alias("purchase_total"),
            F.count(F.lit(1)).alias("n_purchases"),
        )
        .orderBy(F.col("purchase_total").desc(), F.col("user_id"))
        .limit(10)
    )
