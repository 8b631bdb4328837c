"""Relational inventory, part 7: the last classic TPC-H shapes whose
originals need the ``partsupp`` table (absent from the driver schema),
adapted to the available tables — Q9 (profit by nation/year), Q11
(important-value parts via a global scalar threshold), Q16 (supplier
counts per part attribute with a NOT-IN exclusion), Q2 (best supplier
per part via a correlated max), and Q20 (excess-share shippers via a
correlated HAVING).

Reference parity: kpipe has no relational surface (reference
README.md:190-191, 203-208); these are §2.4 engine queries mandated by
SURVEY.md, all Spark built-ins, all DuckDB-oracle-checked.

Scale notes. ``part``/``supplier``/``nation``/``region`` are dimension
tables (part ~2M rows at sf100 — still broadcastable at the default
10MB threshold after pruning to 2-3 columns; marked explicitly). The
fact scans (`lineitem`, `orders`) shuffle at most once on their join
key; every per-part or per-supplier aggregate is hash-partitioned on a
well-spread key so 1000× the data is 1000× the partitions, never a
bigger single partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kpipe_spark.catalog import load_tables
from kpipe_spark.queries import register
from kpipe_spark.util import ieee_round


@register(
    "q80_nation_profit",
    oracle="""
    SELECT n_name AS nation,
           year(o_orderdate) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit
    FROM lineitem, part, supplier, nation, orders
    WHERE l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND l_orderkey = o_orderkey
      AND p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    """,
    description="TPC-H Q9 shape (product-type profit by nation and "
    "year) with 0.6*p_retailprice*l_quantity standing in for the "
    "missing ps_supplycost. Scale: part and supplier prune to 2 "
    "columns and broadcast; the only shuffle is lineitem⋈orders on "
    "orderkey; the final agg domain is |nation|×|year| (tiny).",
    tags=("join", "agg", "tpch"),
)
def q80_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    part = t.part.filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    supp = t.supplier.select("s_suppkey", "s_nationkey")
    return (
        t.lineitem.select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            t.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                2,
            ).alias("sum_profit")
        )
    )


@register(
    "q81_important_parts",
    oracle="""
    WITH asia_value AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(1 - l_discount AS DECIMAL(18,2))) AS value_dec
        FROM lineitem, supplier, nation, region
        WHERE l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
        GROUP BY l_partkey
    ), tot AS (
        SELECT sum(value_dec) AS t, count(*) AS n FROM asia_value
    )
    SELECT l_partkey AS part_key,
           floor(CAST(value_dec AS DOUBLE) * 100.0 + 0.5) / 100.0
             AS part_value
    FROM asia_value, tot
    WHERE value_dec * 2 * n > t * 3
    """,
    description="TPC-H Q11 shape (parts whose value exceeds a global "
    "threshold; scalar subquery) adapted to shipped revenue through "
    "ASIA-region suppliers. The threshold is 1.5× the mean per-part "
    "value — scale-invariant, so the query selects a proper subset at "
    "every sf (TPC-H's fixed fraction degenerates to 0 rows as |part| "
    "grows). Scale: supplier⋈nation⋈region broadcast onto the lineitem "
    "scan; one shuffle on l_partkey; the global (sum, count) are "
    "unpartitioned windows over the per-part frame (|part| rows) — "
    "the scalar-subquery form re-planned the whole subtree including "
    "a second lineitem scan.",
    tags=("agg", "subquery", "tpch"),
)
def q81_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    asia_supp = (
        t.supplier.select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    # exact-decimal revenue (price and discount sit on 2-decimal grids,
    # so the product is 4-decimal-exact): the per-part sums and the
    # global threshold are bit-identical across engines AND across runs
    # — float sums vary with task-scheduling order, and a part exactly
    # at the threshold would flip in/out run-to-run
    per_part = (
        t.lineitem.select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount")).cast("decimal(18,2)")
            ).alias("value_dec")
        )
    )
    # Global (sum, count) as UNPARTITIONED windows over the per-part
    # frame: the scalar-subquery form (per_part.agg broadcast back)
    # planned the per_part subtree — and its lineitem scan — twice.
    # The single window partition holds |parts| rows, and the decimal
    # sum is exact under any accumulation order, so the threshold is
    # bit-identical to the re-aggregated one.
    from pyspark.sql.window import Window

    w_all = Window.partitionBy()
    return (
        per_part.withColumn("t", F.sum("value_dec").over(w_all))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        # value > 1.5 * (t/n)  <=>  2*value*n > 3*t, all exact decimal
        .filter(F.col("value_dec") * 2 * F.col("n") > F.col("t") * 3)
        .select(
            F.col("l_partkey").alias("part_key"),
            # ieee_round on the exact value: half-way .xx5 revenue sums
            # otherwise round differently per engine at larger sf
            ieee_round(F.col("value_dec").cast("double"), 2).alias("part_value"),
        )
    )


@register(
    "q82_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part, lineitem
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#13'
      AND p_size IN (1, 9, 16, 24, 29, 45)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
      )
    GROUP BY p_brand, p_type, p_size
    """,
    description="TPC-H Q16 shape (distinct supplier count per part "
    "attribute, excluding a supplier blacklist via NOT IN) with the "
    "low-acctbal supplier set standing in for the complaints filter. "
    "Scale: the part filter prunes+broadcasts; the blacklist is a "
    "broadcast anti-join (NOT IN on a non-null key ≡ anti-join); one "
    "shuffle for the distinct-agg on the grouping key.",
    tags=("join", "agg", "subquery", "tpch"),
)
def q82_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    part = t.part.filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 9, 16, 24, 29, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = t.supplier.filter(F.col("s_acctbal") < 1000).select("s_suppkey")
    return (
        t.lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q83_best_supplier_per_part",
    oracle="""
    SELECT DISTINCT p.p_partkey AS part_key, p.p_name, s.s_name, s.s_acctbal
    FROM part p, supplier s, lineitem l
    WHERE p.p_partkey = l.l_partkey
      AND s.s_suppkey = l.l_suppkey
      AND p.p_type = 'ECONOMY'
      AND p.p_size < 20
      AND s.s_acctbal = (
          SELECT max(s2.s_acctbal)
          FROM supplier s2, lineitem l2
          WHERE l2.l_partkey = p.p_partkey
            AND l2.l_suppkey = s2.s_suppkey
      )
    """,
    description="TPC-H Q2 shape (per-part best supplier via a "
    "correlated max; s_acctbal standing in for min ps_supplycost). "
    "Spark decorrelates by hand: distinct (part,supplier) pairs → "
    "per-part max acctbal as a WINDOW over the pairs frame → equality "
    "filter, exactly the oracle's tie semantics (the groupBy + "
    "join-back form planned the pairs subtree twice). Scale: one "
    "pre-projected 2-column lineitem scan, the distinct shuffle, and "
    "a pairs-sized window exchange; supplier and part broadcast; no "
    "correlated per-row execution anywhere.",
    tags=("join", "subquery", "agg", "tpch"),
)
def q83_best_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    part = t.part.filter(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") < 20)
    ).select(F.col("p_partkey"), F.col("p_name"))
    supp = t.supplier.select("s_suppkey", "s_name", "s_acctbal")
    # distinct supplier-per-part pairs over the whole lineitem history
    pairs = (
        t.lineitem.select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    # Per-part max as a WINDOW over the pairs frame: the groupBy +
    # equality-join-back form planned the pairs subtree — lineitem
    # scan, distinct shuffle, supplier broadcast — TWICE. The window's
    # equality filter keeps exactly the join's tie set (max over the
    # same doubles).
    from pyspark.sql.window import Window

    w_part = Window.partitionBy("l_partkey")
    return (
        pairs.withColumn("_best", F.max("s_acctbal").over(w_part))
        .filter(F.col("s_acctbal") == F.col("_best"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("p_partkey").alias("part_key"),
            "p_name",
            "s_name",
            "s_acctbal",
        )
        .distinct()
    )


@register(
    "q84_excess_share_shippers",
    oracle="""
    SELECT DISTINCT s_name, s_acctbal
    FROM supplier, nation, region
    WHERE s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND s_suppkey IN (
          SELECT l1.l_suppkey
          FROM lineitem l1, part
          WHERE l1.l_partkey = p_partkey
            AND p_name LIKE 'large%'
            AND l1.l_shipdate >= TIMESTAMP '1996-01-01'
            AND l1.l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY l1.l_suppkey, l1.l_partkey
          HAVING sum(l1.l_quantity) > 0.3 * (
              SELECT sum(l2.l_quantity)
              FROM lineitem l2
              WHERE l2.l_partkey = l1.l_partkey
                AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
                AND l2.l_shipdate <  TIMESTAMP '1997-01-01'
          )
      )
    """,
    description="TPC-H Q20 shape (suppliers whose shipped share of a "
    "part exceeds a correlated per-part threshold, then a region "
    "semi-join; shipped-quantity share standing in for availqty vs "
    "sum(l_quantity)). Spark decorrelates: one filtered lineitem scan "
    "aggregated at (suppkey,partkey), with the per-part totals as a "
    "WINDOW over that agg output — the correlated HAVING becomes one "
    "scan + one pairs-sized window exchange (the re-aggregate + "
    "join-back form planned the subtree, and the scan, twice). Region "
    "suppliers broadcast; the final IN is a semi-join.",
    tags=("join", "agg", "subquery", "tpch"),
)
def q84_excess_share_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    lparts = t.part.filter(F.col("p_name").like("large%")).select("p_partkey")
    shipped = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("pair_qty"))
    )
    # Per-part totals as a WINDOW over the (part,supp) frame: the
    # re-aggregate + join-back form planned the shipped subtree — and
    # its filtered lineitem scan — TWICE (branches plan independently).
    # NOTE the oracle's correlated subquery is unrestricted by p_name,
    # so totals are computed before the part filter and the filter
    # applies after. sum(l_quantity) is exact under any order
    # (integer-valued doubles), so the window total equals the
    # re-aggregated total bit-for-bit.
    from pyspark.sql.window import Window

    w_part = Window.partitionBy("l_partkey")
    excess = (
        shipped.withColumn("part_qty", F.sum("pair_qty").over(w_part))
        .filter(F.col("pair_qty") > 0.3 * F.col("part_qty"))
        .join(F.broadcast(lparts), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_suppkey")
        .distinct()
    )
    euro_nations = (
        t.nation.select("n_nationkey", "n_regionkey")
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    return (
        t.supplier.join(
            F.broadcast(euro_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .distinct()
    )


@register(
    "q85_mode_per_group",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS n_orders
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY n DESC, o_orderpriority) AS rn
      FROM c
    ) WHERE rn = 1
    """,
    description="deterministic per-group MODE (most frequent value): "
    "count per (group, value), then rank by (count desc, value asc) — "
    "NOT the built-in mode() aggregate, whose tie-break is unspecified "
    "in both engines and therefore un-oracle-able. Scale: the "
    "two-level agg domain is |groups|x|values|; the window runs over "
    "that reduced frame, never the fact table.",
    tags=("agg", "window"),
)
def q85_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t.orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("n_orders"),
        )
    )
