"""Relational inventory, part 3: distribution-ranking window family,
range frames, and array/map scalar-function coverage (SURVEY §2.4
"Window functions" frames/ranking rows and "Scalar functions"
array/map row). All Spark built-ins with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kpipe_spark.catalog import load_tables
from kpipe_spark.queries import register


@register(
    "q43_distribution_ranks",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    description="distribution ranking family (ntile/percent_rank/"
    "cume_dist) per customer — same single shuffle-and-sort per "
    "partition key as the rank family",
    tags=("window",),
)
def q43_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.filter(F.col("o_custkey") < 100).select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "q44_range_frame_moving_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
           ), 2) AS spend_30d
    FROM orders
    WHERE o_custkey < 50
    """,
    description="RANGE frame (value-based, 30-day trailing spend) vs the "
    "row-count frames elsewhere; event-time frames are the batch shape "
    "of the streaming sliding window",
    tags=("window", "frame"),
)
def q44_range_frame_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir).orders
    # rangeBetween needs a numeric ordering key: seconds since epoch;
    # 30 days = 2_592_000 s. DuckDB's INTERVAL frame is the same frame.
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2_592_000, 0)
    )
    return orders.filter(F.col("o_custkey") < 50).select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@register(
    "q45_array_map_functions",
    oracle="""
    WITH parts AS (
      SELECT p_partkey,
             regexp_split_to_array(p_name, ' ') AS words,
             str_split(p_type, ' ') AS type_words
      FROM part WHERE p_partkey < 200
    )
    SELECT p_partkey,
           len(words) AS n_words,
           list_sort(list_transform(words, w -> upper(w)))[1] AS first_upper,
           len(list_filter(words, w -> length(w) > 5)) AS n_long,
           CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT)
             AS total_len,
           array_to_string(list_reverse_sort(words), '|') AS joined_desc
    FROM parts
    """,
    description="array higher-order functions (transform/filter/"
    "aggregate/sort/join) — all JVM-side codegen'd expressions, the "
    "building blocks the LLM text ops compose",
    tags=("scalar", "array"),
)
def q45_array_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir).part
    words = F.split("p_name", " ")
    return part.filter(F.col("p_partkey") < 200).select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.element_at(F.array_sort(F.transform(words, lambda w: F.upper(w))), 1).alias(
            "first_upper"
        ),
        F.size(F.filter(words, lambda w: F.length(w) > 5)).alias("n_long"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_len"),
        F.array_join(F.reverse(F.array_sort(words)), "|").alias("joined_desc"),
    )


@register(
    "q46_union_by_name",
    oracle="""
    SELECT nation_key, name, src, region_key FROM (
      SELECT n_nationkey AS nation_key, n_name AS name, 'nation' AS src,
             n_regionkey AS region_key
      FROM nation
      UNION ALL BY NAME
      SELECT r_name AS name, 'region' AS src, r_regionkey AS nation_key,
             NULL AS region_key
      FROM region
    )
    """,
    description="unionByName with missing columns (schema-aligned union "
    "across heterogeneous frames — the multi-source merge shape)",
    tags=("setop",),
)
def q46_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t.nation.select(
        F.col("n_nationkey").alias("nation_key"),
        F.col("n_name").alias("name"),
        F.lit("nation").alias("src"),
        F.col("n_regionkey").alias("region_key"),
    )
    b = t.region.select(
        F.col("r_name").alias("name"),
        F.lit("region").alias("src"),
        F.col("r_regionkey").alias("nation_key"),
    )
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "q47_time_bucket_window",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL 15 MINUTES, ts) AS VARCHAR) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE event_type IN ('view', 'click')
    GROUP BY 1, 2
    """,
    description="batch run of the STREAMING tumbling-window operator "
    "(window() produces the same buckets withWatermark would maintain "
    "incrementally — one operator, both execution modes)",
    tags=("window", "streaming-shaped"),
)
def q47_time_bucket_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    return (
        e.filter(F.col("event_type").isin("view", "click"))
        .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "q48_null_handling_and_editdist",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), '<open>') AS status_or_default,
           CASE WHEN o_totalprice > 100000 THEN o_totalprice END AS big_price,
           nullif(o_orderpriority, '1-URGENT') AS non_urgent_priority,
           least(o_totalprice, 50000.0) AS capped,
           levenshtein(o_orderpriority, o_orderstatus) AS edit_dist
    FROM orders WHERE o_orderkey < 300
    """,
    description="null-discipline scalars (coalesce/nullif/least + "
    "conditional null) and edit distance — the fuzzy-matching scalar "
    "used in record linkage",
    tags=("scalar", "null", "text"),
)
def q48_null_handling_and_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    return o.filter(F.col("o_orderkey") < 300).select(
        "o_orderkey",
        F.coalesce(
            F.nullif("o_orderstatus", F.lit("O")), F.lit("<open>")
        ).alias("status_or_default"),
        F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice")).alias(
            "big_price"
        ),
        F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("non_urgent_priority"),
        F.least("o_totalprice", F.lit(50000.0)).alias("capped"),
        F.levenshtein("o_orderpriority", "o_orderstatus").alias("edit_dist"),
    )


@register(
    "q49_exists_subquery",
    oracle="""
    SELECT c.c_mktsegment AS segment, count(*) AS n_active_customers
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
    )
    GROUP BY c.c_mktsegment
    """,
    description="correlated EXISTS via Spark SQL (Catalyst decorrelates "
    "to a left-semi join on the correlation key — same physical plan "
    "the q09 DataFrame semi-join declares directly)",
    tags=("subquery", "sql"),
)
def q49_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    t.customer.createOrReplaceTempView("_q49_customer")
    t.orders.createOrReplaceTempView("_q49_orders")
    return spark.sql(
        """
        SELECT c.c_mktsegment AS segment, count(*) AS n_active_customers
        FROM _q49_customer c
        WHERE EXISTS (
          SELECT 1 FROM _q49_orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
        )
        GROUP BY c.c_mktsegment
        """
    )


@register(
    "q50_histogram_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 400000 THEN 21
                ELSE CAST(floor(o_totalprice / 20000) AS BIGINT) + 1
           END AS bucket,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY 1
    """,
    description="equi-width histogram via width_bucket: the profiling "
    "primitive behind data-quality dashboards; single map-side-combined "
    "shuffle on a 22-value key",
    tags=("agg", "histogram"),
)
def q50_histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(400000), F.lit(20)).alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "q51_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           quarter(o_orderdate) AS qtr,
           dayofweek(o_orderdate) + 1 AS dow,
           CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
             AS days_since_epoch_95
    FROM orders WHERE o_orderkey < 200
    """,
    description="date arithmetic family: quarter/day-of-week extraction, "
    "interval shift, month-end snap, day difference — SLA/due-date "
    "computations, all codegen scalar expressions",
    tags=("scalar", "date"),
)
def q51_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    d = F.to_date("o_orderdate")
    return o.filter(F.col("o_orderkey") < 200).select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_add(d, 30).cast("string").alias("due_date"),
        F.last_day(d).cast("string").alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_95"
        ),
    )


@register(
    "q52_posexplode_lateral",
    oracle="""
    WITH w AS (
      SELECT p_partkey, regexp_split_to_array(p_name, ' ') AS words
      FROM part WHERE p_partkey < 100
    )
    SELECT p_partkey,
           unnest(list_transform(range(1, len(words) + 1), i -> i - 1))
             AS pos,
           unnest(words) AS word
    FROM w
    """,
    description="positional explode (posexplode): ordinality-preserving "
    "fan-out — the lateral-join shape for token/position features; "
    "row generation stays distributed, nothing collects",
    tags=("scalar", "lateral"),
)
def q52_posexplode_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir).part
    return (
        part.filter(F.col("p_partkey") < 100)
        .select("p_partkey", F.posexplode(F.split("p_name", " ")))
        .select("p_partkey", F.col("pos"), F.col("col").alias("word"))
    )
