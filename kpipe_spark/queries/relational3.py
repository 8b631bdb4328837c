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
           list_sum(list_transform(words, w -> length(w))) AS total_len,
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
