"""Relational inventory, part 2: subqueries, percentiles, explode,
pivot/unpivot, sessionization, as-of join, sliding windows.

Same conventions as relational.py. The as-of join and sessionization
are written the scalable way (single shuffle + window functions), with
correlated-subquery oracles proving the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kpipe_spark.catalog import load_tables
from kpipe_spark.queries import register


@register(
    "q31_correlated_scalar_subquery",
    oracle="""
    SELECT p.p_brand AS brand, count(*) AS n_above_avg
    FROM part p
    WHERE p.p_retailprice > (
      SELECT avg(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    GROUP BY p.p_brand
    """,
    description="correlated scalar subquery (TPC-H Q17 shape), decorrelated "
    "into a broadcast join against the per-brand aggregate",
    tags=("subquery", "join"),
)
def q31_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir).part
    brand_avg = p.groupBy(F.col("p_brand").alias("_b")).agg(
        F.avg("p_retailprice").alias("_avg")
    )
    return (
        p.join(F.broadcast(brand_avg), F.col("p_brand") == F.col("_b"))
        .filter(F.col("p_retailprice") > F.col("_avg"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
    )


@register(
    "q32_in_subquery",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_orders
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    GROUP BY o_orderstatus
    """,
    description="IN subquery as LEFT SEMI join",
    tags=("subquery", "semi"),
)
def q32_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    building = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    return (
        t.orders.join(
            F.broadcast(building), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q33_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.90), 4) AS p90,
           count(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
    description="exact interpolated percentiles per group "
    "(approx_percentile is the 100 TB variant; exact here so the oracle "
    "can agree bit-for-bit)",
    tags=("agg", "percentile"),
)
def q33_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.90)), 4).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q34_explode_token_freq",
    oracle="""
    SELECT token, count(*) AS freq
    FROM (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents
    )
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 20
    """,
    description="explode (lateral unnest) + frequency top-k — the "
    "vocabulary-count shape",
    tags=("explode", "topk"),
)
def q34_explode_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    return (
        docs.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "q35_pivot",
    oracle="""
    SELECT o_orderpriority,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 2) AS O,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 2) AS F,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 2) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
    description="pivot with explicit value list (no extra pass to "
    "discover values — required at scale)",
    tags=("pivot",),
)
def q35_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return pivoted.select(
        "o_orderpriority",
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("O"),
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("F"),
        F.round(F.coalesce(F.col("P"), F.lit(0.0)), 2).alias("P"),
    )


@register(
    "q36_unpivot",
    oracle="""
    SELECT p_partkey AS partkey, metric, round(val, 4) AS val
    FROM (
      UNPIVOT (SELECT p_partkey, CAST(p_size AS DOUBLE) AS size,
                      p_retailprice AS retailprice FROM part)
      ON size, retailprice INTO NAME metric VALUE val
    )
    """,
    description="unpivot/melt wide metrics into (metric, value) rows",
    tags=("unpivot",),
)
def q36_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir).part
    wide = p.select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return wide.unpivot(
        ["partkey"], ["size", "retailprice"], "metric", "val"
    ).select("partkey", "metric", F.round("val", 4).alias("val"))


@register(
    "q37_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
    description="gap-based sessionization (30 min) via lag window — the "
    "batch analogue of session_window(ts, '30 minutes') in streaming",
    tags=("window", "session"),
)
def q37_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q38_asof_join",
    oracle="""
    SELECT e.event_id,
           strftime((
             SELECT max(c.ts) FROM events c
             WHERE c.user_id = e.user_id AND c.event_type = 'click'
               AND c.ts <= e.ts
           ), '%Y-%m-%d %H:%M:%S') AS last_click_ts
    FROM events e
    WHERE e.event_type = 'purchase'
    """,
    description="as-of join (each purchase -> most recent prior click "
    "per user): implemented as union + last(ignorenulls) over one "
    "user-ordered window — a single shuffle, no range join blowup; the "
    "oracle proves semantics with a correlated subquery",
    tags=("asof", "window"),
)
def q38_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    # one pass: carry the last click timestamp forward within each user
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_click = e.withColumn(
        "last_click_ts_raw",
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
        ).over(w),
    )
    return with_click.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.date_format("last_click_ts_raw", "yyyy-MM-dd HH:mm:ss").alias(
            "last_click_ts"
        ),
    )


@register(
    "q39_first_last_per_group",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rf,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rl
      FROM orders
    )
    SELECT o_custkey AS custkey,
           max(CASE WHEN rf = 1 THEN o_orderkey END) AS first_orderkey,
           max(CASE WHEN rl = 1 THEN o_orderkey END) AS last_orderkey
    FROM ranked GROUP BY o_custkey
    """,
    description="first/last event per key with deterministic tie-break "
    "(min_by/max_by shape)",
    tags=("window", "agg"),
)
def q39_first_last_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    wf = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wl = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    ranked = o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
    )
    return ranked.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.when(F.col("rf") == 1, F.col("o_orderkey"))).alias("first_orderkey"),
        F.max(F.when(F.col("rl") == 1, F.col("o_orderkey"))).alias("last_orderkey"),
    )


@register(
    "q40_regexp_extract",
    oracle="""
    SELECT event_type,
           round(avg(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER)), 4) AS avg_k,
           count(*) AS n
    FROM events
    WHERE regexp_extract(props, '"k": (\\d+)', 1) <> ''
    GROUP BY event_type
    """,
    description="regexp_extract group capture + cast + agg",
    tags=("scalar", "regex"),
)
def q40_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    k = F.regexp_extract("props", r'"k": (\d+)', 1)
    return (
        e.filter(k != "")
        .groupBy("event_type")
        .agg(
            F.round(F.avg(k.cast("int")), 4).alias("avg_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q41_sliding_window",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           count(*) AS n_events
    FROM (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, event_type FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_type
      FROM events
    )
    GROUP BY 1, 2
    """,
    description="sliding 1h/30min windows in batch form (each event in "
    "exactly 2 windows) — streaming analogue is window(ts,'1 hour','30 minutes')",
    tags=("events", "window-time"),
)
def q41_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )


@register(
    "q42_distinct_projection",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    description="dropDuplicates on a projection (exact dedup of the key "
    "pair; the streaming variant is dropDuplicatesWithinWatermark)",
    tags=("dedup", "distinct"),
)
def q42_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    return e.select("user_id", "event_type").dropDuplicates()
