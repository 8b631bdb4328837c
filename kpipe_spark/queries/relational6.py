"""Relational inventory, part 6: event-log analytics shapes (funnel,
retention cohorts, Markov transitions) plus the two classic relational
shapes still missing — the TPC-H Q12 two-conditional-count join (adapted
to shipdate-vs-orderdate lateness; the test schema has no
commit/receipt dates or ship modes, see relational5.py) and relational
division ("customers with orders in every quarter").

Reference parity: kpipe itself has no relational operators
(reference README.md:190-191 "no windowing, joins, or state stores");
these queries are the §2.4 engine surface mandated by SURVEY.md, all
Spark built-ins, all DuckDB-oracle-checked.

Scale notes per query. Common rules: events queries shuffle once on
user_id and reuse that exchange for the second aggregate where
possible; orders⋈lineitem shuffles on orderkey (AQE-coalesced);
dimension tables broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kpipe_spark.catalog import load_tables
from kpipe_spark.queries import register
from kpipe_spark.util import ieee_round


@register(
    "q70_lateness_priority_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
    description="TPC-H Q12 shape (two conditional counts over an "
    "orders⋈lineitem join) adapted to shipdate-vs-orderdate lateness "
    "and l_returnflag standing in for l_shipmode. Scale: shipdate range "
    "predicate pushes to the lineitem scan; the join shuffles both "
    "sides on orderkey; the lateness predicate is evaluated post-join "
    "(it references both sides); final agg domain is tiny (3 flags).",
    tags=("join", "agg", "conditional"),
)
def q70_lateness_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.orders.select("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q71_event_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
             min(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events
      GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           count(t_signup) AS n_signup,
           CAST(sum(CASE WHEN t_click > t_signup THEN 1 ELSE 0 END)
                AS BIGINT) AS n_signup_click,
           CAST(sum(CASE WHEN t_purchase > t_click AND t_click > t_signup
                THEN 1 ELSE 0 END) AS BIGINT) AS n_funnel_complete
    FROM per_user
    """,
    description="funnel conversion (signup→click→purchase) with "
    "first-occurrence ordering semantics: a user converts at stage k iff "
    "the earliest occurrences are strictly time-ordered. Scale: one "
    "shuffle on user_id with map-side combine for the three conditional "
    "mins, then a single-row global aggregate (partial-combined; no "
    "second wide shuffle). SQL NULL-comparison semantics make the CASE "
    "conditions false whenever a stage is absent — identical in both "
    "engines.",
    tags=("events", "funnel", "agg"),
)
def q71_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    first = lambda typ: F.min(F.when(F.col("event_type") == typ, F.col("ts")))  # noqa: E731
    per_user = e.groupBy("user_id").agg(
        first("signup").alias("t_signup"),
        first("click").alias("t_click"),
        first("purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_signup").alias("n_signup"),
        F.sum(
            F.when(F.col("t_click") > F.col("t_signup"), 1).otherwise(0)
        ).alias("n_signup_click"),
        F.sum(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_signup")),
                1,
            ).otherwise(0)
        ).alias("n_funnel_complete"),
    )


@register(
    "q72_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(floor(date_diff('day', cohort_week, active_week) / 7)
                AS BIGINT) AS week_offset,
           count(DISTINCT a.user_id) AS active_users
    FROM activity a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    description="retention cohort triangle: users bucketed by "
    "first-seen week, activity counted per (cohort, week-offset). "
    "Scale: the first-seen week is a window on the SAME user_id "
    "shuffle the activity DISTINCT uses (the groupBy + join-back form "
    "planned the events scan twice); only the final small-domain "
    "(cohort, offset) agg reshuffles. count(DISTINCT) expands "
    "per-group but cohort-cells are few; no row explosion.",
    tags=("events", "window-time", "agg"),
)
def q72_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    # first-seen week as a WINDOW on the same user_id partitioning the
    # activity distinct needs anyway: the groupBy + join-back form
    # planned the events scan twice (branches plan independently, and
    # the agg exchange does not reuse against the distinct's). The
    # cohort week is functionally dependent on user_id, so carrying it
    # through the distinct leaves the distinct set unchanged.
    w = Window.partitionBy("user_id")
    activity = (
        e.select("user_id", "ts")
        .withColumn("cohort_week", F.date_trunc("week", F.min("ts").over(w)))
        .select(
            "user_id",
            F.date_trunc("week", "ts").alias("active_week"),
            "cohort_week",
        )
        .distinct()
    )
    return (
        activity
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            ).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@register(
    "q73_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, count(*) AS n_transitions
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    description="first-order Markov transition counts over per-user "
    "event sequences (lead() window, event_id tie-break for "
    "determinism). Scale: one shuffle on user_id for the window sort "
    "— per-user sequences are bounded, so no skew; the 5×5 transition "
    "matrix agg is map-side-combined into a trivial shuffle.",
    tags=("events", "window", "agg"),
)
def q73_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select("event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "q74_loyal_customers_by_nation",
    oracle="""
    WITH cq AS (
      SELECT o_custkey, count(DISTINCT quarter(o_orderdate)) AS nq
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY o_custkey
    )
    SELECT n_name,
           count(*) AS loyal_customers,
           CAST(floor(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                      / count(*) * 100.0 + 0.5) / 100.0 AS DOUBLE)
             AS avg_acctbal
    FROM cq
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE nq = 4
    GROUP BY n_name
    """,
    description="relational division: customers with ≥1 order in EVERY "
    "quarter of 1997, rolled up to nation. Scale: orderdate predicate "
    "pushes to the orders scan; count(DISTINCT quarter) has a 4-value "
    "domain so the per-custkey agg stays narrow; customer joins on "
    "custkey (shuffle), 25-row nation broadcasts; final agg domain is "
    "25 nations.",
    tags=("join", "agg", "division", "broadcast"),
)
def q74_loyal_customers_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cq = (
        t.orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("o_custkey")
        .agg(F.count_distinct(F.quarter("o_orderdate")).alias("nq"))
        .filter(F.col("nq") == 4)
    )
    return (
        cq.join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("loyal_customers"),
            # exact-decimal sum (acctbal is 2-decimal by construction),
            # then one double division: the pre-round value is
            # bit-identical across engines AND across runs — a float
            # avg's summation order varies with task scheduling, and an
            # exactly-half-way mean (integer cents / count) would flip
            # sides run-to-run under any rounding rule
            ieee_round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("avg_acctbal"),
        )
    )


@register(
    "q75_boolean_aggregates",
    oracle="""
    SELECT o_orderpriority,
           CAST(bool_and(o_totalprice > 1000) AS INTEGER) AS all_above_1k,
           CAST(bool_or(o_orderstatus = 'F') AS INTEGER) AS any_finished,
           CAST(bool_and(o_orderdate >= TIMESTAMP '1995-01-01')
                AS INTEGER) AS all_in_range,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    description="universal/existential aggregate family: bool_and / "
    "bool_or per group (SQL EVERY/ANY), cast to 0/1 for engine-neutral "
    "comparison. Scale: single map-side-combined shuffle on a 5-value "
    "group domain; booleans combine associatively so partial aggs are "
    "one bit per group per partition.",
    tags=("agg", "boolean"),
)
def q75_boolean_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).cast("int").alias("all_above_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").cast("int").alias("any_finished"),
        F.bool_and(
            F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
        ).cast("int").alias("all_in_range"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q76_error_rate_anomaly",
    oracle="""
    WITH h AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
             count(*) AS n_events,
             avg(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END)
               AS err_rate
      FROM events
      GROUP BY 1
    ),
    stats AS (
      SELECT avg(err_rate) AS mu, stddev_samp(err_rate) AS sigma FROM h
    )
    SELECT hour_ts, n_events,
           CAST(round(err_rate, 4) AS DOUBLE) AS err_rate,
           CAST(round((err_rate - mu) / sigma, 2) AS DOUBLE) AS z_score
    FROM h, stats
    WHERE round((err_rate - mu) / sigma, 2) > 2
    """,
    description="hourly error-rate anomaly detection: z-score of each "
    "hour's error fraction against the global mean/stddev, flag hours "
    "above 2σ (rounded before the threshold so the gate is "
    "engine-stable). Scale: hourly agg is map-side-combined into a "
    "time-bucket domain; the global stats are unpartitioned windows "
    "over BUCKETS (not events) — the broadcast-scalar form re-planned "
    "the hourly subtree and scanned events twice; this shape scans "
    "the corpus exactly once.",
    tags=("events", "window-time", "anomaly"),
)
def q76_error_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events
    h = e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_ts"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg(
            F.when(F.col("event_type") == "error", F.lit(1.0)).otherwise(F.lit(0.0))
        ).alias("err_rate"),
    )
    # Global mean/stddev as UNPARTITIONED windows over the hourly
    # frame: the scalar-subquery form (h.agg broadcast back onto h)
    # planned the hourly subtree — and its events scan — twice. The
    # single window partition holds |hours| rows; the z-score is
    # rounded before the threshold in both forms, keeping the gate
    # engine- and order-stable.
    w_all = Window.partitionBy()
    h = h.withColumn("mu", F.avg("err_rate").over(w_all)).withColumn(
        "sigma", F.stddev_samp("err_rate").over(w_all)
    )
    z = F.round((F.col("err_rate") - F.col("mu")) / F.col("sigma"), 2)
    return (
        h.filter(z > 2)
        .select(
            "hour_ts",
            "n_events",
            F.round("err_rate", 4).cast("double").alias("err_rate"),
            z.cast("double").alias("z_score"),
        )
    )


@register(
    "q77_monthly_revenue_growth",
    oracle="""
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS revenue
      FROM orders
      GROUP BY 1
    )
    SELECT month,
           CAST(revenue AS DOUBLE) AS revenue,
           CAST(round(
             100.0 * (revenue - lag(revenue) OVER (ORDER BY month))
             / lag(revenue) OVER (ORDER BY month), 2) AS DOUBLE)
             AS growth_pct
    FROM m
    """,
    description="month-over-month revenue growth: monthly DECIMAL "
    "revenue (exact, order-independent), lag() over the month series, "
    "percent delta. Scale: the corpus-sized work is one "
    "map-side-combined agg to an ~80-row month domain; the lag window "
    "sorts MONTHS, not orders — a driver-trivial partition. First "
    "month's growth is NULL in both engines.",
    tags=("window", "agg", "time-series"),
)
def q77_monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    m = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month"
        )
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        F.col("revenue").cast("double").alias("revenue"),
        F.round(100.0 * (F.col("revenue") - prev) / prev, 2)
        .cast("double")
        .alias("growth_pct"),
    )


@register(
    "q78_revenue_pareto",
    oracle="""
    WITH c AS (
      SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, rev,
             sum(rev) OVER (ORDER BY rev DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS cum_rev,
             sum(rev) OVER () AS total_rev,
             row_number() OVER (ORDER BY rev DESC, o_custkey) AS rk
      FROM c
    )
    SELECT rk, o_custkey,
           CAST(rev AS DOUBLE) AS rev,
           CAST(round(100.0 * cum_rev / total_rev, 4) AS DOUBLE)
             AS cum_share_pct
    FROM ranked
    WHERE cum_rev - rev < 0.5 * total_rev
    """,
    description="revenue Pareto head: customers ranked by spend whose "
    "PRECEDING cumulative share is under 50% — 'which customers make "
    "up the first half of revenue' (the subtraction keeps the row that "
    "crosses the line, deterministic via DECIMAL sums and id "
    "tie-break). Scale: per-customer agg is one map-side-combined "
    "shuffle; the running sum orders CUSTOMER AGGREGATES (not orders); "
    "at extreme cardinality swap for a two-phase quantile cut on the "
    "rev distribution.",
    tags=("window", "agg", "topk"),
)
def q78_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir).orders
    c = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev")
    )
    w_order = Window.orderBy(F.col("rev").desc(), "o_custkey")
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    ranked = c.select(
        F.row_number().over(w_order).alias("rk"),
        "o_custkey",
        "rev",
        F.sum("rev").over(w_cum).alias("cum_rev"),
        F.sum("rev").over(w_all).alias("total_rev"),
    )
    return ranked.filter(
        F.col("cum_rev") - F.col("rev") < 0.5 * F.col("total_rev")
    ).select(
        "rk",
        "o_custkey",
        F.col("rev").cast("double").alias("rev"),
        F.round(100.0 * F.col("cum_rev") / F.col("total_rev"), 4)
        .cast("double")
        .alias("cum_share_pct"),
    )


@register(
    "q79_gap_fill_locf",
    oracle="""
    WITH p AS (
      SELECT user_id, date_trunc('day', ts)::DATE AS day,
             round(sum(value), 4) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), bounds AS (
      SELECT min(date_trunc('day', ts)::DATE) AS lo,
             max(date_trunc('day', ts)::DATE) AS hi
      FROM events
    ), cal AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ), grid AS (
      SELECT u.user_id, c.day
      FROM (SELECT DISTINCT user_id FROM p) u, cal c
    )
    SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
           CAST(last_value(p.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS filled,
           CAST(p.v IS NOT NULL AS INTEGER) AS observed
    FROM grid g
    LEFT JOIN p ON g.user_id = p.user_id AND g.day = p.day
    """,
    description="time-series gap fill + LOCF forward fill: per-user "
    "daily purchase totals densified onto the full corpus calendar "
    "(sequence+explode), missing days carried forward with "
    "last(ignorenulls) — the resample/ffill operator every metrics "
    "pipeline needs. Days before a user's first purchase stay NULL. "
    "Scale: the calendar is tiny (broadcast side of the grid "
    "cross-join — users x days rows but only (user_id, day) tuples); "
    "the LOCF window partitions by user, so state is one value per "
    "user per partition, no global sort. Daily sums rounded BEFORE the "
    "fill so both engines carry identical doubles forward.",
    tags=("window", "time-series", "events"),
)
def q79_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kpipe_spark.util import materialize

    ev = load_tables(spark, sf_dir).events
    # The per-user-day purchase frame feeds TWO branches (the distinct
    # user list for the grid, and the grid's left join) that plan
    # independently — unmaterialized, events was scanned three times
    # (these two plus the bounds min/max). Materialized once, the
    # remaining second scan is the column-pruned bounds pass. The
    # frame is events-proportional, so the injectable corpus strategy
    # applies (util.set_materializer).
    p = materialize(
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 4).alias("v")),
        scale="corpus",
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    grid = p.select("user_id").distinct().crossJoin(F.broadcast(cal))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = grid.join(p, ["user_id", "day"], "left")
    return g.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.last("v", ignorenulls=True).over(w).cast("double").alias("filled"),
        F.col("v").isNotNull().cast("integer").alias("observed"),
    )
