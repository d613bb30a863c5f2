"""Window-function measure family (SURVEY.md §2.6 extended): the
remaining DAX-style time-intelligence measures — lag/lead deltas,
moving averages, running totals, distribution ranks. All
oracle-checked; every window here shares one partitioning per query so
Spark plans a single shuffle+sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.transforms import dsum
from .measures import t


def q_w4_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event sequencing: previous/next event type and the gap
    to the previous event in exact microseconds (lag/lead over one
    (user, ts) sort)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
            "gap_us"
        ),
    )


def q_w5_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly amounts with 3-month moving average and running total —
    the trend-smoothing + cumulative DAX measures. Aggregate first
    (tiny frame), window second; the window never sees raw rows."""
    o = t(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.trunc("o_orderdate", "month").alias("month_start"))
        .agg(dsum("o_totalprice").alias("amount"))
    )
    w3 = Window.orderBy("month_start").rowsBetween(-2, 0)
    wrun = Window.orderBy("month_start").rowsBetween(Window.unboundedPreceding, 0)
    dec = F.col("amount").cast("decimal(18,2)")
    return monthly.select(
        "month_start",
        "amount",
        # decimal accumulation inside the window: float window sums are
        # order/implementation dependent across engines
        (F.sum(dec).over(w3).cast("double") / F.count(F.lit(1)).over(w3)).alias(
            "moving_avg_3m"
        ),
        F.sum(dec).over(wrun).cast("double").alias("running_total"),
    )


def q_w6_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks per segment: ntile quartile, percent_rank and
    cume_dist of customer balances (the percentile-band coloring DAX
    measures)."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        "c_acctbal",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
    )


def q_w7_growth_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year growth — the DAX
    SAMEPERIODLASTYEAR / PREVIOUSMONTH time-intelligence pair, as lag
    windows over the monthly aggregate (the 12-step lag only works on
    a gapless month spine, which the fixture's continuous order flow
    provides; production would left-join the calendar dim first)."""
    o = t(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.trunc("o_orderdate", "month").alias("month_start"))
        .agg(dsum("o_totalprice").alias("amount"))
    )
    w = Window.orderBy("month_start")
    mom_prev = F.lag("amount", 1).over(w)
    yoy_prev = F.lag("amount", 12).over(w)
    return monthly.select(
        "month_start",
        "amount",
        F.round((F.col("amount") - mom_prev) / mom_prev * 100, 6).alias("mom_pct"),
        F.round((F.col("amount") - yoy_prev) / yoy_prev * 100, 6).alias("yoy_pct"),
    )


def q_w8_ytd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAX TOTALYTD: cumulative monthly amount that resets each
    January — a running decimal sum partitioned by year. One shuffle
    on the year key over the (tiny) monthly aggregate."""
    o = t(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.trunc("o_orderdate", "month").alias("month_start"))
        .agg(dsum("o_totalprice").alias("amount"))
    )
    w = (
        Window.partitionBy(F.year("month_start"))
        .orderBy("month_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return monthly.select(
        "month_start",
        "amount",
        F.sum(F.col("amount").cast("decimal(18,2)")).over(w)
        .cast("double")
        .alias("ytd_amount"),
    )


def q_w9_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history derivation: the event log becomes a slowly-changing
    dimension — each row valid from its own timestamp until the user's
    next event (NULL valid_to + is_current=1 on the latest). The W1
    latest-per-key snapshot is exactly the is_current=1 slice; this is
    its full-history generalization (one (user, ts) window sort, same
    single shuffle)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )


def q_w11_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) query over the SCD2 history: each
    user's state AS OF 2024-01-15 — the "what did the dashboard say
    on day X" audit question. Rather than filtering the derived
    w9 interval table (valid_from <= T < valid_to), the plan prunes
    FIRST (ts <= T pushes into the scan, discarding everything after
    the as-of instant) and takes latest-per-key on the survivors —
    the same single WindowGroupLimit shuffle as A7, on a smaller
    input than the full history."""
    ev = t(spark, sf_dir, "events")
    asof = F.lit("2024-01-15 00:00:00").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.filter(F.col("ts") <= asof)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("state_asof"),
            F.col("ts").alias("valid_from"),
        )
    )


def q_w12_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the sliding
    DISTINCT window that does NOT decompose like w10's cumulative
    form (a user can enter and leave the window repeatedly). The
    scalable rewrite: reduce to distinct (user, day) pairs once, then
    EXPLODE each pair into the ≤7 window-days it contributes to and
    hash-distinct per (window_day, user) — one shuffle whose width is
    window_size × user-days, instead of re-scanning 7 days of facts
    for every output day. Output days restricted to observed days."""
    ev = t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = ud.select("day").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("window_day"),
    )
    return (
        contrib.join(
            days.select(F.col("day").alias("window_day")), "window_day"
        )
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").alias("n_active_7d"))
    )


def q_w13_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE window frame: each purchase's trailing-7-day
    spend for the same user — the time-based frame (`RANGE BETWEEN
    INTERVAL`) that row-count frames (w5) can't express on irregular
    event times. Spark form: rangeBetween over exact epoch
    microseconds, one user-keyed window sort; peers at the same
    timestamp aggregate together in both engines by RANGE semantics.
    Decimal sums keep the frame totals engine-exact."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("trailing_7d_spend"),
    )


def q_w10_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT user count by day — the "total audience to
    date" line a dashboard draws next to daily actives — here the
    high-value-purchaser audience (the >120 slice keeps first-seen
    days genuinely spread out). A naive
    windowed COUNT(DISTINCT) re-scans history per bucket; the
    decomposition is: distinct = each user counts once, on their FIRST
    day, then a running sum over days. One user-keyed min-agg + one
    calendar-sized cumulative window — the fact table is scanned once,
    and the unpartitioned window sorts ~hundreds of rows."""
    ev = t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 120)
    )
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    daily = firsts.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).alias("n_cumulative_users"),
    )


ORACLES: dict[str, str] = {
    "w10_cumulative_distinct": """
        WITH firsts AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS day
            FROM events
            WHERE event_type = 'purchase' AND value > 120
            GROUP BY 1),
        daily AS (
            SELECT day, COUNT(*) AS n_new_users
            FROM firsts GROUP BY 1)
        SELECT day, n_new_users,
               CAST(SUM(n_new_users) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_cumulative_users
        FROM daily
    """,
    "w12_rolling_distinct": """
        WITH ud AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        days AS (SELECT DISTINCT day FROM ud)
        SELECT d.day AS window_day,
               COUNT(DISTINCT u.user_id) AS n_active_7d
        FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY 1
    """,
    "w13_range_frame": """
        SELECT event_id, user_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS trailing_7d_spend
        FROM events WHERE event_type = 'purchase'
    """,
    "w11_asof_snapshot": """
        SELECT user_id, event_type AS state_asof, ts AS valid_from
        FROM (SELECT user_id, event_type, ts,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
              WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        WHERE rn = 1
    """,
    "w9_scd2_history": """
        SELECT user_id, event_id, event_type,
               ts AS valid_from,
               LEAD(ts) OVER w AS valid_to,
               CAST(CASE WHEN LEAD(ts) OVER w IS NULL
                         THEN 1 ELSE 0 END AS INT) AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "w8_ytd": """
        WITH monthly AS (
            SELECT date_trunc('month', o_orderdate) AS month_start,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amount
            FROM orders GROUP BY 1)
        SELECT month_start, amount,
               CAST(SUM(CAST(amount AS DECIMAL(18,2))) OVER (
                   PARTITION BY year(month_start) ORDER BY month_start
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS ytd_amount
        FROM monthly
    """,
    "w7_growth_rates": """
        WITH monthly AS (
            SELECT date_trunc('month', o_orderdate) AS month_start,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amount
            FROM orders GROUP BY 1)
        SELECT month_start, amount,
               ROUND((amount - LAG(amount, 1) OVER w)
                     / LAG(amount, 1) OVER w * 100, 6) AS mom_pct,
               ROUND((amount - LAG(amount, 12) OVER w)
                     / LAG(amount, 12) OVER w * 100, 6) AS yoy_pct
        FROM monthly
        WINDOW w AS (ORDER BY month_start)
    """,
    "w4_lag_lead": """
        SELECT event_id, user_id, event_type,
               LAG(event_type) OVER w AS prev_type,
               LEAD(event_type) OVER w AS next_type,
               epoch_us(CAST(ts AS TIMESTAMP))
                 - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "w5_moving_avg": """
        WITH monthly AS (
            SELECT date_trunc('month', o_orderdate) AS month_start,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amount
            FROM orders GROUP BY 1)
        SELECT month_start, amount,
               CAST(SUM(CAST(amount AS DECIMAL(18,2))) OVER w3 AS DOUBLE)
                   / COUNT(*) OVER w3 AS moving_avg_3m,
               CAST(SUM(CAST(amount AS DECIMAL(18,2))) OVER wrun AS DOUBLE)
                   AS running_total
        FROM monthly
        WINDOW w3 AS (ORDER BY month_start
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
               wrun AS (ORDER BY month_start ROWS UNBOUNDED PRECEDING)
    """,
    "w6_distribution_ranks": """
        SELECT c_custkey,
               c_mktsegment AS segment,
               c_acctbal,
               CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume_dist
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
}

QUERIES = {
    "w4_lag_lead": q_w4_lag_lead,
    "w7_growth_rates": q_w7_growth_rates,
    "w8_ytd": q_w8_ytd,
    "w5_moving_avg": q_w5_moving_avg,
    "w6_distribution_ranks": q_w6_distribution_ranks,
    "w9_scd2_history": q_w9_scd2_history,
    "w10_cumulative_distinct": q_w10_cumulative_distinct,
    "w11_asof_snapshot": q_w11_asof_snapshot,
    "w12_rolling_distinct": q_w12_rolling_distinct,
    "w13_range_frame": q_w13_range_frame,
}
