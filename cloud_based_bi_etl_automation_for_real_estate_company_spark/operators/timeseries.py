"""Timeseries downsampling — the hypertable/continuous-aggregate
rollup class of operator (TimescaleDB-style OHLC bars), re-expressed
as one Spark tumbling-window hash aggregation.

Design for 100 TB: a single groupBy (key, window) — ONE shuffle with
map-side partial aggregation on a uniform composite key. Open/close
are min/max over a (ts, seq, value) struct (lexicographic struct
ordering = earliest/latest row, seq breaking ts ties), so they merge
associatively like any other partial aggregate — no window function,
no per-key sort, no second pass. Volume accumulates in DECIMAL
(functions.transforms.dsum) so a 1000-partition parallel sum equals
the single-threaded oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.transforms import dsum


def ohlc_downsample(
    df: DataFrame,
    bucket: str = "5 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    seq_col: str = "event_id",
) -> DataFrame:
    """Downsample an event stream into per-key OHLC bars per tumbling
    ``bucket``: open/close = value at the earliest/latest event in the
    bucket (ties on ``ts`` broken by ``seq_col``), high/low = extrema,
    plus event count and decimal-exact volume.

    Returns (key_col, bucket_start, open_val, high_val, low_val,
    close_val, n_events, volume).
    """
    edge = F.struct(F.col(ts_col), F.col(seq_col), F.col(val_col))
    return (
        df.groupBy(F.col(key_col), F.window(F.col(ts_col), bucket).alias("__w"))
        .agg(
            F.min(edge).getField(val_col).alias("open_val"),
            F.max(F.col(val_col)).alias("high_val"),
            F.min(F.col(val_col)).alias("low_val"),
            F.max(edge).getField(val_col).alias("close_val"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(val_col, 6).alias("volume"),
        )
        .select(
            key_col,
            F.col("__w.start").alias("bucket_start"),
            "open_val",
            "high_val",
            "low_val",
            "close_val",
            "n_events",
            "volume",
        )
    )


def gap_fill_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Gap-filled, forward-filled daily series per key — the
    TimescaleDB ``time_bucket_gapfill`` + ``locf`` operator class: BI
    line charts and downstream window math (moving averages, growth
    rates) need a row for EVERY day in the observed span, with missing
    days carrying the last observed value forward.

    Dataflow: one hash-agg to daily grain, a global (min, max) day
    probe that seeds a ``sequence``-exploded calendar spine (days ×
    keys — calendar-sized, built from a broadcast 1-row frame and the
    distinct-key table, never a fact-table scan), a left join of
    actuals onto the spine (day-uniform key), and one per-key ordered
    window for the ``last_value(ignorenulls)`` carry-forward. Series
    count is the partition key, so the sort is per-key and the 100 TB
    cost is the daily-grain table, not the raw facts.

    Returns (key_col, day, n_events, day_value, filled_value) where
    day_value is NULL on gap days and filled_value carries forward
    (NULL until the key's first observation).
    """
    from pyspark.sql import Window

    daily = df.groupBy(
        F.col(key_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(val_col, 6).alias("day_value"),
    )
    span = daily.groupBy().agg(
        F.min("day").alias("__lo"), F.max("day").alias("__hi")
    )
    days = span.select(
        F.explode(F.sequence("__lo", "__hi")).alias("day")
    )
    keys = daily.select(key_col).distinct()
    spine = keys.crossJoin(F.broadcast(days))
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, [key_col, "day"], "left")
        .select(
            key_col,
            "day",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
            "day_value",
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


def seasonal_decompose_daily(
    counts: DataFrame,
    key_col: str = "series",
    day_col: str = "day",
    value_col: str = "x",
) -> DataFrame:
    """Classical additive seasonal decomposition of a daily INTEGER
    series per key (the `decompose` everyone runs before t10/t12's
    smoothers): y = trend + seasonal + residual with a centered 7-day
    moving-average trend and day-of-week seasonal means — the
    weekly-cycle diagnostic for event volumes.

    Semantics: the series is first made GAPLESS over the global
    [min, max] day span (absent days count 0 — correct for event
    counts); trend is the centered 7-day mean, defined only where the
    full window exists (the standard edge-NA convention — first/last
    3 days are dropped); seasonal(dow) is the mean of the detrended
    series over that day-of-week's full-window rows (uncentered
    convention — we do NOT re-center seasonal to sum 0, so
    trend+seasonal+resid reconstructs y exactly); resid is the
    remainder. Day-of-week is engine-neutral days-since-Monday
    arithmetic (datediff from 1970-01-05 mod 7), NOT the engines'
    conflicting dayofweek builtins.

    Cross-engine exactness: counts are integers, so the detrended
    numerator 7·y − Σ₇y and the per-dow sums stay INTEGER; trend and
    seasonal are each ONE exactly-rounded IEEE division
    (Σ₇/7, Σ_dow/(7·c_dow)) and resid evaluates left-to-right as
    (y − trend) − seasonal from those exact inputs — bit-for-bit
    replayable. BIGINT bound: 7·y needs y < 2⁶⁰ — any count fits.

    Spark shape: one hash-agg to daily grain upstream of this
    operator; here a broadcast calendar spine (global 1-row span ×
    distinct keys — calendar-sized), ONE per-key ordered window
    producing both Σ₇ and the full-window flag, a dow-keyed agg over
    the window output (key×7 rows), and a broadcast join back. The
    100 TB cost is the daily-grain table, never the raw facts.
    Returns (``key_col``, day, dow, y, trend, seasonal, resid).
    """
    from pyspark.sql import Window

    daily = counts.groupBy(
        F.col(key_col), F.col(day_col).alias("day")
    ).agg(F.sum(F.col(value_col)).cast("bigint").alias("y"))
    span = daily.groupBy().agg(
        F.min("day").alias("__lo"), F.max("day").alias("__hi")
    )
    days = span.select(F.explode(F.sequence("__lo", "__hi")).alias("day"))
    keys = daily.select(key_col).distinct()
    spine = keys.crossJoin(F.broadcast(days))
    gapless = spine.join(daily, [key_col, "day"], "left").select(
        key_col,
        "day",
        F.coalesce(F.col("y"), F.lit(0)).cast("bigint").alias("y"),
        (
            F.datediff(F.col("day"), F.lit("1970-01-05").cast("date")) % 7
        ).cast("bigint").alias("dow"),
    )
    w7 = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    # full-window rows only; the frame feeds the dow agg AND the
    # final projection — checkpoint so the spine join + window run
    # once (PERF.md round 9); it is calendar-sized, not fact-sized
    windowed = (
        gapless.select(
            key_col,
            "day",
            "dow",
            "y",
            F.sum("y").over(w7).cast("bigint").alias("sum7"),
            F.count(F.lit(1)).over(w7).alias("cnt7"),
        )
        .filter(F.col("cnt7") == 7)
        .localCheckpoint(eager=True)
    )
    dow_means = windowed.groupBy(key_col, "dow").agg(
        F.sum(F.lit(7) * F.col("y") - F.col("sum7"))
        .cast("bigint")
        .alias("s_dow"),
        F.count(F.lit(1)).cast("bigint").alias("c_dow"),
    )
    trend = F.col("sum7").cast("double") / F.lit(7.0)
    seasonal = F.col("s_dow").cast("double") / (
        F.lit(7.0) * F.col("c_dow").cast("double")
    )
    return (
        windowed.join(F.broadcast(dow_means), [key_col, "dow"])
        .select(
            key_col,
            "day",
            "dow",
            "y",
            trend.alias("trend"),
            seasonal.alias("seasonal"),
            (F.col("y").cast("double") - trend - seasonal).alias("resid"),
        )
    )


def holt_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    val_col: str = "value",
    alpha: float = 0.3,
    beta: float = 0.2,
) -> DataFrame:
    """Holt's linear (double-exponential) smoothing over each key's
    daily series — level + trend, the forecast-with-slope upgrade of
    :func:`ewma_daily`:

        l_k = α·x_k + (1−α)(l_{k−1} + b_{k−1})
        b_k = β(l_k − l_{k−1}) + (1−β)·b_{k−1},  l_1 = x_1, b_1 = 0

    The pair-state fold runs as a JVM-side higher-order ``aggregate``
    with a struct accumulator over each key's calendar-bounded sorted
    series (same shape as ewma_daily; one shuffle to daily grain, one
    to per-key arrays). Smoothing constants are evaluated in-engine
    ((1.0 − α), not a Python-folded literal) so the oracle's double
    arithmetic is bit-identical. Returns one row per observed day:
    (key, day, day_value, level, trend, forecast = level + trend)."""
    a, b_ = float(alpha), float(beta)
    daily = df.groupBy(
        F.col(key_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(dsum(val_col, 6).alias("v"))
    series = daily.groupBy(key_col).agg(
        F.array_sort(F.collect_list(F.struct("day", "v"))).alias("s")
    )
    pos = series.select(key_col, "s", F.posexplode("s").alias("__k", "__x"))
    one_m_a = F.lit(1.0) - F.lit(a)
    one_m_b = F.lit(1.0) - F.lit(b_)

    def step(acc, x):
        lk = F.lit(a) * x["v"] + one_m_a * (acc["l"] + acc["b"])
        return F.struct(
            lk.alias("l"),
            (F.lit(b_) * (lk - acc["l"]) + one_m_b * acc["b"]).alias("b"),
        )

    state = F.aggregate(
        F.slice(F.col("s"), F.lit(2), F.col("__k")),
        F.struct(
            F.element_at(F.col("s"), 1)["v"].alias("l"), F.lit(0.0).alias("b")
        ),
        step,
    )
    return pos.select(
        key_col,
        F.col("__x")["day"].alias("day"),
        F.col("__x")["v"].alias("day_value"),
        state["l"].alias("level"),
        state["b"].alias("trend"),
        (state["l"] + state["b"]).alias("forecast"),
    )


def holt_winters_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    val_col: str = "value",
    alpha: float = 0.3,
    beta: float = 0.2,
    gamma: float = 0.3,
    period: int = 7,
) -> DataFrame:
    """Holt–Winters ADDITIVE triple smoothing: level + trend +
    ``period``-length seasonality over each key's observed daily
    series —

        l_k = α(x_k − s_{k−m}) + (1−α)(l_{k−1} + b_{k−1})
        b_k = β(l_k − l_{k−1}) + (1−β)·b_{k−1}
        s_k = γ(x_k − l_k) + (1−γ)·s_{k−m}

    with l_1 = x_1, b_1 = 0 and the seasonal queue initialized to
    zeros (so s_1 = 0 exactly). The accumulator is a struct carrying
    (l, b, seas) where ``seas`` is the fixed-length queue of the last
    m seasonal estimates — head = s_{k−m}; each step pops the head and
    appends s_k, entirely as JVM-side array slice/concat inside the
    higher-order ``aggregate`` (same one-shuffle-to-daily-grain, one
    shuffle-to-per-key-arrays shape as :func:`holt_daily`; the state
    is m+2 doubles, never data-sized). Smoothing constants are
    evaluated in-engine so the DuckDB recursive-CTE oracle's double
    arithmetic is bit-identical. Returns one row per observed day:
    (key, day, day_value, level, trend, seasonal,
    forecast = l + b + s_{k+1−m})."""
    a, b_, g = float(alpha), float(beta), float(gamma)
    m = int(period)
    daily = df.groupBy(
        F.col(key_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(dsum(val_col, 6).alias("v"))
    series = daily.groupBy(key_col).agg(
        F.array_sort(F.collect_list(F.struct("day", "v"))).alias("s")
    )
    pos = series.select(key_col, "s", F.posexplode("s").alias("__k", "__x"))
    one_m_a = F.lit(1.0) - F.lit(a)
    one_m_b = F.lit(1.0) - F.lit(b_)
    one_m_g = F.lit(1.0) - F.lit(g)

    def step(acc, x):
        s_old = F.element_at(acc["seas"], 1)
        lk = F.lit(a) * (x["v"] - s_old) + one_m_a * (acc["l"] + acc["b"])
        sk = F.lit(g) * (x["v"] - lk) + one_m_g * s_old
        return F.struct(
            lk.alias("l"),
            (F.lit(b_) * (lk - acc["l"]) + one_m_b * acc["b"]).alias("b"),
            F.concat(
                F.slice(acc["seas"], 2, m - 1), F.array(sk)
            ).alias("seas"),
        )

    zero_seas = F.array_repeat(F.lit(0.0), m)
    # k=1 is the init state; its seasonal update s_1 = γ(x_1−l_1) = 0
    # exactly, so the zero queue ALREADY holds s_1 at the tail slot —
    # fold the remaining prefix like holt_daily
    state = F.aggregate(
        F.slice(F.col("s"), F.lit(2), F.col("__k")),
        F.struct(
            F.element_at(F.col("s"), 1)["v"].alias("l"),
            F.lit(0.0).alias("b"),
            zero_seas.alias("seas"),
        ),
        step,
    )
    return pos.select(
        key_col,
        F.col("__x")["day"].alias("day"),
        F.col("__x")["v"].alias("day_value"),
        state["l"].alias("level"),
        state["b"].alias("trend"),
        F.element_at(state["seas"], m).alias("seasonal"),
        (
            state["l"] + state["b"] + F.element_at(state["seas"], 1)
        ).alias("forecast"),
    )


def ewma_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    val_col: str = "value",
    alpha: float = 0.3,
) -> DataFrame:
    """Exponentially weighted moving average over each key's daily
    series — the smoothing/forecast-baseline rollup (Holt's level
    component): s₁ = x₁, sₖ = (1−α)·sₖ₋₁ + α·xₖ. EWMA is a
    SEQUENTIAL fold, not a windowable aggregate; the Spark-first form
    is: aggregate to daily grain (one shuffle), collect each key's
    bounded daily series into a sorted array (calendar-bounded — days,
    not events), and run the fold as a JVM-side higher-order
    ``aggregate`` over array prefixes. Per-day outputs fold the k-th
    prefix (O(days²) per key, days being calendar-bounded tiny); a
    level-only variant would fold once.

    Returns (key_col, day, day_value, ewma), one row per observed day
    per key.
    """
    daily = df.groupBy(
        F.col(key_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(dsum(val_col, 6).alias("v"))
    series = daily.groupBy(key_col).agg(
        F.array_sort(F.collect_list(F.struct("day", "v"))).alias("s")
    )
    pos = series.select(key_col, "s", F.posexplode("s").alias("__k", "__x"))
    a = float(alpha)
    ew = F.aggregate(
        F.slice(F.col("s"), F.lit(2), F.col("__k")),
        F.element_at(F.col("s"), 1)["v"],
        lambda acc, x: acc * F.lit(1.0 - a) + x["v"] * F.lit(a),
    )
    return pos.select(
        key_col,
        F.col("__x")["day"].alias("day"),
        F.col("__x")["v"].alias("day_value"),
        ew.alias("ewma"),
    )


def twap_daily(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    seq_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average (Timescale ``time_weight``-class rollup):
    per (key, day), each observation's value is weighted by how long
    it REMAINED CURRENT — the duration to the next observation in the
    same key-day (LOCF weighting; the day's last observation carries
    no span and drops out, so a key-day needs ≥2 events to produce a
    row). The arithmetic-mean rollup over-counts bursts; TWAP is the
    honest "average level over time" for irregular series.

    One (key, day)-keyed window sort computes the lead timestamp;
    durations are exact BIGINT microseconds and the value·duration
    products accumulate as rounded DECIMAL, so any partitioning and
    the single-threaded oracle agree bit-for-bit. Returns
    (key, day, n_spans, total_us, twap)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col, "day").orderBy(ts_col, seq_col)
    spans = (
        df.withColumn("day", F.to_date(ts_col))
        .withColumn("__next", F.lead(ts_col).over(w))
        .filter(F.col("__next").isNotNull())
        .withColumn(
            "__dt",
            F.unix_micros(F.col("__next")) - F.unix_micros(F.col(ts_col)),
        )
    )
    contrib = F.round(F.col(val_col) * F.col("__dt"), 6).cast("decimal(28,6)")
    return (
        spans.groupBy(key_col, "day")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("__dt").cast("bigint").alias("total_us"),
            F.sum(contrib).alias("__num"),
        )
        .select(
            key_col,
            "day",
            "n_spans",
            "total_us",
            (
                F.col("__num").cast("double")
                / F.col("total_us").cast("double")
            ).alias("twap"),
        )
    )


def cusum_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    val_col: str = "value",
    slack_frac: float = 0.05,
    threshold_frac: float = 0.5,
) -> DataFrame:
    """One-sided upward CUSUM changepoint detector (Page, Biometrika
    1954) over each key's daily series — the sequential shift monitor
    a revenue/volume pipeline runs after the smoothing family
    (ewma/holt forecast; CUSUM decides WHEN the level actually moved):

        S_1 = max(0, x_1 − t),  S_k = max(0, S_{k−1} + (x_k − t)),
        t = μ + slack_frac·μ,   alarm_k = S_k > threshold_frac·μ

    with μ the key's own daily mean (decimal-accumulated, so both
    engines and any partitioning agree exactly). Same scalar-state
    fold shape as holt_daily: one shuffle to daily grain, one to
    per-key calendar-bounded arrays, JVM-side ``aggregate`` over the
    sorted prefix; the slack/threshold arithmetic is kept as the
    literal expression tree μ + frac·μ so the oracle's doubles are
    bit-identical. Returns (key, day, day_value, cusum, alarm)."""
    daily = df.groupBy(
        F.col(key_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(dsum(val_col, 6).alias("v"))
    mu = daily.groupBy(key_col).agg(
        (
            F.sum(F.round(F.col("v"), 6).cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mu")
    )
    series = (
        daily.groupBy(key_col)
        .agg(F.array_sort(F.collect_list(F.struct("day", "v"))).alias("s"))
        .join(mu, key_col)
    )
    pos = series.select(
        key_col, "s", "mu", F.posexplode("s").alias("__k", "__x")
    )
    target = F.col("mu") + F.lit(float(slack_frac)) * F.col("mu")

    def step(acc, x):
        return F.greatest(F.lit(0.0), acc + (x["v"] - target))

    state = F.aggregate(
        F.slice(F.col("s"), F.lit(2), F.col("__k")),
        F.greatest(
            F.lit(0.0), F.element_at(F.col("s"), 1)["v"] - target
        ),
        step,
    )
    return pos.select(
        key_col,
        F.col("__x")["day"].alias("day"),
        F.col("__x")["v"].alias("day_value"),
        state.alias("cusum"),
        (state > F.lit(float(threshold_frac)) * F.col("mu")).alias("alarm"),
    )


def theil_sen_slope(
    df: DataFrame,
    key_col: str = "series",
    x_col: str = "m",
    y_col: str = "v",
) -> DataFrame:
    """Theil–Sen robust trend slope per series: the median of all
    pairwise slopes (y_j − y_i)/(x_j − x_i), i < j — the
    outlier-resistant alternative to a29's least-squares slope (one
    wild month barely moves it; breakdown point ≈ 29%). The estimator
    a revenue-trend dashboard wants when promotions/backfills spike
    single buckets.

    BOUNDEDNESS — this is an O(T²)-per-series pair expansion and is
    only correct to run at BUCKET grain: T is the time-spine length
    (months/days), so pairs are spine²-sized and CONSTANT in data
    scale (84 months → 3.5k pairs per series at any SF). Never feed
    raw observations; aggregate to buckets first (the same population
    contract as l28's basket cap).

    Exactness: y values arrive as deterministic doubles (dsum exact
    decimal accumulation upstream), x as integers; each slope is
    (ONE subtraction)/(ONE subtraction) in IEEE; the median picks the
    middle one-or-two rows by slope order via row_number — the
    two-value mean is commutative, so no ordering hazard — and equal
    slopes make any tie order value-identical.

    Spark shape: the pair expansion is a self-equi-join on
    ``key_col`` (series-partitioned; the x_j > x_i predicate filters
    inside the join), one per-series window for (rank, count), and
    one final 1-or-2-row mean agg. Returns (``key_col``, n_points,
    n_pairs, ts_slope).
    """
    from pyspark.sql import Window

    # the bucket-grain input is referenced three times (both pair
    # sides + n_points) — checkpoint so its upstream join/agg lineage
    # runs once (PERF.md round 9); it is spine-sized by contract
    df = df.select(key_col, x_col, y_col).localCheckpoint(eager=True)
    a = df.select(
        key_col,
        F.col(x_col).cast("bigint").alias("xa"),
        F.col(y_col).cast("double").alias("ya"),
    )
    b = df.select(
        key_col,
        F.col(x_col).cast("bigint").alias("xb"),
        F.col(y_col).cast("double").alias("yb"),
    )
    pairs = a.join(b, key_col).filter(F.col("xb") > F.col("xa")).select(
        key_col,
        (
            (F.col("yb") - F.col("ya"))
            / (F.col("xb") - F.col("xa")).cast("double")
        ).alias("slope"),
    )
    w = Window.partitionBy(key_col).orderBy("slope")
    ranked = pairs.select(
        key_col,
        "slope",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy(key_col))
        .cast("bigint")
        .alias("np"),
    )
    med = (
        ranked.filter(
            (F.col("rn") == F.expr("(np + 1) DIV 2"))
            | (F.col("rn") == F.expr("(np + 2) DIV 2"))
        )
        .groupBy(key_col, "np")
        .agg(F.avg("slope").alias("ts_slope"))
    )
    npts = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )
    return med.join(F.broadcast(npts), key_col).select(
        key_col,
        "n_points",
        F.col("np").alias("n_pairs"),
        "ts_slope",
    )


def acf_integer(
    counts: DataFrame,
    key_col: str = "series",
    order_col: str = "day",
    value_col: str = "x",
    max_lag: int = 6,
) -> DataFrame:
    """Sample autocorrelation function per series over an INTEGER
    value column (e.g. daily event counts) at lags 1..``max_lag`` —
    the seasonality/burstiness diagnostic run before fitting t10/t12's
    smoothers. Standard estimator r_k = Σ(x_t−x̄)(x_{t−k}−x̄) /
    Σ(x_t−x̄)², evaluated at sequence positions (row_number over
    ``order_col`` — calendar gaps are treated as adjacent
    observations; gap-fill upstream if strict calendar lags matter).

    Cross-engine exactness: multiplying through by n² turns both sums
    into INTEGER arithmetic — r_k = Σ(n·x_t−S)(n·x_{t−k}−S) /
    Σ(n·x_t−S)² with S = Σx — so the only float op is the final
    division. BIGINT bounds: |n·x−S| ≤ n·max(x), so the denominator
    needs n³·max(x)² < 2⁶³ — at 10⁵ points of 10⁹-sized counts switch
    the products to DECIMAL(38,0).

    Spark shape: one agg for (S, n), one broadcast-joined centering
    projection, a row_number window per series, and the lag pairing as
    an equi-join on (series, idx−lag) against the broadcast lag spine
    — no range predicates, no BNL on data-sized frames. Returns
    (``key_col``, lag, n_pairs, acf).
    """
    from pyspark.sql import Window

    spark = counts.sparkSession
    w = Window.partitionBy(key_col).orderBy(order_col)
    idx = counts.select(
        key_col,
        F.col(value_col).cast("bigint").alias("x"),
        F.row_number().over(w).cast("bigint").alias("i"),
    )
    stats = idx.groupBy(key_col).agg(
        F.sum("x").alias("S"), F.count(F.lit(1)).alias("n")
    )
    # referenced three times below (den, both sides of the lag
    # pairing) — checkpoint or the agg+window lineage re-executes per
    # reference (PERF.md round 9); the frame is per-(series, bucket)
    # sized, orders of magnitude below the raw event stream
    c = (
        idx.join(stats, key_col)
        .select(
            key_col, "i", (F.col("n") * F.col("x") - F.col("S")).alias("c")
        )
        .localCheckpoint(eager=True)
    )
    den = c.groupBy(key_col).agg(
        F.sum(F.col("c") * F.col("c")).alias("den")
    )
    lags = spark.range(1, max_lag + 1).select(F.col("id").alias("lag"))
    num = (
        c.alias("a")
        .crossJoin(F.broadcast(lags))
        .join(
            c.alias("b"),
            (F.col(f"a.{key_col}") == F.col(f"b.{key_col}"))
            & (F.col("b.i") == F.col("a.i") - F.col("lag")),
        )
        .groupBy(F.col(f"a.{key_col}").alias(key_col), "lag")
        .agg(
            F.sum(F.col("a.c") * F.col("b.c")).alias("num"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    # a CONSTANT series has den = 0 — drop it rather than divide
    # (IEEE 0/0 = NaN on Spark vs NULL on ANSI-SQL engines)
    return (
        num.join(den, key_col)
        .filter(F.col("den") > 0)
        .select(
            key_col,
            "lag",
            "n_pairs",
            (
                F.col("num").cast("double") / F.col("den").cast("double")
            ).alias("acf"),
        )
    )


def xcorr_integer(
    a: DataFrame,
    b: DataFrame,
    order_col: str = "day",
    value_col: str = "x",
    max_lag: int = 3,
) -> DataFrame:
    """Sample cross-correlation between two INTEGER series at lags
    −``max_lag``..+``max_lag`` — the lead/lag diagnostic (do clicks
    lead purchases, and by how many days?):
    r_k = Σ(a_t−ā)(b_{t−k}−b̄) / sqrt(Σ(a−ā)²·Σ(b−b̄)²), positive k
    meaning b LEADS a by k steps. Series align on their COMMON
    ``order_col`` values (inner join), indexed by sequence position;
    gap-fill upstream for strict calendar lags.

    Exactness: the same n-scaled centering as :func:`acf_integer`
    keeps every sum INTEGER (the n² factors cancel between numerator
    and the sqrt of the denominator product), so the only float ops
    are one multiply, one sqrt and one division per output row.

    Spark shape: one inner join on ``order_col``, one 1-row stats
    broadcast, one row_number window, the lag pairing as an equi-join
    against the broadcast lag spine. Returns (lag, n_pairs, xcorr).
    """
    from pyspark.sql import Window

    spark = a.sparkSession
    joined = (
        a.select(order_col, F.col(value_col).cast("bigint").alias("va"))
        .join(
            b.select(
                order_col, F.col(value_col).cast("bigint").alias("vb")
            ),
            order_col,
        )
    )
    idx = joined.select(
        "va",
        "vb",
        F.row_number()
        .over(Window.orderBy(order_col))
        .cast("bigint")
        .alias("i"),
    )
    stats = idx.agg(
        F.sum("va").alias("Sa"),
        F.sum("vb").alias("Sb"),
        F.count(F.lit(1)).alias("n"),
    )
    # referenced by both lag sides and the denominator — checkpoint;
    # the frame is one row per common bucket
    c = (
        idx.join(F.broadcast(stats))
        .select(
            "i",
            (F.col("n") * F.col("va") - F.col("Sa")).alias("ca"),
            (F.col("n") * F.col("vb") - F.col("Sb")).alias("cb"),
        )
        .localCheckpoint(eager=True)
    )
    den = c.agg(
        F.sum(F.col("ca") * F.col("ca")).alias("da"),
        F.sum(F.col("cb") * F.col("cb")).alias("db"),
    )
    lags = spark.range(-max_lag, max_lag + 1).select(
        F.col("id").alias("lag")
    )
    num = (
        c.alias("p")
        .crossJoin(F.broadcast(lags))
        .join(
            c.alias("q"),
            F.col("q.i") == F.col("p.i") - F.col("lag"),
        )
        .groupBy("lag")
        .agg(
            F.sum(F.col("p.ca") * F.col("q.cb")).alias("num"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    return (
        num.join(F.broadcast(den))
        .filter((F.col("da") > 0) & (F.col("db") > 0))
        .select(
            "lag",
            "n_pairs",
            (
                F.col("num").cast("double")
                / F.sqrt(F.col("da").cast("double") * F.col("db").cast("double"))
            ).alias("xcorr"),
        )
    )


def km_survival(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_pred: "F.Column | None" = None,
) -> DataFrame:
    """Kaplan–Meier survival curve with right-censoring — the
    lead-conversion / retention analysis a CRM dashboard layers over
    the funnel (reference scope: the lead pipeline of
    Lead_Ingestion_CRM_SQLite.py feeds exactly this question — how
    long until a lead converts, counting leads that never did):
    per user, duration = days from first activity to the FIRST event
    matching ``event_pred`` (default: event_type == 'purchase');
    users without one are CENSORED at their last observed activity.
    Ŝ(t) = Π_{t_j ≤ t} (1 − d_j/n_j) over event times, censored
    durations leaving the risk set between steps.

    Cross-engine exactness: d_j and the risk set n_j are integers
    (n_j = N − |durations < t_j| via one cumulative window); each
    factor enters as round-12 ln(1 − d/n) summed in DECIMAL(28,12),
    so the log-survival is engine-exact and Ŝ = exp(log_surv) agrees
    to well past the 6-dp compare. A step that exhausts the risk set
    (d = n: ln 0 diverges, and Spark log() returns NULL where ANSI
    engines return −inf) is emitted explicitly as survival 0 /
    log_surv NULL, and so is everything after it.

    Plan shape: one per-user agg, one t-grain agg, two unpartitioned
    cumulative windows over the DURATION GRID (rows = distinct
    observed durations in days — observation-span-sized, never
    corpus-sized; partition by cohort upstream if curves per segment
    are wanted). Returns (t_days, n_risk, n_events, log_surv,
    survival), one row per event time."""
    from pyspark.sql import Window

    pred = (
        event_pred
        if event_pred is not None
        else (F.col("event_type") == "purchase")
    )
    per = df.groupBy(user_col).agg(
        F.min(ts_col).alias("__t0"),
        F.min(F.when(pred, F.col(ts_col))).alias("__tp"),
        F.max(ts_col).alias("__tl"),
    )
    obs = per.select(
        F.coalesce(
            F.datediff(F.col("__tp").cast("date"), F.col("__t0").cast("date")),
            F.datediff(F.col("__tl").cast("date"), F.col("__t0").cast("date")),
        )
        .cast("bigint")
        .alias("t_days"),
        F.when(F.col("__tp").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("__ev"),
    )
    grid = obs.groupBy("t_days").agg(
        F.count(F.lit(1)).alias("__m"),
        F.sum("__ev").cast("bigint").alias("n_events"),
    )
    total = obs.agg(F.count(F.lit(1)).alias("__N"))
    before = (
        Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, -1)
    )
    upto = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    staged = (
        grid.join(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("__N")
            - F.coalesce(F.sum("__m").over(before), F.lit(0)).cast("bigint"),
        )
        .filter(F.col("n_events") > 0)
    )
    # the window frames below run over the FILTERED event-time rows;
    # n_risk already accounted for censored durations via __m above
    d = F.col("n_events").cast("double")
    n = F.col("n_risk").cast("double")
    term = F.when(
        F.col("n_events") < F.col("n_risk"),
        F.round(F.log(F.lit(1.0) - d / n), 12).cast("decimal(28,12)"),
    )
    w2 = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, 0)
    staged = staged.select(
        "t_days",
        "n_risk",
        "n_events",
        F.sum(term).over(w2).alias("__cum"),
        F.max(
            F.when(F.col("n_events") == F.col("n_risk"), 1).otherwise(0)
        )
        .over(w2)
        .alias("__exhausted"),
    )
    return staged.select(
        "t_days",
        "n_risk",
        "n_events",
        F.when(F.col("__exhausted") == 0, F.col("__cum").cast("double"))
        .alias("log_surv"),
        F.when(
            F.col("__exhausted") == 0, F.exp(F.col("__cum").cast("double"))
        )
        .otherwise(F.lit(0.0))
        .alias("survival"),
    )
