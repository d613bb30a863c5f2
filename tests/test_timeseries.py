"""Unit tests for the hypertable-style OHLC downsample rollup."""

from __future__ import annotations

import datetime as dt

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
    ohlc_downsample,
)

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, value double"


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


def test_ohlc_bars_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # user 1, bucket 00:00–00:05
            (1, _ts(0, 30), 1, 10.0),
            (2, _ts(2), 1, 30.0),
            (3, _ts(4, 59), 1, 20.0),
            # user 1, next bucket
            (4, _ts(5), 1, 5.0),
            # user 2 shares the first bucket
            (5, _ts(1), 2, 7.0),
        ],
        SCHEMA,
    )
    rows = {
        (r["user_id"], r["bucket_start"].minute): r
        for r in ohlc_downsample(df, bucket="5 minutes").collect()
    }
    b = rows[(1, 0)]
    assert (b["open_val"], b["high_val"], b["low_val"], b["close_val"]) == (
        10.0,
        30.0,
        10.0,
        20.0,
    )
    assert b["n_events"] == 3 and b["volume"] == 60.0
    assert rows[(1, 5)]["open_val"] == rows[(1, 5)]["close_val"] == 5.0
    assert rows[(2, 0)]["n_events"] == 1


def test_ohlc_tie_breaks_on_sequence(spark):
    # two events at the identical timestamp: lower event_id is "first"
    df = spark.createDataFrame(
        [(10, _ts(1), 1, 100.0), (9, _ts(1), 1, 50.0), (11, _ts(3), 1, 70.0)],
        SCHEMA,
    )
    row = ohlc_downsample(df, bucket="5 minutes").collect()[0]
    assert row["open_val"] == 50.0   # event_id 9 wins the tie
    assert row["close_val"] == 70.0


def test_gap_fill_daily_forward_fills_gaps(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        gap_fill_daily,
    )
    import datetime as dt

    rows = [
        ("a", dt.datetime(2024, 1, 1, 10), 5.0),
        ("a", dt.datetime(2024, 1, 1, 11), 7.0),
        ("a", dt.datetime(2024, 1, 4, 9), 1.0),   # 2-day gap before
        ("b", dt.datetime(2024, 1, 2, 8), 2.0),   # starts after span lo
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {(r["k"], str(r["day"])): r for r in gap_fill_daily(df, "k").collect()}
    # spine covers the full span for BOTH keys: 4 days x 2 keys
    assert len(out) == 8
    a2 = out[("a", "2024-01-02")]
    assert a2["n_events"] == 0 and a2["day_value"] is None
    assert a2["filled_value"] == 12.0          # carried from Jan 1
    assert out[("a", "2024-01-04")]["filled_value"] == 1.0  # real observation wins
    # key b has no observation on day 1: filled stays NULL before first
    assert out[("b", "2024-01-01")]["filled_value"] is None
    assert out[("b", "2024-01-03")]["filled_value"] == 2.0


def test_gap_fill_daily_partition_invariant(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        gap_fill_daily,
    )
    import datetime as dt

    rows = [
        (f"k{i % 5}", dt.datetime(2024, 1, 1 + (i * 3) % 20, i % 24), float(i))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    a = sorted(map(tuple, gap_fill_daily(df.repartition(2), "k").collect()))
    b = sorted(map(tuple, gap_fill_daily(df.repartition(13), "k").collect()))
    assert a == b


def test_ewma_daily_hand_computed(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        ewma_daily,
    )
    import datetime as dt

    rows = [
        ("a", dt.datetime(2024, 1, 1, 9), 10.0),
        ("a", dt.datetime(2024, 1, 1, 10), 10.0),  # day 1 total 20
        ("a", dt.datetime(2024, 1, 2, 9), 8.0),
        ("a", dt.datetime(2024, 1, 3, 9), 4.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {str(r["day"]): r for r in ewma_daily(df, "k", alpha=0.5).collect()}
    assert out["2024-01-01"]["ewma"] == 20.0          # s1 = x1
    assert out["2024-01-02"]["ewma"] == 14.0          # 0.5*20 + 0.5*8
    assert out["2024-01-03"]["ewma"] == 9.0           # 0.5*14 + 0.5*4
    assert out["2024-01-02"]["day_value"] == 8.0


def test_ewma_daily_partition_invariant(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        ewma_daily,
    )
    import datetime as dt

    rows = [
        (f"k{i % 4}", dt.datetime(2024, 1, 1 + i % 15, i % 24), float(i % 37))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    a = sorted(map(tuple, ewma_daily(df.repartition(2), "k").collect()))
    b = sorted(map(tuple, ewma_daily(df.repartition(11), "k").collect()))
    assert a == b


def test_holt_daily_matches_python_fold(spark):
    from pyspark.sql import functions as F
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        holt_daily,
    )

    rows = [
        ("s", f"2024-01-{d:02d} 00:00:00", float(v))
        for d, v in [(1, 10.0), (2, 20.0), (3, 15.0), (4, 30.0)]
    ]
    df = spark.createDataFrame(rows, "series string, ts string, value double").select(
        "series", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    got = {
        r["day"].day: (r["level"], r["trend"], r["forecast"])
        for r in holt_daily(df, key_col="series").collect()
    }
    l, b = 10.0, 0.0
    ref = {1: (l, b, l + b)}
    for day, x in [(2, 20.0), (3, 15.0), (4, 30.0)]:
        lk = 0.3 * x + (1.0 - 0.3) * (l + b)
        b = 0.2 * (lk - l) + (1.0 - 0.2) * b
        l = lk
        ref[day] = (l, b, l + b)
    assert set(got) == set(ref)
    for d in ref:
        for i in range(3):
            assert abs(got[d][i] - ref[d][i]) < 1e-12


def test_holt_winters_matches_python_fold(spark):
    from pyspark.sql import functions as F
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        holt_winters_daily,
    )

    # 10 days so the 7-day seasonal queue wraps at least once
    vals = [10.0, 20.0, 15.0, 30.0, 12.0, 18.0, 25.0, 11.0, 22.0, 16.0]
    rows = [
        ("s", f"2024-01-{d + 1:02d} 00:00:00", v) for d, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "series string, ts string, value double").select(
        "series", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    got = {
        r["day"].day: (r["level"], r["trend"], r["seasonal"], r["forecast"])
        for r in holt_winters_daily(df, key_col="series").collect()
    }
    a, b_, g, m = 0.3, 0.2, 0.3, 7
    l, b = vals[0], 0.0
    seas = [0.0] * m
    ref = {1: (l, b, seas[-1], l + b + seas[0])}
    for k, x in enumerate(vals[1:], start=2):
        s_old = seas[0]
        lk = a * (x - s_old) + (1.0 - a) * (l + b)
        sk = g * (x - lk) + (1.0 - g) * s_old
        b = b_ * (lk - l) + (1.0 - b_) * b
        l = lk
        seas = seas[1:] + [sk]
        ref[k] = (l, b, seas[-1], l + b + seas[0])
    assert set(got) == set(ref)
    for d in ref:
        for i in range(4):
            assert abs(got[d][i] - ref[d][i]) < 1e-12, (d, i)


def test_holt_winters_recovers_weekly_pattern(spark):
    from pyspark.sql import functions as F
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        holt_winters_daily,
    )

    # pure period-7 signal: seasonal estimates must converge toward the
    # weekly offsets while trend stays near zero
    pattern = [0.0, 10.0, 20.0, 5.0, 15.0, 25.0, 30.0]
    vals = pattern * 6
    rows = []
    for d, v in enumerate(vals):
        day = d + 1
        rows.append(
            ("s", f"2024-{(day - 1) // 28 + 1:02d}-{(day - 1) % 28 + 1:02d} 00:00:00",
             100.0 + v)
        )
    df = spark.createDataFrame(rows, "series string, ts string, value double").select(
        "series", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = sorted(
        holt_winters_daily(df, key_col="series").collect(),
        key=lambda r: r["day"],
    )
    last_week = out[-7:]
    offsets = [r["seasonal"] for r in last_week]
    # seasonal spread should reflect the pattern's spread (30), not 0
    assert max(offsets) - min(offsets) > 15.0
    assert abs(out[-1]["trend"]) < 2.0


def test_cusum_daily_matches_python_fold_and_detects_shift(spark):
    """Planted level shift: 10 quiet days at ~100 then 5 days at 200.
    The CUSUM must stay unalarmed through the noise, accumulate after
    the shift, and match the literal python fold bit-for-bit
    (including the μ + 0.05·μ expression shape)."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        cusum_daily,
    )

    vals = [100.0, 102.0, 98.0, 101.0, 99.0, 100.0, 103.0, 97.0, 100.0,
            100.0, 200.0, 200.0, 200.0, 200.0, 200.0]
    rows = [
        ("k", f"2025-01-{d + 1:02d} 12:00:00", v)
        for d, v in enumerate(vals)
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "series string, ts_s string, value double")
    out = cusum_daily(
        df.select("series", F.to_timestamp("ts_s").alias("ts"), "value"),
        key_col="series",
    ).orderBy("day").collect()
    mu = sum(vals) / len(vals)
    target = mu + 0.05 * mu
    s, expect = 0.0, []
    for v in vals:
        s = max(0.0, s + (v - target))
        expect.append((s, s > 0.5 * mu))
    assert [(r["cusum"], r["alarm"]) for r in out] == expect
    # quiet days never alarm; the shift does
    assert not any(a for _, a in expect[:10])
    assert expect[-1][1]


def test_acf_integer_hand_computed(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        acf_integer,
    )

    # series x = [1,2,3] (by day): centered n·x−S = [-3, 0, 3],
    # den = 18; r1 = (0·-3 + 3·0)/18 = 0; r2 = (3·-3)/18 = -0.5
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("a", 3, 3)],
        "series string, day int, x bigint",
    )
    rows = {r["lag"]: r for r in acf_integer(df, max_lag=2).collect()}
    assert rows[1]["acf"] == 0.0 and rows[1]["n_pairs"] == 2
    assert rows[2]["acf"] == -0.5 and rows[2]["n_pairs"] == 1


def test_acf_integer_constant_series_dropped(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        acf_integer,
    )

    df = spark.createDataFrame(
        [("k", 1, 5), ("k", 2, 5), ("k", 3, 5)],
        "series string, day int, x bigint",
    )
    # den = 0 -> no rows rather than a cross-engine NaN/NULL split
    assert acf_integer(df, max_lag=2).count() == 0


def test_acf_integer_alternating_is_negative_at_lag1(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        acf_integer,
    )

    # perfect alternation has strongly negative lag-1 autocorrelation
    data = [("s", d, 10 if d % 2 == 0 else 0) for d in range(1, 9)]
    df = spark.createDataFrame(data, "series string, day int, x bigint")
    rows = {r["lag"]: r for r in acf_integer(df, max_lag=2).collect()}
    assert rows[1]["acf"] < -0.8
    assert rows[2]["acf"] > 0.7


def test_xcorr_integer_detects_known_lead(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        xcorr_integer,
    )

    # b is a 2-step-advanced copy of a (both share the same day grid):
    # a_t = base[t], b_t = base[t+2] -> a at i correlates with b at
    # i-2, i.e. lag +2 ("b leads a by 2") peaks at exactly 1.0
    base = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    n = 10
    a = spark.createDataFrame(
        [(d, base[d]) for d in range(n)], "day int, x bigint"
    )
    b = spark.createDataFrame(
        [(d, base[d + 2]) for d in range(n)], "day int, x bigint"
    )
    rows = {r["lag"]: r for r in xcorr_integer(a, b, max_lag=3).collect()}
    assert set(rows) == {-3, -2, -1, 0, 1, 2, 3}
    # NOTE: not exactly 1.0 — the overlapping window re-centers with
    # the full-series means — but the peak must be at lag +2
    best = max(rows.values(), key=lambda r: r["xcorr"])
    assert best["lag"] == 2
    assert rows[2]["n_pairs"] == n - 2


def test_xcorr_integer_self_correlation_is_one_at_zero(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        xcorr_integer,
    )

    a = spark.createDataFrame(
        [(d, v) for d, v in enumerate([1, 5, 2, 8, 3, 9, 4])],
        "day int, x bigint",
    )
    rows = {r["lag"]: r for r in xcorr_integer(a, a, max_lag=1).collect()}
    assert rows[0]["xcorr"] == 1.0
    assert rows[0]["n_pairs"] == 7


def test_km_survival_hand_computed_with_censoring(spark):
    import datetime
    import math

    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        km_survival,
    )

    d0 = datetime.datetime(2024, 1, 1)

    def ev(uid, day, etype):
        return (uid, d0 + datetime.timedelta(days=day), etype)

    # textbook fixture: durations 1(event) 2(censored) 3(event)
    # 4(censored) 5(event)
    rows = [
        ev(1, 0, "signup"), ev(1, 1, "purchase"),
        ev(2, 0, "signup"), ev(2, 2, "view"),
        ev(3, 0, "signup"), ev(3, 3, "purchase"),
        ev(4, 0, "signup"), ev(4, 4, "view"),
        ev(5, 0, "signup"), ev(5, 5, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    got = {r["t_days"]: r for r in km_survival(df).collect()}
    assert set(got) == {1, 3, 5}
    # t=1: n=5 d=1 -> S=0.8; t=3: n=3 d=1 -> S=0.8*(2/3); t=5: n=1
    # d=1 -> risk set exhausts: survival 0, log NULL
    assert got[1]["n_risk"] == 5 and got[1]["n_events"] == 1
    assert math.isclose(got[1]["survival"], 0.8, rel_tol=1e-9)
    assert got[3]["n_risk"] == 3
    assert math.isclose(got[3]["survival"], 0.8 * (2 / 3), rel_tol=1e-6)
    assert got[5]["n_risk"] == 1
    assert got[5]["survival"] == 0.0 and got[5]["log_surv"] is None


def test_km_survival_all_censored_emits_no_steps(spark):
    import datetime

    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        km_survival,
    )

    d0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, d0, "signup"),
        (1, d0 + datetime.timedelta(days=3), "view"),
        (2, d0, "signup"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    assert km_survival(df).count() == 0


def test_seasonal_decompose_constant_series(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        seasonal_decompose_daily,
    )
    import datetime as dt

    rows = [("s", dt.date(2024, 1, 1) + dt.timedelta(days=i), 5)
            for i in range(14)]
    df = spark.createDataFrame(rows, "series string, day date, x int")
    out = seasonal_decompose_daily(df).collect()
    # 14 days -> 8 full-window rows; constant series decomposes to
    # trend = y, seasonal = 0, resid = 0
    assert len(out) == 8
    assert all(r["trend"] == 5.0 and r["seasonal"] == 0.0
               and r["resid"] == 0.0 for r in out)


def test_seasonal_decompose_pure_weekly_signal_zero_resid(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        seasonal_decompose_daily,
    )
    import datetime as dt

    # period-7 impulse train: every full 7-day window sums to 7, so
    # trend = 1 everywhere and the dow means absorb the whole signal
    # -> residuals exactly 0
    base = dt.date(2024, 1, 1)  # a Monday
    rows = [("s", base + dt.timedelta(days=i), 7 if i % 7 == 0 else 0)
            for i in range(21)]
    df = spark.createDataFrame(rows, "series string, day date, x int")
    out = {r["day"]: r for r in seasonal_decompose_daily(df).collect()}
    assert len(out) == 15
    spike = out[base + dt.timedelta(days=7)]
    assert spike["dow"] == 0  # 2024-01-01 is a Monday
    assert spike["trend"] == 1.0
    assert spike["seasonal"] == 6.0
    assert spike["resid"] == 0.0
    quiet = out[base + dt.timedelta(days=8)]
    assert quiet["seasonal"] == -1.0 and quiet["resid"] == 0.0


def test_seasonal_decompose_gap_days_count_zero(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        seasonal_decompose_daily,
    )
    import datetime as dt

    base = dt.date(2024, 1, 1)
    # only the two endpoints observed -> the 8 interior days gap-fill
    # to 0 and the spine spans 10 days (4 full-window rows)
    df = spark.createDataFrame(
        [("s", base, 10), ("s", base + dt.timedelta(days=9), 10)],
        "series string, day date, x int",
    )
    out = {r["day"]: r for r in seasonal_decompose_daily(df).collect()}
    assert len(out) == 4
    # all full-window days are gap days (y = 0); the two interior
    # ones whose window avoids both endpoints have zero trend too
    assert all(r["y"] == 0 for r in out.values())
    assert out[base + dt.timedelta(days=4)]["trend"] == 0.0
    assert out[base + dt.timedelta(days=5)]["trend"] == 0.0
    # edge full-window days see one endpoint: trend = 10/7
    assert out[base + dt.timedelta(days=3)]["trend"] == 10.0 / 7.0


def test_seasonal_decompose_reconstruction_identity(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        seasonal_decompose_daily,
    )
    import datetime as dt

    base = dt.date(2024, 3, 4)
    rows = [("a", base + dt.timedelta(days=i), (i * 13) % 11 + (i % 7))
            for i in range(20)]
    df = spark.createDataFrame(rows, "series string, day date, x int")
    for r in seasonal_decompose_daily(df).collect():
        # resid is the float remainder; reconstruction re-associates,
        # so equality holds to rounding, not bit-exactly
        assert abs((r["trend"] + r["seasonal"] + r["resid"]) - r["y"]) < 1e-9


def test_theil_sen_robust_to_single_outlier(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        theil_sen_slope,
    )

    # unit-slope line with one wild bucket at x=2: pairwise slopes
    # are [-7, 1, 1, 1, 5, 9] -> median = (1+1)/2 = 1 — the outlier
    # does not move the estimate (OLS would report ~1.8)
    df = spark.createDataFrame(
        [("s", 0, 0.0), ("s", 1, 1.0), ("s", 2, 10.0), ("s", 3, 3.0)],
        "series string, m int, v double",
    )
    rows = theil_sen_slope(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["ts_slope"] == 1.0
    assert r["n_points"] == 4 and r["n_pairs"] == 6


def test_theil_sen_odd_pair_count_exact_median(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        theil_sen_slope,
    )

    # slopes [2, 1, 0] -> odd count, median is the single middle 1
    df = spark.createDataFrame(
        [("s", 0, 0.0), ("s", 1, 2.0), ("s", 2, 2.0)],
        "series string, m int, v double",
    )
    assert theil_sen_slope(df).collect()[0]["ts_slope"] == 1.0


def test_theil_sen_per_series_isolation(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        theil_sen_slope,
    )

    df = spark.createDataFrame(
        [("up", 0, 0.0), ("up", 1, 3.0), ("up", 2, 6.0),
         ("down", 0, 6.0), ("down", 1, 3.0), ("down", 2, 0.0)],
        "series string, m int, v double",
    )
    got = {r["series"]: r["ts_slope"] for r in theil_sen_slope(df).collect()}
    assert got == {"up": 3.0, "down": -3.0}


def test_theil_sen_gaps_in_x_use_true_distance(spark):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.timeseries import (
        theil_sen_slope,
    )

    # x jumps 0 -> 10: slope uses the real Δx, not sequence position
    df = spark.createDataFrame(
        [("s", 0, 0.0), ("s", 10, 20.0)],
        "series string, m int, v double",
    )
    r = theil_sen_slope(df).collect()[0]
    assert r["ts_slope"] == 2.0 and r["n_pairs"] == 1
