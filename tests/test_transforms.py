"""Unit tests for the scalar transform family (SURVEY.md §5 item 2) —
tiny literal DataFrames, edge cases from the reference's behavior."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.functions import (
    transforms as X,
)


def test_p8_multiformat_and_null_fallback(spark):
    df = spark.createDataFrame(
        [
            ("2025-08-01T09:30:00.000000Z",),
            ("2025-08-01T09:30:00.123Z",),
            ("2025-08-15",),
            ("not-a-date",),
            (None,),
        ],
        "raw string",
    )
    out = [r[0] for r in df.select(X.parse_multiformat_ts("raw")).collect()]
    assert out[0] == datetime.datetime(2025, 8, 1, 9, 30)
    assert out[1] == datetime.datetime(2025, 8, 1, 9, 30, 0, 123000)
    assert out[2] == datetime.datetime(2025, 8, 15)
    assert out[3] is None  # warn+NULL, never throws (ANSI-safe)
    assert out[4] is None


def test_p9_tz_convert_is_minus_6_in_2024(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 15, 12, 0, 0),)], "ts timestamp"
    )
    out = df.select(X.to_business_tz("ts")).collect()[0][0]
    assert out == datetime.datetime(2024, 1, 15, 6, 0, 0)


def test_p11_tags_empty_and_absent_to_null(spark):
    df = spark.createDataFrame(
        [(["a", "b"],), ([],), (None,)], "tags array<string>"
    )
    out = [r[0] for r in df.select(X.tags_to_csv("tags")).collect()]
    assert out == ["a,b", None, None]


def test_p12_bool_cast_null_preserving(spark):
    df = spark.createDataFrame([(True,), (False,), (None,)], "b boolean")
    out = [r[0] for r in df.select(X.bool_to_int("b")).collect()]
    assert out == [1, 0, None]


def test_p3_coalescing_extraction(spark):
    df = spark.createDataFrame(
        [('{"k": 5}',), ('{"other": 1}',), (None,)], "props string"
    )
    out = [
        r[0]
        for r in df.select(
            X.coalesce_nested(X.json_get_int("props", "$.k"), F.lit(-1))
        ).collect()
    ]
    assert out == [5, -1, -1]


def test_a4_ratio_zero_denominator_null(spark):
    df = spark.createDataFrame([(1, 0), (4, 2)], "num int, den int")
    out = [r[0] for r in df.select(X.ratio(F.col("num"), F.col("den"))).collect()]
    assert out == [None, 2.0]
