"""A15 — generated calendar dimension (SURVEY.md §2.3 A15, J1).

The reference maintains a Power BI "dynamic calendar" calculated table
(reference README.md:519). Here it is a generated DataFrame: a date
``sequence`` exploded JVM-side — no driver loop, no UDF — so it
broadcasts as a tiny dim into fact joins (J1) and gives gapless
month buckets for trend queries (A10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def calendar_dim(spark: SparkSession, start_col, end_col, source: DataFrame) -> DataFrame:
    """Build a day-grain calendar spanning [min(start_col), max(end_col)]
    of ``source``. Derived cols: year, month, day, month_start.
    """
    bounds = source.agg(
        F.to_date(F.min(start_col)).alias("d0"),
        F.to_date(F.max(end_col)).alias("d1"),
    )
    return (
        bounds.select(F.explode(F.sequence("d0", "d1")).alias("d"))
        .select(
            F.col("d"),
            F.year("d").cast("int").alias("year"),
            F.month("d").cast("int").alias("month"),
            F.dayofmonth("d").cast("int").alias("day"),
            F.trunc(F.col("d"), "month").alias("month_start"),
        )
    )
