"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship dashboard query; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2
plus the training-data-pipeline extensions, each with a DuckDB oracle
unless the op is non-SQL-expressible (SimHash — rows-only by design,
see plans/extensions.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans import (
    analytics,
    extensions,
    measures,
    scalars,
    temporal,
    warehouse,
    windows,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 step 2): the manager-dashboard
    monthly funnel — events deduped by id, funnel stage counts and
    conversion ratios per month (A1 + A4 + A10 in one plan)."""
    ev = measures.t(spark, SMOKE_SF_DIR, "events")
    deduped = ev.dropDuplicates(["event_id"])
    monthly = (
        deduped.groupBy(F.date_trunc("month", "ts").alias("month_start"))
        .agg(
            F.countDistinct("user_id").alias("n_leads"),
            F.count(F.when(F.col("event_type") == "signup", 1)).alias("n_signup"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("n_view"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))).alias(
                "purchase_amount"
            ),
        )
    )
    return monthly.select(
        "*",
        F.try_divide(F.col("n_purchase"), F.col("n_click")).alias("purchase_vs_click"),
        F.try_divide(F.col("n_click"), F.col("n_view")).alias("click_vs_view"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(measures.QUERIES)
    out.update(analytics.QUERIES)
    out.update(scalars.QUERIES)
    out.update(temporal.QUERIES)
    out.update(windows.QUERIES)
    out.update(warehouse.QUERIES)
    out.update(extensions.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(measures.ORACLES)
    out.update(analytics.ORACLES)
    out.update(scalars.ORACLES)
    out.update(temporal.ORACLES)
    out.update(windows.ORACLES)
    out.update(warehouse.ORACLES)
    out.update(extensions.ORACLES)
    return out
