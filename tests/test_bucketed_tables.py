"""Bucketed co-located join: the join over two same-bucketed tables
must plan with NO shuffle exchange (the physical-layout win that
matters most at fact⋈fact scale)."""

from __future__ import annotations

import pytest

# round 16: slow tier — bucketed-table integration (catalog writes + plan pins) — layout feature unused by any gate query path
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    write_bucketed(li.withColumnRenamed("l_orderkey", "orderkey"),
                   "b_lineitem", ["orderkey"], 8, sort_cols=["orderkey"])
    write_bucketed(o.withColumnRenamed("o_orderkey", "orderkey"),
                   "b_orders", ["orderkey"], 8, sort_cols=["orderkey"])
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable AQE broadcast demotion of the test-size table so the plan
    # reflects the bucketed sort-merge path it would take at scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, ["orderkey"])
        agg = joined.groupBy("orderkey").agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        # correctness unchanged vs plain join
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet")
        expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expect
        # even the follow-up groupBy on the bucket key needs no exchange
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in agg_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")
