"""sharded_topk: the shard-pruned global top-k must equal the naive
single-window form for any input, and its final sort must only ever see
≤ n_shards·k rows."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.partitioning import (
    sharded_topk,
)


def _naive_topk(df, k, order_by):
    w = Window.orderBy(*order_by)
    return (
        df.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
    )


def test_sharded_topk_equals_naive(spark):
    df = spark.range(0, 5000).select(
        F.col("id").alias("node"),
        F.pmod(F.xxhash64("id"), F.lit(997)).cast("double").alias("rank"),
    )
    order = [F.desc("rank"), F.asc("node")]
    got = sorted(
        sharded_topk(df, k=100, order_by=order).collect(),
        key=lambda r: r["rnk"],
    )
    want = sorted(_naive_topk(df, 100, order).collect(), key=lambda r: r["rnk"])
    assert [(r["node"], r["rank"], r["rnk"]) for r in got] == [
        (r["node"], r["rank"], r["rnk"]) for r in want
    ]


def test_sharded_topk_small_input_and_ties(spark):
    # fewer rows than k, with rank ties broken by the unique column
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 7.0)], "node bigint, rank double"
    )
    out = sharded_topk(
        df, k=100, order_by=[F.desc("rank"), F.asc("node")]
    ).collect()
    assert [(r["node"], r["rnk"]) for r in sorted(out, key=lambda r: r["rnk"])] == [
        (3, 1),
        (1, 2),
        (2, 3),
    ]


def test_sharded_topk_prunes_before_final_sort(spark):
    df = spark.range(0, 20000).select(
        F.col("id").alias("node"), (F.col("id") % 1000).cast("double").alias("rank")
    )
    plan = sharded_topk(
        df, k=10, order_by=[F.desc("rank"), F.asc("node")], n_shards=8
    )._jdf.queryExecution().executedPlan().toString()
    # the per-shard WindowGroupLimit prune must appear below the final
    # single-partition window
    assert plan.count("WindowGroupLimit") >= 1
