"""Exact distributed global ranking (operators/ranking.py):
bit-equality with the single-task Window forms, NULL placement,
partition invariance, and the no-global-sort plan property."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.ranking import (
    global_dense_rank,
    global_row_number,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.measures import t

SF = "/root/testdata/sf0.001"


def test_global_row_number_equals_window_row_number(spark):
    o = t(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    got = {
        r["o_orderkey"]: r["rn"]
        for r in global_row_number(
            o, "o_totalprice", tiebreaks=["o_orderkey"], n_buckets=7
        ).collect()
    }
    want = {
        r["o_orderkey"]: r["rn"]
        for r in o.select(
            "o_orderkey",
            F.row_number()
            .over(Window.orderBy("o_totalprice", "o_orderkey"))
            .cast("bigint")
            .alias("rn"),
        ).collect()
    }
    assert got == want


def test_global_row_number_nulls_first_and_ties(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 5.0), (4, 1.0), (5, None)],
        "id int, v double",
    )
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(df, "v", tiebreaks=["id"], n_buckets=3).collect()
    }
    assert got == {2: 1, 5: 2, 4: 3, 1: 4, 3: 5}


def test_global_row_number_partition_invariant(spark):
    o = t(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    a = sorted(
        map(tuple, global_row_number(
            o.repartition(3), "o_totalprice", tiebreaks=["o_orderkey"]
        ).collect())
    )
    b = sorted(
        map(tuple, global_row_number(
            o.repartition(13), "o_totalprice", tiebreaks=["o_orderkey"]
        ).collect())
    )
    assert a == b


def test_global_row_number_plan_no_single_task_sort(spark):
    """The point of the operator: no global Sort and no unpartitioned
    Window anywhere in the physical plan — ranking runs as per-bucket
    windows behind a broadcast of cut points and offsets."""
    o = t(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    plan = (
        global_row_number(o, "o_totalprice", tiebreaks=["o_orderkey"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan.lower(), plan
    # windows exist, but every one is keyed on the bucket column
    for line in plan.splitlines():
        if "Window" in line and "windowGroupLimit" not in line:
            assert "__gr_b" in line, line


def test_global_dense_rank_equals_window_dense_rank(spark):
    ev = t(spark, SF, "events").select("event_id", "value")
    vals = ev.select(F.round("value", 0).alias("v"), "event_id")
    got = {
        r["event_id"]: r["rank"]
        for r in global_dense_rank(vals, "v", n_buckets=5).collect()
    }
    want = {
        r["event_id"]: r["rank"]
        for r in vals.select(
            "event_id",
            F.dense_rank().over(Window.orderBy("v")).cast("bigint").alias("rank"),
        ).collect()
    }
    assert got == want


def test_tie_split_exact_on_heavy_skew(spark):
    """A 90%-constant order column: tie_split=True must still produce
    the EXACT global row_number while spreading the tie mass across
    buckets (no bucket holds more than half the rows), with no
    rangepartitioning in the plan."""
    rows = [(i, 5.0 if i % 10 else float(i % 7)) for i in range(4000)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    ranked = global_row_number(
        df, "v", tiebreaks=["id"], n_buckets=8, tie_split=True
    )
    got = {r["id"]: r["rn"] for r in ranked.collect()}
    want = {
        r["id"]: r["rn"]
        for r in df.select(
            "id",
            F.row_number()
            .over(Window.orderBy("v", "id"))
            .cast("bigint")
            .alias("rn"),
        ).collect()
    }
    assert got == want
    # the tie mass actually spread: rebuild the internal bucket ids
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.ranking import (
        _composite_bucket,
    )

    sizes = [
        r["n"]
        for r in _composite_bucket(df, "v", "id", 8, 10000)
        .groupBy("__gr_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert max(sizes) < 2000, sizes
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), plan


def test_tie_split_equals_default_without_heavy_values(spark):
    o = t(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    a = {
        r["o_orderkey"]: r["rn"]
        for r in global_row_number(
            o, "o_totalprice", tiebreaks=["o_orderkey"], n_buckets=7
        ).collect()
    }
    b = {
        r["o_orderkey"]: r["rn"]
        for r in global_row_number(
            o, "o_totalprice", tiebreaks=["o_orderkey"], n_buckets=7,
            tie_split=True,
        ).collect()
    }
    assert a == b


def test_tie_split_null_order_and_null_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 3.0), (2, None, 1.0), (3, 5.0, None), (4, 5.0, 1.0),
         (5, 1.0, 9.0)],
        "id int, v double, tb double",
    )
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(
            df, "v", tiebreaks=["tb", "id"], n_buckets=3, tie_split=True
        ).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.select(
            "id",
            F.row_number()
            .over(Window.orderBy(
                F.col("v").asc_nulls_first(),
                F.col("tb").asc_nulls_first(),
                "id",
            ))
            .cast("bigint")
            .alias("rn"),
        ).collect()
    }
    assert got == want


def test_global_dense_rank_pair_equals_packed_key(spark):
    """The overflow-safe pair form must order exactly like the packed
    bigint r1*(R+1)+coalesce(r2,0): r1 asc, then r2 asc NULLs first."""
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.ranking import (
        global_dense_rank_pair,
    )

    rows = [
        (1, 3, 7), (2, 3, None), (3, 1, 2), (4, 3, 7), (5, 1, None),
        (6, 2, 1), (7, 1, 2), (8, 2, None),
    ]
    df = spark.createDataFrame(rows, "id int, r1 bigint, r2 bigint")
    got = {
        r["id"]: r["rank"]
        for r in global_dense_rank_pair(df, "r1", "r2", n_buckets=3).collect()
    }
    packed = df.withColumn(
        "__k", F.col("r1") * F.lit(100) + F.coalesce(F.col("r2"), F.lit(0))
    )
    want = {
        r["id"]: r["rank"]
        for r in packed.select(
            "id",
            F.dense_rank().over(Window.orderBy("__k")).cast("bigint").alias("rank"),
        ).collect()
    }
    assert got == want


def test_tie_split_rejects_unsafe_long_order_values(spark):
    """ADVICE r7: composite routing compares double-cast values, so a
    LongType order column reaching 2^53 must raise loudly under
    tie_split=True (distinct integers alias as doubles there) while
    tie_split=False stays exact under the monotone collapse."""
    import pytest

    big = 1 << 53
    df = spark.createDataFrame(
        [(i, big + (i % 3)) for i in range(30)], "id bigint, v bigint"
    )
    with pytest.raises(ValueError, match="2\\^53"):
        global_row_number(
            df, "v", tiebreaks=["id"], n_buckets=3, tie_split=True
        ).collect()
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(df, "v", tiebreaks=["id"], n_buckets=3).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.select(
            "id",
            F.row_number().over(Window.orderBy("v", "id")).cast("bigint").alias("rn"),
        ).collect()
    }
    assert got == want


def test_tie_split_rejects_wide_decimal(spark):
    import pytest

    df = spark.createDataFrame(
        [(i, i) for i in range(10)], "id bigint, v bigint"
    ).select("id", F.col("v").cast("decimal(20,0)").alias("v"))
    with pytest.raises(ValueError, match="decimal"):
        global_row_number(df, "v", tiebreaks=["id"], n_buckets=3, tie_split=True)
