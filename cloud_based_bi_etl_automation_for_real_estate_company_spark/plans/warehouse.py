"""Warehouse-grade analytical queries over the full star schema
(lineitem/orders/customer/supplier/part/nation/region).

The reference's BI layer computes its measures over a handful of
small CRM tables; these queries prove the same measure *shapes*
(filtered aggregation, multi-way join, group-top-k) hold on the
fact-table scale the engine actually targets. They are the bench
workhorses: lineitem is the only fixture with real volume (600k rows
at sf0.1, ~6B at SF1000).

Plan-quality invariants (checked in tests/test_plans.py):
- l1: single scan + partial/final hash agg, shipdate filter pushed to
  parquet (PushedFilters), only 7 of 16 columns read (ReadSchema);
- l2: dims (nation, region, supplier, customer) broadcast — the only
  shuffle is lineitem⋈orders, and AQE picks the strategy at runtime;
- l3: join to part broadcasts; top-k via rank-over-agg (tiny frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.transforms import davg, dsum
from .measures import t


def q_l1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: the canonical "wide agg over
    the big fact" (A2/A3 measure family at warehouse scale)."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("sum_disc_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                6,
            ).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_l2_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped multi-way join: revenue per supplier nation.
    Every dimension broadcasts; the lineitem⋈orders equi-join is the
    one real shuffle (sort-merge at scale, AQE may re-plan)."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        l.join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == o.o_orderkey)
        .filter(F.year("o_orderdate") >= 1997)
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
              l.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_l3_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-top-k over a joined fact: top-5 part brands by revenue
    within each part type (A6 leaderboard shape at warehouse scale)."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    per_brand = (
        l.join(F.broadcast(p.select("p_partkey", "p_brand", "p_type")),
               l.l_partkey == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("part_type"), F.col("p_brand").alias("brand"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"))
    )
    w = Window.partitionBy("part_type").orderBy(F.desc("revenue"), F.asc("brand"))
    return (
        per_brand.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
    )


def q_l4_order_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact correlated measures: per-priority order stats with
    lineitem rollups joined back (two-level aggregation, J3 shape)."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    per_order = l.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("l_quantity").alias("total_qty"),
    )
    return (
        o.join(per_order, o.o_orderkey == per_order.l_orderkey, "left")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.avg("n_lines").alias("avg_lines_per_order"),
            F.avg("total_qty").alias("avg_qty_per_order"),
            dsum("o_totalprice").alias("total_amount"),
        )
    )


def q_l5_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped: top-10 open orders by pending revenue for one
    customer segment. Segment filter broadcast-joins into orders, the
    lineitem join shuffles once, rank-limit prunes the rest."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    seg = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    joined = (
        o.filter(F.col("o_orderstatus") == "O")
        .join(F.broadcast(seg), o.o_custkey == F.col("c_custkey"))
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"))
    )
    from ..operators.partitioning import sharded_topk

    return sharded_topk(joined, 10, [F.desc("revenue"), F.asc("o_orderkey")])


def q_l6_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped: customers ranked by returned-item revenue
    (return flag 'R'), enriched with nation — the churn-risk report."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    joined = (
        l.filter(F.col("l_returnflag") == "R")
        .join(o.select("o_orderkey", "o_custkey"), l.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey", "c_name", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("lost_revenue"))
    )
    from ..operators.partitioning import sharded_topk

    return sharded_topk(
        joined, 20, [F.desc("lost_revenue"), F.asc("c_custkey")]
    )


def q_l7_lone_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped: suppliers that shipped late (> 60 days after
    order date) in multi-supplier orders where NO other supplier was
    late — EXISTS as left-semi, NOT EXISTS as left-anti, composed on
    the same fact."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    lines = l.join(
        o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey")
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)).alias("late"),
    )
    late_lines = lines.filter(F.col("late")).select("l_orderkey", "l_suppkey").distinct()
    # another supplier in the same order (semi: order has >1 supplier)
    others = lines.select("l_orderkey", F.col("l_suppkey").alias("other_supp")).distinct()
    multi = (
        late_lines.alias("x")
        .join(
            others.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") != F.col("y.other_supp")),
            "left_semi",
        )
    )
    other_late = (
        lines.filter(F.col("late"))
        .select("l_orderkey", F.col("l_suppkey").alias("other_supp"))
        .distinct()
    )
    lone = (
        multi.alias("x")
        .join(
            other_late.alias("z"),
            (F.col("x.l_orderkey") == F.col("z.l_orderkey"))
            & (F.col("x.l_suppkey") != F.col("z.other_supp")),
            "left_anti",
        )
    )
    return (
        lone.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_lone_late_orders"))
    )


def q_l8_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped: distinct supplier count per (brand, type),
    excluding one brand and a type family — the distinct-agg +
    exclusion-predicate shape."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p.select("p_partkey", "p_brand", "p_type")),
               l.l_partkey == F.col("p_partkey"))
        .filter((F.col("p_brand") != "Brand#1") & (~F.col("p_type").startswith("PROMO")))
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_type").alias("part_type"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_l9_groupwise_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped groupwise-min: per segment, the customer(s)
    whose total order amount is the segment minimum — the
    join-back-on-aggregated-min rewrite of a correlated subquery."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    per_cust = (
        o.join(F.broadcast(c.select("c_custkey", "c_name", "c_mktsegment")),
               o.o_custkey == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"), "c_custkey", "c_name")
        .agg(dsum("o_totalprice").alias("total_amount"))
    )
    seg_min = per_cust.groupBy("segment").agg(
        F.min("total_amount").alias("min_amount")
    )
    return (
        per_cust.join(F.broadcast(seg_min), "segment")
        .filter(F.col("total_amount") == F.col("min_amount"))
        .select("segment", "c_custkey", "c_name", "total_amount")
    )


def q_l16_small_qty_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped nested aggregate: revenue from lineitems whose
    quantity is below 20% of their part's average quantity, rolled up
    per brand — the decorrelated form of a per-row correlated AVG
    subquery. Spark-first shape: the per-part average is a WINDOW over
    l_partkey (ONE shuffle of the facts, keeping every row) rather
    than the aggregate-then-join-back rewrite, which would shuffle the
    facts twice on the same key."""
    from pyspark.sql import Window

    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        l.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .join(F.broadcast(p.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_small_qty_items"),
            dsum("l_extendedprice").alias("small_qty_revenue"),
        )
    )


def q_l17_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped nested-aggregate + group-wise argmax: for each
    part, its LARGEST supplier by shipped quantity and that supplier's
    share of the part's total — the single-source-risk report, top 100
    most-concentrated parts. The (part, supplier) rollup shuffles the
    facts once; both the share window and the argmax row_number reuse
    that l_partkey partitioning (no second fact shuffle); the
    correlated 'share of (SELECT SUM ...)' subquery never
    materializes per-row."""
    from pyspark.sql import Window

    l = t(spark, sf_dir, "lineitem")
    per_ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty")
    )
    wp = Window.partitionBy("l_partkey")
    ranked = per_ps.select(
        "l_partkey",
        "l_suppkey",
        (F.col("qty").cast("double") / F.sum("qty").over(wp).cast("double")).alias(
            "share"
        ),
        F.row_number()
        .over(wp.orderBy(F.desc("qty"), F.asc("l_suppkey")))
        .alias("pos"),
    ).filter(F.col("pos") == 1)
    from ..operators.partitioning import sharded_topk

    return sharded_topk(
        ranked.select(
            "l_partkey", F.col("l_suppkey").alias("top_suppkey"), "share"
        ),
        100,
        [F.desc("share"), F.asc("l_partkey")],
    )


def q_l18_idle_big_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped global-scalar + anti-join: customers whose
    balance beats the average POSITIVE balance and who placed no order
    since 2000 (lapsed high-value accounts), rolled up per segment.
    The scalar average is a 1-row agg cross-joined in (broadcast, no
    correlated per-row subquery); 'no recent orders' is a LeftAnti
    against the recent order keys with the date filter pushed into
    the orders scan."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    recent = (
        o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    rich = c.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(recent, "c_custkey", "left_anti")
    return idle.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal").alias("total_balance"),
    )


def q_l10_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped two-level aggregation: how many customers
    placed exactly N (non-urgent) orders, including the zero-order
    group via the left join. First agg shuffles on c_custkey, the
    histogram re-agg is over a tiny frame — at scale the only heavy
    stage is the first shuffle, and AQE coalesces the second."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("1")
    )
    per_cust = (
        c.select("c_custkey")
        .join(o.select("o_custkey", "o_orderkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q_l11_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped: customers from a fixed nation set with
    above-average positive balance and no *urgent* orders — scalar
    aggregate broadcast against the dimension, then anti-join to the
    filtered fact (every fixture customer has some order, so the
    urgency filter keeps the anti-join non-trivial). The scalar side
    is one row (BroadcastNestedLoop, not a cartesian blow-up); the
    anti-join shuffles the filtered orders once on o_custkey."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").startswith("1")
    )
    eligible = c.filter(F.col("c_nationkey").isin(1, 2, 3, 5, 8, 13, 17))
    avg_bal = (
        eligible.filter(F.col("c_acctbal") > 0)
        .agg(davg("c_acctbal").alias("avg_bal"))
    )
    rich = eligible.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(
        o.select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy(F.col("c_nationkey").alias("cntrycode")).agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum("c_acctbal").alias("totacctbal"),
    )


def q_l12_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped: promo revenue share for one month — a ratio
    of two conditional decimal sums over the fact⋈part broadcast join.
    The month predicate pushes to the parquet scan, so only ~1/80 of
    lineitem is read before the join."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0), 6)
                / dsum(rev, 6)
            ).alias("promo_pct")
        )
    )


def q_l13_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped: yearly revenue lost to small orders — rows of
    a selected brand whose quantity is under 20% of that part's average
    quantity. The correlated AVG decorrelates to a per-part aggregate
    joined back on partkey; the tiny part-filter broadcast prunes both
    sides before the agg join."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 15)
    ).select("p_partkey")
    sel = l.join(F.broadcast(p), l.l_partkey == F.col("p_partkey"))
    thresh = (
        sel.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((F.lit(0.2) * davg("l_quantity")).alias("qty_thresh"))
    )
    return (
        sel.join(F.broadcast(thresh), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


def q_l14_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped: large-volume orders — HAVING over the fact
    aggregate (sum of quantities per order > 250), then join back to
    orders and broadcast customer for the listing. The HAVING filter
    runs on the aggregated (small) side before any wide join."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate"), "o_totalprice", "sum_qty",
        )
    )


def q_l15_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped: revenue under an OR-of-ANDs predicate mixing
    part and lineitem columns. Catalyst splits the disjunction: the
    part-only residue (brand/size OR-chain) prunes the broadcast build
    side, the derived quantity envelope (1..30) pushes to the lineitem
    scan, and only the mixed residual runs post-join."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    arm = (
        lambda brand, size_hi, q_lo, q_hi: (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & q.between(q_lo, q_hi)
    )
    return (
        l.filter(q.between(1, 30))
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(
            arm("Brand#12", 5, 1, 11)
            | arm("Brand#23", 10, 10, 20)
            | arm("Brand#34", 15, 20, 30)
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
            .alias("revenue")
        )
    )


def q_l19_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped EXISTS semi-join: 1997-Q1 order counts per
    priority, counting only orders with ≥1 LATE line (shipped > 60
    days after order date). The mixed-side predicate rides inside a
    LeftSemi join — each order contributes once no matter how many
    late lines it has, with no post-join distinct. At scale the semi
    join shuffles on o_orderkey like any fact join but carries zero
    payload columns from the probe side."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.date_add(o.o_orderdate, 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


def q_l20_nation_trade_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped bidirectional nation-pair trade volume: revenue
    shipped 1997–1998 between NATION_1 and NATION_2 in either
    direction, by (supp_nation, cust_nation, year). Both nation dims
    broadcast; the pair disjunction prunes AFTER the cheap broadcast
    joins, and the only real shuffles are lineitem⋈orders and the
    final 4-row aggregation."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
            .alias("volume")
        )
    )


def q_l21_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped market share: NATION_1 suppliers' slice of
    STANDARD-part revenue sold to EUROPE customers, per order year —
    a conditional-sum ÷ total-sum ratio computed in ONE aggregation
    pass (no self-join against a totals table). Decimal partials keep
    both sums exact; the final division happens once per year row in
    identical double algebra in both engines."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cust_nation = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    supp_nation = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(F.col("p_type") == "STANDARD")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        base.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0), 6)
            .alias("nation_volume"),
            dsum(vol, 6).alias("total_volume"),
        )
        .select(
            "o_year",
            "nation_volume",
            "total_volume",
            F.try_divide(F.col("nation_volume"), F.col("total_volume"))
            .alias("mkt_share"),
        )
    )


def q_l22_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped profit rollup: per (supplier nation, year)
    profit on 'widget' parts, amount = revenue − 0.5·retailprice·qty
    (the fixture has no partsupp cost; the half-retail stand-in keeps
    the two-table amount expression of Q9). The p_name filter prunes
    the broadcast build side before the fact join."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_name", "p_retailprice")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.5
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p.filter(F.col("p_name").contains("widget"))),
               l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(amount, 6).alias("profit"))
    )


def q_l23_stock_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped group-sum vs scaled global scalar: parts whose
    total shipped quantity exceeds 0.07% of ALL shipped quantity — the
    "concentration" HAVING pattern. The global total is a 1-row
    broadcast cross-joined into the HAVING filter, so the plan is one
    partkey hash-agg + one scalar agg over its output — the fact table
    scans once, and the filter is evaluated map-side on the aggregated
    (part-sized) relation."""
    l = t(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(dsum("l_quantity").alias("qty"))
    total = per_part.agg(F.sum(F.col("qty").cast("decimal(18,2)"))
                         .cast("double").alias("tot"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("qty") > F.lit(0.0007) * F.col("tot"))
        .select("l_partkey", "qty")
    )


def q_l24_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped forecasting filter: revenue delta from a
    narrow (year × discount-band × quantity-cap) slice — the
    tight-predicate single-table scan whose whole cost model is
    PUSHDOWN: all three filters reach the parquet scan (plan-asserted
    in tests), so at 100 TB the scan reads only row groups whose
    min/max intersect the slice."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 6)
            .alias("forecast_revenue_delta"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_l26_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped double-correlated existence: suppliers who
    were the SOLE late shipper on a finished multi-supplier order
    (late = shipped >90 days after the order date — the fixture lacks
    Q21's commit/receipt dates, so the lateness predicate adapts while
    the distinctive plan shape is kept): a candidate set that must
    pass BOTH an EXISTS against sibling lineitems (another supplier
    touched the order) and a NOT EXISTS against late sibling lineitems
    (no other supplier was late). Spark shape: one orders⋈lineitem
    pass derives the flagged base, then LeftSemi and LeftAnti joins —
    both keyed on orderkey with a non-equi suppkey guard — prune the
    candidates without ever materializing the pair expansion, and the
    supplier dim broadcasts into the final count. Top-50 via
    sharded_topk."""
    from ..operators.partitioning import sharded_topk

    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    base = l.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        o.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late = base.filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).select("l_orderkey", "l_suppkey")
    cand = late.dropDuplicates(["l_orderkey", "l_suppkey"])
    others = base.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    waiting = (
        cand.join(
            others,
            (F.col("l_orderkey") == F.col("ok2"))
            & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("ok3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(
            F.broadcast(s.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "numwait")
    )
    return sharded_topk(waiting, 50, [F.desc("numwait"), F.asc("s_suppkey")])


def q_l25_priority_mode_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped mode-split conditional aggregation (the
    reference's fixture lacks Q12's l_shipmode/l_receiptdate columns,
    so the shape is kept — fact×fact join where the aggregate splits
    on the OTHER table's attribute — over the columns that exist):
    per return flag in a one-year ship window, how many lineitems
    belong to high-priority vs low-priority orders. Plan shape that
    matters at 100 TB: the date filter pushes into the lineitem scan
    BEFORE the orderkey join, orders projects two columns, and the
    priority split is a conditional sum inside one hash aggregate —
    no second pass, no pivot shuffle."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).join(
        o.select("o_orderkey", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
            "high_line_count"
        ),
        F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias(
            "low_line_count"
        ),
    )


def q_l27_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped global argmax over an aggregated view: 1997
    revenue per supplier, then the supplier(s) achieving the GLOBAL
    maximum — the "CREATE VIEW revenue / WHERE total = (SELECT MAX)"
    pattern. Differs from l9's per-GROUP min in that the scalar is one
    global row, so the plan is agg → 1-row broadcast → equality
    filter; ties all surface (the spec's deliberate wrinkle), and the
    decimal-exact revenue sums make cross-engine equality safe where
    a double sum would make the argmax partition-dependent."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    rev = (
        l.join(
            o.select("o_orderkey", "o_orderdate"), l.l_orderkey == o.o_orderkey
        )
        .filter(F.year("o_orderdate") == 1997)
        .groupBy("l_suppkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(
            F.broadcast(s.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier"),
            "total_revenue",
        )
    )


ORACLES: dict[str, str] = {
    "l27_top_supplier": """
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6)
                                 AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
            GROUP BY 1),
        mx AS (SELECT MAX(total_revenue) AS mx FROM rev)
        SELECT s_suppkey AS suppkey, s_name AS supplier, total_revenue
        FROM rev, mx
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = mx
    """,
    "l26_waiting_suppliers": """
        WITH base AS (
            SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'),
        late AS (
            SELECT DISTINCT l_orderkey, l_suppkey
            FROM base
            WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY),
        waiting AS (
            SELECT c.l_suppkey, COUNT(*) AS numwait
            FROM late c
            WHERE EXISTS (
                    SELECT 1 FROM base b
                    WHERE b.l_orderkey = c.l_orderkey
                      AND b.l_suppkey <> c.l_suppkey)
              AND NOT EXISTS (
                    SELECT 1 FROM late x
                    WHERE x.l_orderkey = c.l_orderkey
                      AND x.l_suppkey <> c.l_suppkey)
            GROUP BY 1)
        SELECT s_suppkey, s_name, numwait,
               CAST(ROW_NUMBER() OVER (ORDER BY numwait DESC, s_suppkey ASC)
                    AS BIGINT) AS rnk
        FROM waiting
        JOIN supplier ON l_suppkey = s_suppkey
        QUALIFY rnk <= 50
    """,
    "l25_priority_mode_split": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT)
                   AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
    """,
    "l24_forecast_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount
                             AS DECIMAL(18,6))) AS DOUBLE)
                   AS forecast_revenue_delta,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "l23_stock_concentration": """
        WITH per_part AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       AS qty
            FROM lineitem GROUP BY 1),
        tot AS (
            SELECT CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS tot
            FROM per_part)
        SELECT l_partkey, qty
        FROM per_part CROSS JOIN tot
        WHERE qty > 0.0007 * tot
    """,
    "l15_disjunctive_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "l19_priority_late_orders": """
        SELECT o_orderpriority, COUNT(*) AS n_late_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1
    """,
    "l20_nation_trade_pairs": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS volume
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1999-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
    """,
    "l21_market_share": """
        WITH agg AS (
            SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
                   CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_1'
                                 THEN l.l_extendedprice * (1 - l.l_discount)
                                 ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
                       AS nation_volume,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(18,6))) AS DOUBLE) AS total_volume
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN region r ON cn.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            WHERE p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
            GROUP BY 1)
        SELECT o_year, nation_volume, total_volume,
               nation_volume / total_volume AS mkt_share
        FROM agg
    """,
    "l22_nation_profit": """
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INT) AS o_year,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             - 0.5 * p.p_retailprice * l.l_quantity
                             AS DECIMAL(18,6))) AS DOUBLE) AS profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY 1, 2
    """,
    "l12_promo_revenue": """
        SELECT CAST(100.0 * CAST(SUM(CAST(
                   CASE WHEN starts_with(p_type, 'PROMO')
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))) AS DOUBLE) AS DOUBLE)
                   AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    "l13_small_qty_revenue": """
        WITH sel AS (
            SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand = 'Brand#3' AND p.p_size < 15),
        thresh AS (
            SELECT l_partkey AS t_partkey,
                   0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                               AS DOUBLE) / COUNT(l_quantity)) AS qty_thresh
            FROM sel GROUP BY l_partkey)
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                         AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
        FROM sel JOIN thresh ON l_partkey = t_partkey
        WHERE l_quantity < qty_thresh
    """,
    "l14_large_volume_orders": """
        WITH big AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum_qty > 250)
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, big.sum_qty
        FROM big
        JOIN orders o ON big.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "l10_order_count_dist": """
        WITH per_cust AS (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND NOT starts_with(o.o_orderpriority, '1')
            GROUP BY c.c_custkey)
        SELECT c_count, COUNT(*) AS custdist
        FROM per_cust GROUP BY c_count
    """,
    "l11_idle_rich_customers": """
        WITH eligible AS (
            SELECT c_custkey, c_nationkey, c_acctbal
            FROM customer WHERE c_nationkey IN (1, 2, 3, 5, 8, 13, 17)),
        avg_bal AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(c_acctbal) AS avg_bal
            FROM eligible WHERE c_acctbal > 0),
        idle AS (
            SELECT e.c_nationkey, e.c_acctbal
            FROM eligible e, avg_bal
            WHERE e.c_acctbal > avg_bal.avg_bal
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = e.c_custkey
                                AND starts_with(o.o_orderpriority, '1')))
        SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS totacctbal
        FROM idle GROUP BY c_nationkey
    """,
    "l17_dominant_suppliers": """
        WITH per_ps AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
            FROM lineitem GROUP BY 1, 2),
        ranked AS (
            SELECT l_partkey, l_suppkey,
                   CAST(qty AS DOUBLE)
                       / CAST(SUM(qty) OVER (PARTITION BY l_partkey) AS DOUBLE)
                       AS share,
                   ROW_NUMBER() OVER (PARTITION BY l_partkey
                                      ORDER BY qty DESC, l_suppkey ASC) AS pos
            FROM per_ps)
        SELECT l_partkey, l_suppkey AS top_suppkey, share,
               CAST(ROW_NUMBER() OVER (ORDER BY share DESC, l_partkey ASC)
                    AS BIGINT) AS rnk
        FROM ranked WHERE pos = 1
        QUALIFY rnk <= 100
    """,
    "l18_idle_big_accounts": """
        WITH avg_bal AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS avg_bal
            FROM customer WHERE c_acctbal > 0)
        SELECT c.c_mktsegment AS segment,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_balance
        FROM customer c CROSS JOIN avg_bal
        WHERE c.c_acctbal > avg_bal.avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY 1
    """,
    "l16_small_qty_brand_revenue": """
        WITH per_part AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(*) AS avg_qty
            FROM lineitem GROUP BY 1)
        SELECT p.p_brand AS brand,
               COUNT(*) AS n_small_qty_items,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS small_qty_revenue
        FROM lineitem l
        JOIN per_part a USING (l_partkey)
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < 0.2 * a.avg_qty
        GROUP BY 1
    """,
    "l9_groupwise_min": """
        WITH per_cust AS (
            SELECT c.c_mktsegment AS segment, c.c_custkey, c.c_name,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS total_amount
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2, 3)
        SELECT segment, c_custkey, c_name, total_amount
        FROM per_cust p
        WHERE total_amount = (
            SELECT MIN(total_amount) FROM per_cust q
            WHERE q.segment = p.segment)
    """,
    "l7_lone_late_suppliers": """
        WITH lines AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        late_lines AS (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE late),
        lone AS (
            SELECT x.l_orderkey, x.l_suppkey
            FROM late_lines x
            WHERE EXISTS (
                SELECT 1 FROM lines y
                WHERE y.l_orderkey = x.l_orderkey
                  AND y.l_suppkey <> x.l_suppkey)
              AND NOT EXISTS (
                SELECT 1 FROM lines z
                WHERE z.l_orderkey = x.l_orderkey
                  AND z.l_suppkey <> x.l_suppkey AND z.late))
        SELECT l_suppkey, COUNT(*) AS n_lone_late_orders
        FROM lone GROUP BY l_suppkey
    """,
    "l8_supplier_variety": """
        SELECT p.p_brand AS brand, p.p_type AS part_type,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'PROMO%'
        GROUP BY 1, 2
    """,
    "l5_top_revenue_orders": """
        WITH joined AS (
            SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(18,6))) AS DOUBLE) AS revenue
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus = 'O' AND c.c_mktsegment = 'BUILDING'
            GROUP BY 1, 2, 3),
        ranked AS (
            SELECT *, CAST(ROW_NUMBER() OVER (
                ORDER BY revenue DESC, o_orderkey ASC) AS BIGINT) AS rnk
            FROM joined)
        SELECT o_orderkey, o_orderdate, o_orderpriority, revenue, rnk
        FROM ranked WHERE rnk <= 10
    """,
    "l6_returned_customers": """
        WITH joined AS (
            SELECT c.c_custkey, c.c_name, n.n_name AS nation,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(18,6))) AS DOUBLE) AS lost_revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
            GROUP BY 1, 2, 3),
        ranked AS (
            SELECT *, CAST(ROW_NUMBER() OVER (
                ORDER BY lost_revenue DESC, c_custkey ASC) AS BIGINT) AS rnk
            FROM joined)
        SELECT c_custkey, c_name, nation, lost_revenue, rnk
        FROM ranked WHERE rnk <= 20
    """,
    "l1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "l2_revenue_by_nation": """
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE year(o.o_orderdate) >= 1997
        GROUP BY 1, 2
    """,
    "l3_top_parts": """
        WITH per_brand AS (
            SELECT p.p_type AS part_type, p.p_brand AS brand,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2),
        ranked AS (
            SELECT part_type, brand, revenue,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY part_type
                       ORDER BY revenue DESC, brand ASC) AS BIGINT) AS rnk
            FROM per_brand)
        SELECT part_type, brand, revenue, rnk FROM ranked WHERE rnk <= 5
    """,
    "l4_order_lifecycle": """
        WITH per_order AS (
            SELECT l_orderkey, COUNT(*) AS n_lines, SUM(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey)
        SELECT o.o_orderpriority AS priority,
               COUNT(*) AS n_orders,
               AVG(p.n_lines) AS avg_lines_per_order,
               AVG(p.total_qty) AS avg_qty_per_order,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
        FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
        GROUP BY 1
    """,
}

QUERIES = {
    "l1_pricing_summary": q_l1_pricing_summary,
    "l2_revenue_by_nation": q_l2_revenue_by_nation,
    "l3_top_parts": q_l3_top_parts,
    "l4_order_lifecycle": q_l4_order_lifecycle,
    "l5_top_revenue_orders": q_l5_top_revenue_orders,
    "l6_returned_customers": q_l6_returned_customers,
    "l7_lone_late_suppliers": q_l7_lone_late_suppliers,
    "l8_supplier_variety": q_l8_supplier_variety,
    "l9_groupwise_min": q_l9_groupwise_min,
    "l16_small_qty_brand_revenue": q_l16_small_qty_brand_revenue,
    "l17_dominant_suppliers": q_l17_dominant_suppliers,
    "l18_idle_big_accounts": q_l18_idle_big_accounts,
    "l19_priority_late_orders": q_l19_priority_late_orders,
    "l20_nation_trade_pairs": q_l20_nation_trade_pairs,
    "l21_market_share": q_l21_market_share,
    "l22_nation_profit": q_l22_nation_profit,
    "l23_stock_concentration": q_l23_stock_concentration,
    "l24_forecast_revenue": q_l24_forecast_revenue,
    "l25_priority_mode_split": q_l25_priority_mode_split,
    "l26_waiting_suppliers": q_l26_waiting_suppliers,
    "l27_top_supplier": q_l27_top_supplier,
    "l10_order_count_dist": q_l10_order_count_dist,
    "l11_idle_rich_customers": q_l11_idle_rich_customers,
    "l12_promo_revenue": q_l12_promo_revenue,
    "l13_small_qty_revenue": q_l13_small_qty_revenue,
    "l14_large_volume_orders": q_l14_large_volume_orders,
    "l15_disjunctive_revenue": q_l15_disjunctive_revenue,
}
