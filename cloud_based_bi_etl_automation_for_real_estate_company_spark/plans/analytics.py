"""Additional analytic query shapes rounding out the measure library:
pivoted funnel (the dashboard's month × stage matrix), exact
percentile measures, and the composite training-data quality-filter
pipeline. All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from .measures import t

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_a17_pivot_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivoted month × event-type counts — the wide dashboard matrix
    (A1 × A10). Explicit pivot values keep the plan a single pass
    (no extra distinct-values job) and the schema static for the
    oracle."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.trunc("ts", "month").alias("month_start"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .select(
            "month_start",
            *[F.coalesce(F.col(c), F.lit(0)).alias(f"n_{c}") for c in EVENT_TYPES],
        )
    )


def q_a18_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of order value per status
    (median ticket / p90 — the DAX MEDIAN/PERCENTILE.INC measures)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_amount"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_amount"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_x_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data quality gate: keep documents with
    reasonable length, token count, mean token length and stopword
    presence; report retention per language. The filter is pure
    column arithmetic — it fuses into the scan, no extra pass."""
    d = t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        T.token_count("text").alias("n_tokens"),
        T.avg_token_len("text").alias("atl"),
        T.stopword_ratio("text").alias("swr"),
    )
    kept = scored.filter(
        (F.col("n_chars") >= 50)
        & (F.col("n_tokens") >= 10)
        & (F.col("atl") >= 2.0)
        & (F.col("atl") <= 12.0)
        & (F.col("swr") >= 0.01)
    )
    per_lang = scored.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    kept_lang = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        per_lang.join(kept_lang, "lang", "left")
        .select(
            "lang",
            "n_total",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            F.try_divide(F.coalesce(F.col("n_kept"), F.lit(0)), F.col("n_total")).alias(
                "retention"
            ),
        )
    )


def q_u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op: customers who ordered but never signed (status F)
    — relational-algebra completeness beyond the reference's unions."""
    o = t(spark, sf_dir, "orders")
    ordered = o.select(F.col("o_custkey").alias("custkey")).distinct()
    signed = (
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    return ordered.exceptAll(signed)


def q_u4_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op: users who both clicked and purchased."""
    ev = t(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return clickers.intersect(buyers)


def q_a19_above_segment_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape: customers with balance above their
    segment's average — decorrelated into a window average (one
    shuffle) rather than a per-row subquery."""
    from pyspark.sql import Window

    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment")
    seg_avg = (
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        c.withColumn("segment_avg", seg_avg)
        .filter(F.col("c_acctbal") > F.col("segment_avg"))
        .select("c_custkey", "c_mktsegment", "c_acctbal", "segment_avg")
    )


def q_a20_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): every subtotal combination with
    grouping-set labels — the slice-and-dice matrix behind dashboard
    cross-filters."""
    o = t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").alias("__gs"),
            F.grouping("o_orderpriority").alias("__gp"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("amount"),
        )
        .select(
            F.when(F.col("__gs") == 1, F.lit("ALL")).otherwise(F.col("o_orderstatus")).alias("status"),
            F.when(F.col("__gp") == 1, F.lit("ALL")).otherwise(F.col("o_orderpriority")).alias("priority"),
            "n_orders",
            "amount",
        )
    )


def q_a22_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS over a non-hierarchical set list —
    {(status, priority), (priority), ()} — which neither ROLLUP nor
    CUBE can express (the per-priority subtotal without a per-status
    one). One pass over the fact table; Spark expands the sets into a
    single Expand + aggregate, not one scan per set."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").alias("__gs"),
            F.grouping("o_orderpriority").alias("__gp"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("amount"),
        )
        .select(
            F.when(F.col("__gs") == 1, F.lit("ALL")).otherwise(F.col("o_orderstatus")).alias("status"),
            F.when(F.col("__gp") == 1, F.lit("ALL")).otherwise(F.col("o_orderpriority")).alias("priority"),
            "n_orders",
            "amount",
        )
    )


def q_a21_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per-user ordered event-id list + its size —
    the collect-to-array measure (bounded per key; a 100 TB caveat is
    documented: never collect unbounded groups).

    The list is built as a real array (``sort_array(collect_list(...))``)
    and projected to a deterministic CSV string at the output edge:
    the correctness harness hash-compares cells and array-typed cells
    are unhashable on the pandas side, so both engines emit the same
    joined string instead (round-1 VERDICT item 1)."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.sort_array(F.collect_list("event_id")).cast("array<string>"), ","
        ).alias("event_ids"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


def q_p19_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral/positional explode: token with its 0-based position
    (posexplode ↔ lateral UNNEST-with-index in the oracle)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "tok"),
    ).select("p_partkey", F.col("pos").cast("bigint").alias("pos"), "tok")


def q_p18_string_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function breadth: substring, lpad, like-filter,
    regexp_extract, split-part, length — one projection exercising the
    everyday string surface."""
    p = t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").like("%M%"))
        .select(
            "p_partkey",
            F.substring("p_name", 1, 4).alias("name_prefix"),
            F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
            F.regexp_extract("p_brand", "Brand#(\\d+)", 1).alias("brand_num"),
            F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
            F.length("p_type").cast("bigint").alias("type_len"),
        )
    )


_SW = ", ".join(f"'{w}'" for w in T.STOPWORDS_EN)

def q_a23_equidepth_hist(
    spark: SparkSession, sf_dir: str, mode: str = "exact"
) -> DataFrame:
    """Equi-depth (equal-count) histogram of event values: decile
    ranks, then per-bucket bounds/count — the data profile a BI tool
    draws before choosing axis scales. ``mode="exact"`` is the
    oracle-parity form (ntile over one global sort window);
    ``mode="approx"`` is the 100 TB form — approx_percentile cut
    points broadcast back and routed map-side
    (operators/bucketing.approx_bucket), no global sort; the two are
    equivalence-tested in tests/test_bucketing.py."""
    from .measures import t

    ev = t(spark, sf_dir, "events")
    if mode == "approx":
        from ..operators.bucketing import approx_bucket

        b = approx_bucket(ev.select("value", "event_id"), "value", 10)
    else:
        w = Window.orderBy(F.col("value"), F.col("event_id"))
        b = ev.select("value", "event_id", F.ntile(10).over(w).alias("bucket"))
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )




def q_a24_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the classic BI lifecycle view the
    reference's dashboard family implies (lead funnel over time,
    reference README.md dashboards): cohort = month of a user's FIRST
    event, and each (cohort, month-offset) cell counts the cohort's
    users still active that many months later, as a share of the
    cohort.

    Dataflow: one scan → distinct (user, month) activity, a per-user
    min-month aggregate (both shuffles key on user_id — uniform), the
    cohort join stays user-keyed, and the cell aggregate is
    months²-sized. Cohort sizes are a tiny broadcast join. At 100 TB
    nothing here is corpus-quadratic: cells are bounded by the
    calendar, not the data.
    """
    ev = t(spark, sf_dir, "events")
    base = ev.select("user_id", F.trunc("ts", "month").alias("am"))
    firsts = base.groupBy("user_id").agg(F.min("am").alias("cohort_month"))
    cells = (
        base.distinct()
        .join(firsts, "user_id")
        .groupBy(
            "cohort_month",
            F.months_between("am", "cohort_month").cast("int").alias("month_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = firsts.groupBy("cohort_month").agg(F.count(F.lit(1)).alias("n_cohort"))
    return cells.join(F.broadcast(sizes), "cohort_month").select(
        "cohort_month",
        "month_offset",
        "n_active",
        "n_cohort",
        (F.col("n_active").cast("double") / F.col("n_cohort")).alias("retention"),
    )


def q_a25_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch revenue attribution: every user's purchase revenue
    is credited to the event type that FIRST brought them in (min ts,
    event_id tie-break) — the acquisition-channel measure behind
    marketing-spend dashboards.

    The first-touch pick is a rank-filtered window per user (map-side
    WindowGroupLimit — only each task's first row per user reaches the
    exchange); revenue joins user-keyed; the final aggregate is
    channel-sized. Money accumulates in decimal (order-invariant)."""
    from ..functions.transforms import dsum

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", F.col("event_type").alias("first_touch"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "value"
    )
    return (
        firsts.join(purchases, "user_id", "left")
        .groupBy("first_touch")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            dsum(F.coalesce(F.col("value"), F.lit(0.0))).alias(
                "attributed_revenue"
            ),
        )
    )


def q_a26_rfm(
    spark: SparkSession, sf_dir: str, mode: str = "exact"
) -> DataFrame:
    """RFM segmentation (Hughes 1994): per purchasing user, recency =
    days since last purchase (vs the corpus max date), frequency =
    purchase count, monetary = decimal-exact revenue; each scored into
    quartiles (1 = best: most recent / most frequent / highest spend)
    and aggregated to segment counts — the customer-value matrix BI
    tools build off the same fact table.

    ``mode="exact"`` scores with ntile(4) windows — global sorts, but
    over the PER-USER aggregate (users-sized, orders of magnitude
    below the fact table), ties broken on user_id so ranks are
    deterministic. ``mode="approx"`` routes each score through
    approx_percentile cut points instead
    (operators/bucketing.approx_bucket, descending for F/M) — no
    sort at all; equivalence-tested in tests/test_bucketing.py.
    The anchor date is a 1-row broadcast."""
    from ..functions.transforms import dsum

    ev = t(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase")
    anchor = pur.agg(F.max(F.to_date("ts")).alias("anchor_day"))
    per_user = pur.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        dsum("value").alias("monetary"),
    )
    scored = per_user.join(F.broadcast(anchor)).select(
        "user_id",
        F.datediff("anchor_day", "last_day").alias("recency_days"),
        "frequency",
        "monetary",
    )
    if mode == "approx":
        from ..operators.bucketing import approx_bucket

        b = approx_bucket(scored, "recency_days", 4, bucket_col="r_score")
        b = approx_bucket(b, "frequency", 4, bucket_col="f_score", descending=True)
        b = approx_bucket(b, "monetary", 4, bucket_col="m_score", descending=True)
        quartiled = b.select("r_score", "f_score", "m_score", "monetary")
    else:
        r_w = Window.orderBy(F.col("recency_days"), F.col("user_id"))
        f_w = Window.orderBy(F.col("frequency").desc(), F.col("user_id"))
        m_w = Window.orderBy(F.col("monetary").desc(), F.col("user_id"))
        quartiled = scored.select(
            F.ntile(4).over(r_w).alias("r_score"),
            F.ntile(4).over(f_w).alias("f_score"),
            F.ntile(4).over(m_w).alias("m_score"),
            "monetary",
        )
    return (
        quartiled.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.col("monetary").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_monetary"),
        )
    )


def q_a27_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order amounts — the
    fraud/entry-error screen auditors run over financial fact tables
    (Nigrini 2012): compare each leading digit's observed share to
    log10(1+1/d). Pure column arithmetic + one 9-row aggregate; the
    chi-square contribution per digit lets a dashboard flag drift."""
    o = t(spark, sf_dir, "orders")
    digit = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("int")
    per = (
        o.filter(F.col("o_totalprice") > 0)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    total = per.agg(F.sum("n_orders").alias("n_total"))
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    observed = F.col("n_orders") / F.col("n_total")
    return per.join(F.broadcast(total)).select(
        "digit",
        "n_orders",
        observed.alias("observed_p"),
        expected.alias("expected_p"),
        (
            (observed - expected) * (observed - expected) / expected
        ).alias("chi2_term"),
    )


def q_a28_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED funnel with sequence constraints — stage k counts only
    users whose stage-k event happened AFTER their stage-(k-1) entry
    time (first view -> first click after it -> first purchase after
    that), the event-analytics semantics a stage-count funnel (A1)
    approximates away. Three chained user-keyed aggregates, each a
    conditional-min; all three shuffles share the user_id key so a
    co-partitioned layout pays one."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    tv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    tc = (
        ev.filter(F.col("event_type") == "click")
        .join(tv, "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    tp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(tc, "user_id")
        .filter(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        tv.agg(F.count(F.lit(1)).alias("n_view"))
        .join(tc.agg(F.count(F.lit(1)).alias("n_click_after_view")))
        .join(tp.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


def q_a32_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-WINDOW funnel: click counts only within 24 h of the
    user's first view, purchase only within 24 h of that click — the
    product-analytics semantics where late conversions don't count
    (complements a28's unbounded ordered funnel). Same chained
    conditional-min shape, one extra interval bound per stage; all
    three shuffles share the user_id key."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    day = F.make_dt_interval(hours=F.lit(24))
    tv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    tc = (
        ev.filter(F.col("event_type") == "click")
        .join(tv, "user_id")
        .filter((F.col("ts") > F.col("tv")) & (F.col("ts") <= F.col("tv") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    tp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(tc, "user_id")
        .filter((F.col("ts") > F.col("tc")) & (F.col("ts") <= F.col("tc") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        tv.agg(F.count(F.lit(1)).alias("n_view"))
        .join(tc.agg(F.count(F.lit(1)).alias("n_click_24h")))
        .join(tp.agg(F.count(F.lit(1)).alias("n_purchase_24h")))
    )


def q_a29_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS trendline of monthly revenue — the dashboard
    trend-arrow measure (DAX LINEST / SLOPE class). Two stages: the
    monthly rollup (one fact shuffle, dims broadcast), then per-nation
    closed-form least squares over the ~dozens of monthly points.

    Determinism: every moment (Σx, Σy, Σxy, Σx²) accumulates in exact
    DECIMAL so partition order can't drift the result; the slope /
    intercept division is the only double arithmetic and both engines
    evaluate the identical expression tree. At 100 TB the second stage
    aggregates a nations×months table — driver-trivial."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    # month index shifted to a 1990 epoch: keeps every moment small
    # enough that its double image is exact (< 2^53), so the final
    # double algebra is bit-identical across engines.
    month_idx = (
        F.year("o_orderdate") * F.lit(12) + F.month("o_orderdate") - F.lit(23880)
    ).cast("bigint")
    monthly = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), month_idx.alias("x"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y"))
    )
    m = monthly.groupBy("nation").agg(
        F.count(F.lit(1)).cast("double").alias("n_months"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    num = F.col("n_months") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_months") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.try_divide(num, den)
    return m.select(
        "nation",
        F.col("n_months").cast("bigint").alias("n_months"),
        slope.alias("slope"),
        (
            F.col("sy") / F.col("n_months")
            - slope * (F.col("sx") / F.col("n_months"))
        ).alias("intercept"),
    )


def q_a30_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between quantity and line price per return
    flag — the scatter-plot R measure BI tools compute when validating
    a pricing model. Single fact scan; all five moments accumulate in
    exact DECIMAL (partition-order invariant, see `dsum`), and the
    final r = (nΣxy−ΣxΣy)/(√(nΣxx−Σx²)·√(nΣyy−Σy²)) is evaluated with
    the identical double expression tree in both engines."""
    l = t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    m = l.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(38,4)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(38,4)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(38,4)")).cast("double").alias("syy"),
    )
    n_ = F.col("n_items").cast("double")
    num = n_ * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = n_ * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = n_ * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "returnflag",
        "n_items",
        F.try_divide(num, F.sqrt(denx) * F.sqrt(deny)).alias("pearson_r"),
    )


def q_a31_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation over the 5-key event stream — the
    maximally-skewed group shape (at 100 TB each event type is a
    ~20 TB group; a plain groupBy lands each on ONE reducer, salting
    spreads it over 16 shards then merges 16 partials per key). The
    oracle is the plain GROUP BY: the rewrite must be value-identical,
    which also proves the decimal partial sums merge exactly."""
    from ..operators.skew import salted_agg

    ev = t(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        "event_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    out = salted_agg(
        ev,
        keys=["event_type"],
        aggs={"v": "sum", "event_id": "max"},
        salt_cols=["user_id", "event_id"],
        num_shards=16,
    )
    return out.select(
        "event_type",
        F.col("v").cast("double").alias("total_value"),
        F.col("event_id").alias("max_event_id"),
    )


def q_a33_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-JOIN rewrite driven through the gate: revenue per nation
    computed with the small side replicated over 8 salt shards and the
    big side salted deterministically — the fallback shape for a
    skewed key too hot for AQE and a small side too big to broadcast.
    The oracle is the plain join: the rewrite must be value-identical
    (and the decimal sums make the shard merge exact)."""
    from ..operators.skew import salted_join

    o = t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    dim = c.join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        c.c_nationkey == F.col("n_nationkey"),
    ).select(F.col("c_custkey").alias("o_custkey"), F.col("n_name").alias("nation"))
    joined = salted_join(
        o, dim, key="o_custkey", num_shards=8, salt_cols=["o_orderkey"]
    )
    return joined.groupBy("nation").agg(
        F.sum("price").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_a34_monthly_price_band(
    spark: SparkSession, sf_dir: str, mode: str = "exact"
) -> DataFrame:
    """Boxplot time series: p25/p50/p75 order-value band per month —
    the candlestick/box measure BI tools draw under a trend line. One
    hash agg on the month key. ``mode="exact"`` (oracle parity)
    buffers one month of values per reducer — calendar-bounded;
    ``mode="approx"`` is the 100 TB form: approx_percentile's GK
    sketch partial-aggregates map-side, same plan shape
    (mode-equivalence tolerance-tested in tests/test_bucketing.py)."""
    fn = "percentile" if mode == "exact" else "approx_percentile"
    o = t(spark, sf_dir, "orders")
    return o.groupBy(F.trunc("o_orderdate", "month").alias("month_start")).agg(
        F.expr(f"{fn}(o_totalprice, 0.25)").alias("p25"),
        F.expr(f"{fn}(o_totalprice, 0.5)").alias("p50"),
        F.expr(f"{fn}(o_totalprice, 0.75)").alias("p75"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_a35_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition counts (the Markov path
    matrix behind Sankey/path-analysis dashboards): consecutive event
    pairs per user via one lag window, rolled up with each source
    state's outgoing share. One user-keyed window shuffle + one
    25-cell aggregation."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("to_state"),
            F.lag("event_type").over(w).alias("from_state"),
        )
        .filter(F.col("from_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wtot = Window.partitionBy("from_state")
    return pairs.select(
        "from_state",
        "to_state",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wtot).cast("double")
        ).alias("p_transition"),
    )


def q_a36_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 length-3 event paths (a35's transition matrix extended
    to path/sequence mining — the Sankey "what journeys actually
    happen" question). 3-grams derive from two ``lead()``s over the
    per-user event-time window — the same single (user_id) shuffle a
    collect_list would cost, but streaming through the sort order
    with O(1) window state instead of materializing a power user's
    entire history as one array (the r4 shape's 100 TB hazard). The
    path vocabulary (≤ |event_types|³ = 125) aggregates with map-side
    partials — the final rank window sorts a vocabulary-sized, never
    corpus-sized, relation."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    grams = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    counts = (
        grams.filter(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("path"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 20)
    )


def q_a37_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic 50/50 user split
    (variant = hash(user_id) mod 2 — the bucketing an experimentation
    platform does): per-variant user and converter counts, conversion
    rates, and the pooled z statistic. One fact scan → user-keyed
    flag agg → 2-row conditional rollup; the z arithmetic is the
    identical double expression tree in both engines (a29/a30
    convention), counts are exact."""
    ev = t(spark, sf_dir, "events")
    # conversion = a HIGH-VALUE purchase (>150): the plain any-purchase
    # flag saturates to 100% on the fixture, collapsing the pooled
    # standard error to zero
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    # engine-portable 50/50 bucketing: md5-derived, not Spark-private
    # xxhash64, so the oracle replays the identical assignment
    variant = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint"),
        F.lit(2),
    ).cast("int")
    by_variant = (
        per_user.withColumn("variant", variant)
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_converted"),
        )
    )
    a = by_variant.filter(F.col("variant") == 0).select(
        F.col("n_users").alias("n_a"), F.col("n_converted").alias("c_a")
    )
    b = by_variant.filter(F.col("variant") == 1).select(
        F.col("n_users").alias("n_b"), F.col("n_converted").alias("c_b")
    )
    j = a.crossJoin(b)
    p_a = F.col("c_a").cast("double") / F.col("n_a").cast("double")
    p_b = F.col("c_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return j.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round((p_a - p_b) / se, 6).alias("z_score"),
    )


def q_a38_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics per event type: clip values at the
    group's exact p05/p95 (the outlier-tolerant mean the raw average
    isn't — t9's MAD flags outliers, this NEUTRALIZES them). Plan: one
    exact-percentile aggregation over the group key (tiny), broadcast
    back, map-side clamp + decimal mean — the fact table scans twice
    but shuffles once at group grain."""
    ev = t(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clipped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "lo",
        "hi",
        F.col("value"),
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias(
            "wv"
        ),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("value") < F.col("lo"), 1)).alias("n_clip_lo"),
        F.count(F.when(F.col("value") > F.col("hi"), 1)).alias("n_clip_hi"),
        F.round(F.first("lo"), 6).alias("p05"),
        F.round(F.first("hi"), 6).alias("p95"),
        (
            F.sum(F.round(F.col("wv"), 6).cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("winsorized_mean"),
    )


def q_a39_whatif_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAX what-if parameter sweep: total revenue under additional
    discount scenarios {0%, 5%, 10%} computed in ONE fact pass — the
    parameter table cross-explodes into the aggregation instead of
    re-running the measure per slider value. Decimal accumulation per
    (scenario) keeps the 3 sums engine-exact."""
    l = t(spark, sf_dir, "lineitem")
    scenarios = F.explode(
        F.array(F.lit(0.0), F.lit(0.05), F.lit(0.10))
    ).alias("extra_discount")
    rev = (
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (F.lit(1.0) - F.col("extra_discount"))
    )
    return (
        l.select("l_extendedprice", "l_discount", scenarios)
        .groupBy("extra_discount")
        .agg(
            F.sum(F.round(rev, 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("scenario_revenue")
        )
    )


def q_a40_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the
    user's most recent NON-purchase event within 7 days (the
    channel-credit question every funnel dashboard eventually asks;
    purchases with no in-window touch credit 'none'). One per-user
    window does the whole as-of lookup — ``last(..., ignorenulls)``
    over rows-up-to-previous is the LOCF idiom, so no self-join and no
    per-purchase subquery; the rollup is channel-sized. Revenue sums
    are decimal-exact (dsum)."""
    from ..functions.transforms import dsum

    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type") != "purchase",
        F.struct(F.col("ts").alias("tts"), F.col("event_type").alias("tet")),
    )
    lt = F.last(touch, ignorenulls=True).over(w)
    pur = ev.select("user_id", "ts", "event_id", "value", "event_type",
                    lt.alias("lt")).filter(F.col("event_type") == "purchase")
    channel = F.when(
        F.col("lt").isNotNull()
        & (F.col("ts") <= F.col("lt")["tts"] + F.expr("INTERVAL 7 DAYS")),
        F.col("lt")["tet"],
    ).otherwise(F.lit("none"))
    return (
        pur.select(channel.alias("channel"), "value")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            dsum("value", 6).alias("attributed_revenue"),
        )
    )


def q_a41_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (the inverse of a17's pivot): the per-event-type
    wide measure row (n_events, n_users, total_value) melts into the
    long (event_type, measure, value) table a BI tool binds to a
    generic measure slicer. Spark's native ``unpivot`` keeps the
    rewrite metadata-only — the expand happens map-side in the same
    stage as the aggregation output, no extra shuffle."""
    ev = t(spark, sf_dir, "events")
    from ..functions.transforms import dsum

    wide = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_events"),
        F.countDistinct("user_id").cast("double").alias("n_users"),
        dsum("value", 6).alias("total_value"),
    )
    return wide.unpivot(
        ["event_type"], ["n_events", "n_users", "total_value"],
        "measure", "value",
    )


def q_a42_mad_outliers(
    spark: SparkSession, sf_dir: str, mode: str = "exact"
) -> DataFrame:
    """Robust outlier counts per event type via the median absolute
    deviation (the heavy-tail-proof sibling of a38's winsorized
    stats): outlier ⇔ |v − median| > 3·1.4826·MAD (1.4826 is the
    normal-consistency constant, evaluated in-engine on both sides).
    Three grouped passes with the tiny (event_type, med, mad) frame
    broadcast back. ``mode="exact"`` matches DuckDB's quantile_cont
    bit-for-bit (the a34 precedent) but buffers each group's values;
    ``mode="approx"`` is the 100 TB form — both medians from
    percentile_approx, same plan shape, map-side-mergeable sketch
    partials (mode-equivalence tolerance-tested in
    tests/test_bucketing.py; the daily-grain alternative is
    t9_anomaly_mad)."""

    def med_of(col):
        return (
            F.percentile(col, 0.5)
            if mode == "exact"
            else F.percentile_approx(col, 0.5, 10000)
        )

    ev = t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(med_of(F.col("value")).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type", "med").agg(
        med_of(F.abs(F.col("value") - F.col("med"))).alias("mad")
    )
    thr = F.lit(3.0) * F.lit(1.4826) * F.col("mad")
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                (F.abs(F.col("value") - F.col("med")) > thr).cast("int")
            ).cast("bigint").alias("n_outliers"),
        )
    )


def q_a23_equidepth_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate row for a23's 100 TB form (``mode="approx"`` —
    operators/bucketing.approx_bucket, no global sort): the tie-robust
    rank audit of the decile routing (bucket_rank_audit — cum count at
    each cut within GK tolerance of b/10, exact n_total hash-checked).
    The exact↔approx equivalence is separately pinned in
    tests/test_bucketing.py; this row keeps the SCALE plan itself
    under the per-round correctness gate."""
    from ..operators.bucketing import approx_bucket, bucket_rank_audit

    ev = t(spark, sf_dir, "events")
    b = approx_bucket(ev.select("value", "event_id"), "value", 10)
    return bucket_rank_audit(b, "value", 10)


def q_a26_rfm_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate row for a26's 100 TB form: each RFM score dimension
    (recency asc, frequency/monetary desc) routed through
    approx_bucket and rank-audited per quartile — 12 rows
    (dim × score) with the exact purchasing-user count hash-checked.
    Frequency is heavily tied (small integer purchase counts), which
    is exactly what the audit's tie-robust one-sided bounds absorb —
    and why per-quartile DEPTHS would be the wrong audit."""
    from ..functions.transforms import dsum
    from ..operators.bucketing import approx_bucket, bucket_rank_audit

    ev = t(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase")
    anchor = pur.agg(F.max(F.to_date("ts")).alias("anchor_day"))
    per_user = pur.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        dsum("value").alias("monetary"),
    )
    scored = per_user.join(F.broadcast(anchor)).select(
        "user_id",
        F.datediff("anchor_day", "last_day").alias("recency_days"),
        "frequency",
        "monetary",
    )
    b = approx_bucket(scored, "recency_days", 4, bucket_col="r_score")
    b = approx_bucket(b, "frequency", 4, bucket_col="f_score", descending=True)
    b = approx_bucket(b, "monetary", 4, bucket_col="m_score", descending=True)
    # pinned: each of the 3 audits references b several times, and
    # without materialization every reference re-expands the whole
    # triple-bucket chain (a 360-exchange plan observed round 9)
    b = b.localCheckpoint(eager=True)
    parts = []
    for dim, col, bcol, desc in [
        ("r", "recency_days", "r_score", False),
        ("f", "frequency", "f_score", True),
        ("m", "monetary", "m_score", True),
    ]:
        parts.append(
            bucket_rank_audit(b, col, 4, bucket_col=bcol, descending=desc)
            .select(
                F.lit(dim).alias("dim"),
                F.col(bcol).alias("score"),
                "n_total",
                "rank_ok",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q_a34_price_band_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate row for a34's 100 TB form (approx_percentile's GK
    sketch instead of exact per-group buffering): per (month, q) the
    exact order count is hash-checked and rank_ok asserts the
    estimate's rank sits within tolerance of q — tie-robustly
    (count(v <= est) can't be below, count(v < est) can't be above),
    with the 2/n floor because small months (~19 orders at sf0.001)
    only achieve 1/n rank granularity."""
    o = t(spark, sf_dir, "orders")
    est = o.groupBy(F.trunc("o_orderdate", "month").alias("month_start")).agg(
        F.expr(
            "approx_percentile(o_totalprice, array(0.25D, 0.5D, 0.75D), 10000)"
        ).alias("__e")
    )
    qs = est.select(
        "month_start",
        F.explode(
            F.arrays_zip(
                F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)).alias("q"),
                F.col("__e").alias("est"),
            )
        ).alias("z"),
    ).select("month_start", F.col("z.q").alias("q"), F.col("z.est").alias("est"))
    v = F.col("o_totalprice").cast("double")
    n = F.count(F.lit(1))
    tol = F.greatest(F.lit(0.005), F.lit(2.0) / n.cast("double"))
    return (
        o.join(F.broadcast(qs), F.trunc("o_orderdate", "month") == F.col("month_start"))
        .groupBy("month_start", "q", "est")
        .agg(
            n.alias("n_orders"),
            (
                (
                    F.sum((v <= F.col("est")).cast("int")).cast("double")
                    >= (F.col("q") - tol) * n.cast("double")
                )
                & (
                    F.sum((v < F.col("est")).cast("int")).cast("double")
                    <= (F.col("q") + tol) * n.cast("double")
                )
            ).alias("rank_ok"),
        )
        .drop("est")
    )


def q_a42_mad_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate row for a42's 100 TB form: both robust location
    estimates (median of value, median absolute deviation) come from
    percentile_approx's mergeable sketch; the audit rescans once with
    the tiny (event_type, med, mad) frame broadcast and asserts each
    estimate's RANK in its own distribution — med against value, mad
    against |value − med| — sits at 0.5 within tie-robust GK
    tolerance. Exact per-type row counts are hash-checked."""
    ev = t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type", "med").agg(
        F.percentile_approx(F.abs(F.col("value") - F.col("med")), 0.5, 10000).alias(
            "mad"
        )
    )
    v = F.col("value").cast("double")
    d = F.abs(v - F.col("med"))
    n = F.count(F.lit(1))
    tol = F.greatest(F.lit(0.005), F.lit(2.0) / n.cast("double"))

    def rank_ok(expr, target):
        return (
            F.sum((expr <= target).cast("int")).cast("double")
            >= (F.lit(0.5) - tol) * n.cast("double")
        ) & (
            F.sum((expr < target).cast("int")).cast("double")
            <= (F.lit(0.5) + tol) * n.cast("double")
        )

    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            n.alias("n_rows"),
            rank_ok(v, F.col("med")).alias("med_ok"),
            rank_ok(d, F.col("mad")).alias("mad_ok"),
        )
    )


def q_a43_km_survival(spark, sf_dir: str):
    """Kaplan–Meier lead-conversion curve (operators/timeseries.py:
    km_survival): days from a user's first activity to first purchase,
    users without one censored at their last activity; Ŝ(t) via
    round-12 decimal log-factor sums, risk-set exhaustion emitted as
    survival 0 / log NULL explicitly (Spark ln(0)→NULL vs SQL −inf).
    Reference scope: the retention question over
    Lead_Ingestion_CRM_SQLite.py's lead pipeline."""
    from ..operators.timeseries import km_survival

    return km_survival(t(spark, sf_dir, "events"))


def q_a44_gini(spark, sf_dir: str):
    """Gini coefficient of customer-revenue concentration per nation —
    the inequality metric behind "does 20% of the book produce 80% of
    the commissions" dashboards (reference scope: agent/lead revenue
    concentration over the CRM's order facts). Sorted-rank identity
    G = 2·Σi·x₍ᵢ₎/(n·Σx) − (n+1)/n with x as exact DECIMAL money sums
    (functions/transforms.dsum rationale) and the rank ordered by
    (x, custkey) so ties are engine-deterministic; the only doubles
    are the final three divisions. One fact rollup + one per-nation
    window + one nation-sized agg."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", "o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x")
        )
    )
    w = Window.partitionBy("n_name").orderBy("x", "o_custkey")
    ranked = rev.select(
        "n_name",
        "x",
        F.row_number().over(w).cast("bigint").alias("i"),
    )
    agg = ranked.groupBy("n_name").agg(
        F.sum(F.col("i") * F.col("x")).alias("s1"),
        F.sum("x").alias("sx"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        F.col("n_name").alias("nation"),
        F.col("n").alias("n_customers"),
        F.col("sx").cast("double").alias("total_revenue"),
        (
            (F.lit(2.0) * F.col("s1").cast("double"))
            / (F.col("n").cast("double") * F.col("sx").cast("double"))
            - ((F.col("n") + F.lit(1)).cast("double") / F.col("n").cast("double"))
        ).alias("gini"),
    )


def q_a45_abc(spark, sf_dir: str):
    """ABC / Pareto classification of customers per nation — the
    80/15/5 inventory-analysis classic applied to the revenue book
    (sibling of a44's Gini: Gini scores the concentration, ABC names
    the accounts): rank customers by revenue, classify A while the
    running share stays ≤ 80%, B to 95%, C after, and report each
    class's size, revenue and share.

    Exactness: revenue stays DECIMAL through the running window sum
    (exact and order-deterministic under the (x DESC, custkey) total
    order), and the class boundaries compare in scaled-decimal form —
    cum ≤ 0.8·tot ⇔ 5·cum ≤ 4·tot, cum ≤ 0.95·tot ⇔ 20·cum ≤ 19·tot —
    so no customer ever flips class on float rounding; the only
    doubles are the final share divisions. One fact rollup, one
    per-nation window pair, one (nation, class) agg."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
    )
    wc = (
        Window.partitionBy("n_name")
        .orderBy(F.col("x").desc(), F.col("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("n_name")
    classed = rev.select(
        "n_name",
        "x",
        F.when(
            F.sum("x").over(wc) * F.lit(5) <= F.sum("x").over(wt) * F.lit(4),
            F.lit("A"),
        )
        .when(
            F.sum("x").over(wc) * F.lit(20)
            <= F.sum("x").over(wt) * F.lit(19),
            F.lit("B"),
        )
        .otherwise(F.lit("C"))
        .alias("abc_class"),
        F.sum("x").over(wt).alias("tot"),
    )
    return (
        classed.groupBy("n_name", "abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("x").alias("class_rev"),
            F.max("tot").alias("tot"),
        )
        .select(
            F.col("n_name").alias("nation"),
            "abc_class",
            "n_customers",
            F.col("class_rev").cast("double").alias("class_revenue"),
            (
                F.col("class_rev").cast("double")
                / F.col("tot").cast("double")
            ).alias("revenue_share"),
        )
    )


ORACLES: dict[str, str] = {
    "a45_abc": """
        WITH rev AS (
            SELECT n_name, o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2),
        classed AS (
            SELECT n_name, x,
                   CASE WHEN SUM(x) OVER wc * 5 <= SUM(x) OVER wt * 4
                            THEN 'A'
                        WHEN SUM(x) OVER wc * 20 <= SUM(x) OVER wt * 19
                            THEN 'B'
                        ELSE 'C' END AS abc_class,
                   SUM(x) OVER wt AS tot
            FROM rev
            WINDOW wc AS (PARTITION BY n_name
                          ORDER BY x DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING),
                   wt AS (PARTITION BY n_name)),
        agg AS (
            SELECT n_name, abc_class,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   SUM(x) AS class_rev, MAX(tot) AS tot
            FROM classed GROUP BY 1, 2)
        SELECT n_name AS nation, abc_class, n_customers,
               CAST(class_rev AS DOUBLE) AS class_revenue,
               CAST(class_rev AS DOUBLE) / CAST(tot AS DOUBLE)
                   AS revenue_share
        FROM agg
    """,
    "a44_gini": """
        WITH rev AS (
            SELECT n_name, o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2),
        ranked AS (
            SELECT n_name, x,
                   CAST(ROW_NUMBER() OVER (PARTITION BY n_name
                        ORDER BY x, o_custkey) AS BIGINT) AS i
            FROM rev),
        agg AS (
            SELECT n_name, SUM(i * x) AS s1, SUM(x) AS sx,
                   COUNT(*) AS n
            FROM ranked GROUP BY 1)
        SELECT n_name AS nation, n AS n_customers,
               CAST(sx AS DOUBLE) AS total_revenue,
               (2.0 * CAST(s1 AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
               - (CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE)) AS gini
        FROM agg
    """,
    "a43_km_survival": """
        WITH per AS (
            SELECT user_id, MIN(ts) AS t0,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
                   MAX(ts) AS tl
            FROM events GROUP BY 1),
        obs AS (
            SELECT CAST(COALESCE(
                       date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE)),
                       date_diff('day', CAST(t0 AS DATE), CAST(tl AS DATE)))
                   AS BIGINT) AS t_days,
                   CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
            FROM per),
        grid AS (
            SELECT t_days, COUNT(*) AS m,
                   CAST(SUM(ev) AS BIGINT) AS n_events
            FROM obs GROUP BY 1),
        total AS (SELECT COUNT(*) AS N FROM obs),
        risk AS (
            SELECT g.t_days, g.n_events,
                   t.N - CAST(COALESCE(SUM(g.m) OVER (ORDER BY g.t_days
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS n_risk
            FROM grid g CROSS JOIN total t),
        steps AS (
            SELECT t_days, n_risk, n_events,
                   SUM(CASE WHEN n_events < n_risk
                       THEN CAST(ROUND(ln(1.0 - CAST(n_events AS DOUBLE)
                                              / CAST(n_risk AS DOUBLE)), 12)
                            AS DECIMAL(28,12)) END)
                       OVER (ORDER BY t_days
                             ROWS UNBOUNDED PRECEDING) AS cum,
                   MAX(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END)
                       OVER (ORDER BY t_days
                             ROWS UNBOUNDED PRECEDING) AS exhausted
            FROM risk WHERE n_events > 0)
        SELECT t_days, n_risk, n_events,
               CASE WHEN exhausted = 0 THEN CAST(cum AS DOUBLE) END
                   AS log_surv,
               CASE WHEN exhausted = 0 THEN exp(CAST(cum AS DOUBLE))
                    ELSE 0.0 END AS survival
        FROM steps
    """,
    "a23_equidepth_approx": """
        SELECT CAST(u.i + 1 AS INT) AS bucket,
               (SELECT COUNT(*) FROM events WHERE value IS NOT NULL)
                   AS n_total,
               TRUE AS rank_ok
        FROM UNNEST(range(10)) AS u(i)
    """,
    "a26_rfm_approx": """
        WITH n AS (
            SELECT COUNT(DISTINCT user_id) AS n_total
            FROM events WHERE event_type = 'purchase')
        SELECT d.dim, CAST(u.i + 1 AS INT) AS score, n.n_total,
               TRUE AS rank_ok
        FROM (VALUES ('r'), ('f'), ('m')) d(dim)
        CROSS JOIN UNNEST(range(4)) AS u(i)
        CROSS JOIN n
    """,
    "a34_price_band_approx": """
        SELECT m.month_start, u.q, m.n_orders, TRUE AS rank_ok
        FROM (SELECT date_trunc('month', o_orderdate) AS month_start,
                     COUNT(*) AS n_orders
              FROM orders GROUP BY 1) m
        CROSS JOIN (SELECT UNNEST([0.25, 0.5, 0.75]::DOUBLE[]) AS q) u
    """,
    "a42_mad_approx": """
        SELECT event_type, COUNT(*) AS n_rows,
               TRUE AS med_ok, TRUE AS mad_ok
        FROM events GROUP BY 1
    """,
    "a42_mad_outliers": """
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY 1),
        mad AS (
            SELECT e.event_type, m.med,
                   quantile_cont(abs(e.value - m.med), 0.5) AS mad
            FROM events e JOIN med m USING (event_type)
            GROUP BY 1, 2)
        SELECT e.event_type, m.med, m.mad,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN abs(e.value - m.med)
                                  > 3.0 * 1.4826 * m.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM events e JOIN mad m ON e.event_type = m.event_type
        GROUP BY 1, 2, 3
    """,
    "a40_attribution": """
        WITH marked AS (
            SELECT user_id, ts, event_id, value, event_type,
                   last_value(CASE WHEN event_type <> 'purchase'
                                   THEN struct_pack(tts := ts,
                                                    tet := event_type)
                              END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS lt
            FROM events),
        pur AS (
            SELECT CASE WHEN lt IS NOT NULL
                         AND ts <= lt.tts + INTERVAL 7 DAY
                        THEN lt.tet ELSE 'none' END AS channel,
                   value
            FROM marked WHERE event_type = 'purchase')
        SELECT channel, COUNT(*) AS n_conversions,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS attributed_revenue
        FROM pur GROUP BY 1
    """,
    "a41_unpivot_measures": """
        WITH wide AS (
            SELECT event_type,
                   CAST(COUNT(*) AS DOUBLE) AS n_events,
                   CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                       AS total_value
            FROM events GROUP BY 1)
        SELECT event_type, 'n_events' AS measure, n_events AS value
        FROM wide
        UNION ALL
        SELECT event_type, 'n_users', n_users FROM wide
        UNION ALL
        SELECT event_type, 'total_value', total_value FROM wide
    """,
    "a39_whatif_discount": """
        WITH sc AS (SELECT UNNEST([CAST(0.0 AS DOUBLE),
                                   CAST(0.05 AS DOUBLE),
                                   CAST(0.10 AS DOUBLE)]) AS extra_discount)
        SELECT sc.extra_discount,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                   * (1.0 - sc.extra_discount), 6)
                             AS DECIMAL(28,6))) AS DOUBLE) AS scenario_revenue
        FROM lineitem l CROSS JOIN sc
        GROUP BY 1
    """,
    "a38_winsorized_stats": """
        WITH bounds AS (
            SELECT event_type,
                   quantile_cont(value, 0.05) AS lo,
                   quantile_cont(value, 0.95) AS hi
            FROM events GROUP BY 1),
        clipped AS (
            SELECT e.event_type, b.lo, b.hi, e.value,
                   LEAST(GREATEST(e.value, b.lo), b.hi) AS wv
            FROM events e JOIN bounds b USING (event_type))
        SELECT event_type,
               COUNT(*) AS n,
               CAST(COUNT(*) FILTER (WHERE value < lo) AS BIGINT)
                   AS n_clip_lo,
               CAST(COUNT(*) FILTER (WHERE value > hi) AS BIGINT)
                   AS n_clip_hi,
               ROUND(MIN(lo), 6) AS p05,
               ROUND(MIN(hi), 6) AS p95,
               CAST(SUM(CAST(ROUND(wv, 6) AS DECIMAL(28,6))) AS DOUBLE)
                   / COUNT(*) AS winsorized_mean
        FROM clipped GROUP BY 1
    """,
    "a37_ab_test": """
        WITH per_user AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase' AND value > 150
                            THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY 1),
        bv AS (
            SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 2 AS variant,
                   converted
            FROM per_user),
        counts AS (
            SELECT variant, COUNT(*) AS n_users,
                   CAST(SUM(converted) AS BIGINT) AS n_converted
            FROM bv GROUP BY 1),
        j AS (
            SELECT a.n_users AS n_a, a.n_converted AS c_a,
                   b.n_users AS n_b, b.n_converted AS c_b
            FROM (SELECT * FROM counts WHERE variant = 0) a
            CROSS JOIN (SELECT * FROM counts WHERE variant = 1) b)
        SELECT n_a, c_a, n_b, c_b,
               ROUND(CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
               ROUND(CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
               ROUND((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                      - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                     / sqrt((CAST(c_a + c_b AS DOUBLE)
                             / CAST(n_a + n_b AS DOUBLE))
                            * (1.0 - CAST(c_a + c_b AS DOUBLE)
                                     / CAST(n_a + n_b AS DOUBLE))
                            * (1.0 / CAST(n_a AS DOUBLE)
                               + 1.0 / CAST(n_b AS DOUBLE))), 6) AS z_score
        FROM j
    """,
    "a36_top_paths": """
        WITH seq AS (
            SELECT user_id, list(event_type ORDER BY ts, event_id) AS s
            FROM events GROUP BY 1),
        wins AS (
            SELECT s, UNNEST(range(0, GREATEST(0, len(s) - 2))) AS i
            FROM seq),
        paths AS (
            SELECT s[i + 1] || '>' || s[i + 2] || '>' || s[i + 3] AS path
            FROM wins),
        counts AS (SELECT path, COUNT(*) AS n FROM paths GROUP BY 1)
        SELECT path, n,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path ASC) AS BIGINT)
                   AS rnk
        FROM counts QUALIFY rnk <= 20
    """,
    "a34_monthly_price_band": """
        SELECT date_trunc('month', o_orderdate) AS month_start,
               quantile_cont(o_totalprice, 0.25) AS p25,
               quantile_cont(o_totalprice, 0.5) AS p50,
               quantile_cont(o_totalprice, 0.75) AS p75,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    "a35_transition_matrix": """
        WITH pairs AS (
            SELECT LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS from_state,
                   event_type AS to_state
            FROM events),
        counts AS (
            SELECT from_state, to_state, COUNT(*) AS n_transitions
            FROM pairs WHERE from_state IS NOT NULL
            GROUP BY 1, 2)
        SELECT from_state, to_state, n_transitions,
               CAST(n_transitions AS DOUBLE)
                   / CAST(SUM(n_transitions) OVER (PARTITION BY from_state)
                          AS DOUBLE) AS p_transition
        FROM counts
    """,
    "a33_salted_join_revenue": """
        SELECT n.n_name AS nation,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1
    """,
    "a31_salted_hot_keys": """
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
               MAX(event_id) AS max_event_id
        FROM events GROUP BY 1
    """,
    "a29_trend_slope": """
        WITH monthly AS (
            SELECT n.n_name AS nation,
                   CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 23880 AS BIGINT) AS x,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS y
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2),
        m AS (
            SELECT nation,
                   CAST(COUNT(*) AS DOUBLE) AS n_months,
                   CAST(SUM(x) AS DOUBLE) AS sx,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(x * y) AS DOUBLE) AS sxy,
                   CAST(SUM(x * x) AS DOUBLE) AS sxx
            FROM monthly GROUP BY 1)
        SELECT nation,
               CAST(n_months AS BIGINT) AS n_months,
               (n_months * sxy - sx * sy) / NULLIF(n_months * sxx - sx * sx, 0) AS slope,
               sy / n_months
                 - ((n_months * sxy - sx * sy) / NULLIF(n_months * sxx - sx * sx, 0))
                   * (sx / n_months) AS intercept
        FROM m
    """,
    "a30_corr_pairs": """
        WITH m AS (
            SELECT l_returnflag AS returnflag,
                   COUNT(*) AS n_items,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                                 * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
                   CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                                 * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                 * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS syy
            FROM lineitem GROUP BY 1)
        SELECT returnflag, n_items,
               (CAST(n_items AS DOUBLE) * sxy - sx * sy)
                 / NULLIF(sqrt(CAST(n_items AS DOUBLE) * sxx - sx * sx)
                          * sqrt(CAST(n_items AS DOUBLE) * syy - sy * sy), 0) AS pearson_r
        FROM m
    """,
    "a32_windowed_funnel": """
        WITH tv AS (
            SELECT user_id, MIN(ts) AS tv FROM events
            WHERE event_type = 'view' GROUP BY 1),
        tc AS (
            SELECT e.user_id, MIN(e.ts) AS tc
            FROM events e JOIN tv USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > tv.tv
              AND e.ts <= tv.tv + INTERVAL 24 HOURS
            GROUP BY 1),
        tp AS (
            SELECT e.user_id, MIN(e.ts) AS tp
            FROM events e JOIN tc USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > tc.tc
              AND e.ts <= tc.tc + INTERVAL 24 HOURS
            GROUP BY 1)
        SELECT (SELECT COUNT(*) FROM tv) AS n_view,
               (SELECT COUNT(*) FROM tc) AS n_click_24h,
               (SELECT COUNT(*) FROM tp) AS n_purchase_24h
    """,
    "a28_ordered_funnel": """
        WITH tv AS (
            SELECT user_id, MIN(ts) AS tv FROM events
            WHERE event_type = 'view' GROUP BY 1),
        tc AS (
            SELECT e.user_id, MIN(e.ts) AS tc
            FROM events e JOIN tv USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > tv.tv
            GROUP BY 1),
        tp AS (
            SELECT e.user_id, MIN(e.ts) AS tp
            FROM events e JOIN tc USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > tc.tc
            GROUP BY 1)
        SELECT (SELECT COUNT(*) FROM tv) AS n_view,
               (SELECT COUNT(*) FROM tc) AS n_click_after_view,
               (SELECT COUNT(*) FROM tp) AS n_purchase_after_click
    """,
    "a27_benford_audit": """
        WITH per AS (
            SELECT CAST(FLOOR(o_totalprice
                       / POW(10.0, FLOOR(LOG10(o_totalprice)))) AS INTEGER)
                       AS digit,
                   COUNT(*) AS n_orders
            FROM orders WHERE o_totalprice > 0
            GROUP BY 1),
        tot AS (SELECT SUM(n_orders) AS n_total FROM per)
        SELECT digit, n_orders,
               CAST(n_orders AS DOUBLE) / n_total AS observed_p,
               LOG10(1.0 + 1.0 / digit) AS expected_p,
               (CAST(n_orders AS DOUBLE) / n_total - LOG10(1.0 + 1.0 / digit))
                   * (CAST(n_orders AS DOUBLE) / n_total
                      - LOG10(1.0 + 1.0 / digit))
                   / LOG10(1.0 + 1.0 / digit) AS chi2_term
        FROM per CROSS JOIN tot
    """,
    "a24_cohort_retention": """
        WITH base AS (
            SELECT user_id,
                   date_trunc('month', CAST(ts AS TIMESTAMP)) AS am
            FROM events),
        firsts AS (
            SELECT user_id, MIN(am) AS cohort_month FROM base GROUP BY 1),
        cells AS (
            SELECT f.cohort_month,
                   CAST(datediff('month', f.cohort_month, a.am) AS INTEGER)
                       AS month_offset,
                   COUNT(*) AS n_active
            FROM (SELECT DISTINCT user_id, am FROM base) a
            JOIN firsts f USING (user_id)
            GROUP BY 1, 2),
        sizes AS (
            SELECT cohort_month, COUNT(*) AS n_cohort FROM firsts GROUP BY 1)
        SELECT c.cohort_month, c.month_offset, c.n_active, s.n_cohort,
               CAST(c.n_active AS DOUBLE) / s.n_cohort AS retention
        FROM cells c JOIN sizes s USING (cohort_month)
    """,
    "a25_attribution": """
        WITH ranked AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events),
        firsts AS (
            SELECT user_id, event_type AS first_touch FROM ranked WHERE rn = 1),
        purchases AS (
            SELECT user_id, value FROM events WHERE event_type = 'purchase')
        SELECT f.first_touch,
               COUNT(DISTINCT f.user_id) AS n_users,
               CAST(SUM(CAST(COALESCE(p.value, 0.0) AS DECIMAL(18,2)))
                    AS DOUBLE) AS attributed_revenue
        FROM firsts f LEFT JOIN purchases p USING (user_id)
        GROUP BY 1
    """,
    "a26_rfm": """
        WITH pur AS (
            SELECT user_id, CAST(ts AS DATE) AS d, value
            FROM events WHERE event_type = 'purchase'),
        anchor AS (SELECT MAX(d) AS anchor_day FROM pur),
        per_user AS (
            SELECT user_id, MAX(d) AS last_day, COUNT(*) AS frequency,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
            FROM pur GROUP BY 1),
        scored AS (
            SELECT user_id,
                   datediff('day', last_day, a.anchor_day) AS recency_days,
                   frequency, monetary
            FROM per_user CROSS JOIN anchor a),
        tiles AS (
            SELECT CAST(NTILE(4) OVER (ORDER BY recency_days, user_id)
                        AS INTEGER) AS r_score,
                   CAST(NTILE(4) OVER (ORDER BY frequency DESC, user_id)
                        AS INTEGER) AS f_score,
                   CAST(NTILE(4) OVER (ORDER BY monetary DESC, user_id)
                        AS INTEGER) AS m_score,
                   monetary
            FROM scored)
        SELECT r_score, f_score, m_score,
               COUNT(*) AS n_users,
               CAST(SUM(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_monetary
        FROM tiles GROUP BY 1, 2, 3
    """,

    "a23_equidepth_hist": """
        WITH ranked AS (
            SELECT value, NTILE(10) OVER (ORDER BY value, event_id) AS bucket
            FROM events)
        SELECT bucket, COUNT(*) AS n_rows,
               MIN(value) AS lo, MAX(value) AS hi
        FROM ranked GROUP BY bucket
    """,
    "u3_except": """
        SELECT DISTINCT o_custkey AS custkey FROM orders
        EXCEPT
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_orderstatus = 'F'
    """,
    "u4_intersect": """
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    """,
    "a19_above_segment_avg": """
        WITH w AS (
            SELECT c_custkey, c_mktsegment, c_acctbal,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (
                        PARTITION BY c_mktsegment) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY c_mktsegment) AS segment_avg
            FROM customer)
        SELECT c_custkey, c_mktsegment, c_acctbal, segment_avg
        FROM w WHERE c_acctbal > segment_avg
    """,
    "a22_grouping_sets": """
        SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                    ELSE o_orderstatus END AS status,
               CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                    ELSE o_orderpriority END AS priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amount
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderpriority), ())
    """,
    "a20_cube": """
        SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                    ELSE o_orderstatus END AS status,
               CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                    ELSE o_orderpriority END AS priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amount
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "a21_collect_list": """
        SELECT user_id,
               array_to_string(list_sort(list(event_id)), ',') AS event_ids,
               COUNT(*) AS n_events
        FROM events GROUP BY user_id
    """,
    "p19_posexplode": """
        SELECT p_partkey,
               CAST(i - 1 AS BIGINT) AS pos,
               toks[i] AS tok
        FROM (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part),
             UNNEST(range(1, len(toks) + 1)) AS u(i)
    """,
    "p18_string_kit": """
        SELECT p_partkey,
               substr(p_name, 1, 4) AS name_prefix,
               lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
               regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
               string_split(p_name, ' ')[1] AS first_word,
               CAST(length(p_type) AS BIGINT) AS type_len
        FROM part
        WHERE p_type LIKE '%M%'
    """,
    "a17_pivot_funnel": """
        SELECT date_trunc('month', CAST(ts AS TIMESTAMP)) AS month_start,
               COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
               COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
               COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
        FROM events GROUP BY 1
    """,
    "a18_percentiles": """
        SELECT o_orderstatus AS status,
               quantile_cont(o_totalprice, 0.5) AS p50_amount,
               quantile_cont(o_totalprice, 0.9) AS p90_amount,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    "x_quality_filter": f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   length(text) AS n_chars,
                   len(string_split(trim(text), ' ')) AS n_tokens,
                   CASE WHEN len(string_split(trim(text), ' ')) = 0 THEN NULL
                        ELSE CAST(length(trim(text))
                                  - (len(string_split(trim(text), ' ')) - 1) AS DOUBLE)
                             / len(string_split(trim(text), ' '))
                   END AS atl,
                   CASE WHEN len(string_split(trim(text), ' ')) = 0 THEN NULL
                        ELSE CAST(len(list_filter(string_split(trim(text), ' '),
                                                  x -> x IN ({_SW}))) AS DOUBLE)
                             / len(string_split(trim(text), ' '))
                   END AS swr
            FROM documents),
        kept AS (
            SELECT lang, COUNT(*) AS n_kept FROM scored
            WHERE n_chars >= 50 AND n_tokens >= 10
              AND atl >= 2.0 AND atl <= 12.0 AND swr >= 0.01
            GROUP BY lang),
        total AS (SELECT lang, COUNT(*) AS n_total FROM scored GROUP BY lang)
        SELECT t.lang, t.n_total,
               CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
               CAST(COALESCE(k.n_kept, 0) AS DOUBLE) / t.n_total AS retention
        FROM total t LEFT JOIN kept k USING (lang)
    """,
}

QUERIES = {
    "a43_km_survival": q_a43_km_survival,
    "a44_gini": q_a44_gini,
    "a45_abc": q_a45_abc,
    "a17_pivot_funnel": q_a17_pivot_funnel,
    "a23_equidepth_hist": q_a23_equidepth_hist,
    "a18_percentiles": q_a18_percentiles,
    "a19_above_segment_avg": q_a19_above_segment_avg,
    "a20_cube": q_a20_cube,
    "a22_grouping_sets": q_a22_grouping_sets,
    "a21_collect_list": q_a21_collect_list,
    "p19_posexplode": q_p19_posexplode,
    "u3_except": q_u3_except,
    "u4_intersect": q_u4_intersect,
    "p18_string_kit": q_p18_string_kit,
    "x_quality_filter": q_x_quality_filter,
    "a24_cohort_retention": q_a24_cohort_retention,
    "a25_attribution": q_a25_attribution,
    "a26_rfm": q_a26_rfm,
    "a27_benford_audit": q_a27_benford_audit,
    "a28_ordered_funnel": q_a28_ordered_funnel,
    "a29_trend_slope": q_a29_trend_slope,
    "a30_corr_pairs": q_a30_corr_pairs,
    "a31_salted_hot_keys": q_a31_salted_hot_keys,
    "a32_windowed_funnel": q_a32_windowed_funnel,
    "a33_salted_join_revenue": q_a33_salted_join_revenue,
    "a34_monthly_price_band": q_a34_monthly_price_band,
    "a35_transition_matrix": q_a35_transition_matrix,
    "a36_top_paths": q_a36_top_paths,
    "a37_ab_test": q_a37_ab_test,
    "a38_winsorized_stats": q_a38_winsorized_stats,
    "a39_whatif_discount": q_a39_whatif_discount,
    "a40_attribution": q_a40_attribution,
    "a41_unpivot_measures": q_a41_unpivot_measures,
    "a42_mad_outliers": q_a42_mad_outliers,
    "a23_equidepth_approx": q_a23_equidepth_approx,
    "a26_rfm_approx": q_a26_rfm_approx,
    "a34_price_band_approx": q_a34_price_band_approx,
    "a42_mad_approx": q_a42_mad_approx,
}
