"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship dashboard query; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2
plus the training-data-pipeline extensions — 229 registered queries,
228 with DuckDB oracles, 1 rows-only: x_pca_project
(numpy eigh) — PERMANENTLY rows-only by round-6 decision: its
Parseval shadow ``x_pca_invariants`` checks centering/orthonormality
in SQL, and ``x_power_iteration`` proves the distributed eigen-math
cross-engine-exact in integer fixed-point. Round-5 graduations out
of rows-only: BPE encode (frozen merge artifact), BPE train (10
unrolled CTE rounds), MMR re-rank (k=5 greedy trajectory unrolled),
HLL rollup (exact-distinct + tolerance boolean), trained IVF
(recall-floor audit); SimHash graduated in round 4.
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
    funnel trend — events deduped by id, funnel stage counts and
    conversion ratios per day (A1 + A4 + A10 in one plan; daily
    buckets because the fixture's event stream spans ~30 days)."""
    ev = measures.t(spark, SMOKE_SF_DIR, "events")
    deduped = ev.dropDuplicates(["event_id"])
    monthly = (
        deduped.groupBy(F.date_trunc("day", "ts").alias("bucket_start"))
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


# Round-10 gate front block. Every round-9 front name is green in
# CORRECTNESS_r09, so the 50-slot window now holds: (a) the 1 round-10
# addition (the mojibake encoding-QA surface), (b) the 8 queries whose
# plan changed this round (fMP4 media-segment rows + the fragmented
# flag in the video/multimodal decodes; the word-boundary fold in the
# card redaction; the fused star-forest check + size-gated local
# finish inside star-contraction CC, which also feeds cluster_split,
# the soft-dedup weights, and — new this round — the golden-records
# entity clustering; the same local finish in the k-core peel),
# (c) the 6 permanent double-arithmetic SENTINELS, then (d)
# STALENESS ROTATION — the 17 r4-vintage names staged as
# _ROTATION_R10 last round, followed by the 18 alphabetically-first
# r5-vintage names; the remaining 24 r5 names stage as _ROTATION_R11.
# After this window no catalog name's newest driver row is older
# than r5.
_GATE_PRIORITY = (
    # -- (a) new in round 10 ------------------------------------------------
    "x_mojibake",
    # -- (b) plan changed this round ---------------------------------------
    "x_video_meta",
    "x_multimodal_meta",
    "x_card_redact",
    "x_dedup_clusters",
    "x_cluster_split",
    "x_softdedup_weights",
    "x_kcore",
    "x_golden_records",
    # -- (c) permanent sentinels: fragile double-fold bit-exactness --------
    "t10_holt",
    "t12_holt_winters",
    "x_pagerank",
    "a29_trend_slope",
    "a30_corr_pairs",
    "x_linkage_score",
    # -- (d) staleness rotation: the 17 staged r4-vintage names -------------
    "w11_asof_snapshot",
    "w12_rolling_distinct",
    "w13_range_frame",
    "x_ann_recall",
    "x_dataset_card",
    "x_dd_quantiles",
    "x_dedup_simhash",
    "x_dsir_weights",
    "x_knn_classify",
    "x_logreg_quality",
    "x_lsh_precision",
    "x_lsh_recall",
    "x_mmr_first",
    "x_nb_lang",
    "x_normalized_dedup",
    "x_pca_invariants",
    "x_sorted_neighborhood",
    # r5 vintage from here (alphabetical first 20 of 42)
    "a36_top_paths",
    "a40_attribution",
    "a41_unpivot_measures",
    "a42_mad_outliers",
    "a6_leaderboard",
    "l10_order_count_dist",
    "l11_idle_rich_customers",
    "l12_promo_revenue",
    "l13_small_qty_revenue",
    "l16_small_qty_brand_revenue",
    "l17_dominant_suppliers",
    "l18_idle_big_accounts",
    "l19_priority_late_orders",
    "l1_pricing_summary",
    "l20_nation_trade_pairs",
    "l21_market_share",
    "l22_nation_profit",
    "l23_stock_concentration",
)

# Round-11 rotation backlog: the 24 remaining r5-vintage names (oldest
# staleness tier after round 10). Promote behind round-11 additions +
# the sentinels; r6-vintage names (see CORRECTNESS_r06) come next.
_ROTATION_R11: tuple[str, ...] = (
    "l24_forecast_revenue",
    "l25_priority_mode_split",
    "l26_waiting_suppliers",
    "l2_revenue_by_nation",
    "l3_top_parts",
    "l4_order_lifecycle",
    "l5_top_revenue_orders",
    "l6_returned_customers",
    "l7_lone_late_suppliers",
    "l8_supplier_variety",
    "l9_groupwise_min",
    "t14_cusum",
    "t15_backtest",
    "t3_top_terms",
    "x_ann_ivf_trained",
    "x_bpe_encode",
    "x_bpe_train",
    "x_calibration",
    "x_cms_heavy_hitters",
    "x_hll_rollup",
    "x_label_prop",
    "x_mmr_rerank",
    "x_nb_confusion",
    "x_prefix_join",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Gate-priority names register first (see _GATE_PRIORITY), then
    # the round-2 additions, then the round-1-checked families, so
    # per-round CORRECTNESS files union toward full coverage.
    all_q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (warehouse, windows, extensions, measures, analytics, scalars, temporal):
        all_q.update(mod.QUERIES)
    out = {n: all_q[n] for n in _GATE_PRIORITY if n in all_q}
    out.update({n: all_q[n] for n in _ROTATION_R11 if n in all_q and n not in out})
    out.update({n: f for n, f in all_q.items() if n not in out})
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
