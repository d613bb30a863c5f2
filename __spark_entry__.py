"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship dashboard query; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2
plus the training-data-pipeline extensions — 245 registered queries,
244 with DuckDB oracles, 1 rows-only: x_pca_project
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


# Round-11 gate front block. Every round-10 front name is green in
# CORRECTNESS_r10, so the 50-slot window now holds: (a) the 16 round-11
# additions (mode-survivorship golden records; the full-mojibake-
# repair gate; the streaming soft-dedup drain; URL canonicalization;
# BM25 retrieval; the KS drift test; the ACF diagnostic; the PSI drift score; the lead/lag cross-correlation; the streaming PSI drain; the Kaplan-Meier conversion curve; basket lift; Flesch readability; the Gini concentration index; per-doc keyphrases; source JS divergence),
# (b) the 6 permanent double-arithmetic SENTINELS, then
# (c) STALENESS ROTATION — the 24 r5-vintage names staged as
# _ROTATION_R11 last round (the complete oldest tier), followed by
# the 4 alphabetically-first r6-vintage names; the remaining 33 r6
# names stage as _ROTATION_R12. No registered query's PLAN changed
# this round (the round-11 streaming/curation work is pytest-surface
# only), so there is no (plan-changed) block. After this window no
# catalog name's newest driver row is older than r6. The invariant is
# now MACHINE-CHECKED by scripts/check_rotation.py (run in
# tests/test_contract.py) — a mis-staged front fails the suite
# instead of silently aging a query.
_GATE_PRIORITY = (
    # -- (a) new in round 11 ------------------------------------------------
    "x_golden_mode",
    "x_mojibake_full",
    "x_softdedup_drain",
    "x_url_canon",
    "x_bm25",
    "x_ks_drift",
    "t18_acf",
    "x_psi_drift",
    "t19_xcorr",
    "x_psi_drain",
    "a43_km_survival",
    "l28_copurchase_lift",
    "x_readability",
    "a44_gini",
    "x_keyphrases",
    "x_js_divergence",
    # -- (b) permanent sentinels: fragile double-fold bit-exactness --------
    "t10_holt",
    "t12_holt_winters",
    "x_pagerank",
    "a29_trend_slope",
    "a30_corr_pairs",
    "x_linkage_score",
    # -- (c) staleness rotation: the 24 staged r5-vintage names (full
    # oldest tier) --------------------------------------------------------
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
    # r6 vintage from here (alphabetical first 4 of 37)
    "a10_monthly_trend",
    "a11_origin_counts",
    "a12_agent_measures",
    "a13_detail_listing",
)

# Round-12 rotation backlog: the 33 remaining r6-vintage names (oldest
# staleness tier after round 11). Promote behind round-12 additions +
# the sentinels; r7-vintage names (see CORRECTNESS_r07) come next.
_ROTATION_R12: tuple[str, ...] = (
    "a14_slicer_filtered",
    "a15_calendar",
    "a16_distinct_counts",
    "a17_pivot_funnel",
    "a18_percentiles",
    "a19_above_segment_avg",
    "a1_funnel",
    "a20_cube",
    "a22_grouping_sets",
    "a2_total_amount",
    "a3_avg_ticket",
    "a4_conversion_ratios",
    "a5_goal_progress",
    "a7_latest_per_key",
    "a8_rollup_agent_table",
    "a9_percent_of_total",
    "j1_gapless_monthly",
    "j3_enriched_events",
    "j5_active_anti_deleted",
    "l27_top_supplier",
    "p10_format_local",
    "p11_tags_csv",
    "p3_coalesce_extract",
    "p8_multiformat_ts",
    "p9_tz_convert",
    "t16_cusum_drain",
    "x_ann_rptree",
    "x_hilbert_key",
    "x_kmv_drain",
    "x_power_iteration",
    "x_substring_removal",
    "x_substring_spans",
    "x_tdigest_drain",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Gate-priority names register first (see _GATE_PRIORITY), then
    # the round-2 additions, then the round-1-checked families, so
    # per-round CORRECTNESS files union toward full coverage.
    all_q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (warehouse, windows, extensions, measures, analytics, scalars, temporal):
        all_q.update(mod.QUERIES)
    out = {n: all_q[n] for n in _GATE_PRIORITY if n in all_q}
    out.update({n: all_q[n] for n in _ROTATION_R12 if n in all_q and n not in out})
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
