"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship dashboard query; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2
plus the training-data-pipeline extensions — 272 registered queries,
271 with DuckDB oracles, 1 rows-only: x_pca_project
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


# Round-15 gate front block. Every round-14 front name is green in
# CORRECTNESS_r14 (50/50), so the 50-slot window now holds: (a) the
# round-15 additions (never-checked names MUST debut in the front,
# scripts/check_rotation.py enforces it), (b) STALENESS ROTATION —
# the COMPLETE 30-name r9-vintage tier (the oldest tier once
# CORRECTNESS_r14 landed; staged verbatim as _ROTATION_R15 last
# round), and (c) the spare slots promote the alphabetically-first
# r10-tier names so the NEXT-oldest tier starts draining early.
# After this window runs, no catalog name's newest driver row is
# older than r10.
_GATE_PRIORITY = (
    # -- (a) new in round 15 ------------------------------------------------
    "t25_drift_dashboard_incr",
    "x_paragraph_dedup_agg",
    "x_bm25_delete",
    "x_ann_nsw_delete",
    # -- (b) staleness rotation: the complete 30-name r9 tier ---------------
    "t11_interval_join_batch",
    "t13_twap",
    "t17_rolling_quantiles",
    "u7_cdc_asof",
    "w10_cumulative_distinct",
    "x_bloom_decontaminate",
    "x_collocations",
    "x_dedup_clusters_minlabel",
    "x_doc_entropy",
    "x_editdist_pairs",
    "x_embed_stats",
    "x_hard_negatives",
    "x_kmv_distinct",
    "x_kmv_setops",
    "x_mixture_sample",
    "x_ngram_containment",
    "x_pca_project",
    "x_priority_sample",
    "x_profile_table",
    "x_semdedup",
    "x_sliding_span_dedup",
    "x_span_dedup",
    "x_tdigest_quantiles",
    "x_tdigest_rollup",
    "x_token_spectrum",
    "x_triangles",
    "x_trigram_nll",
    "x_unigram_nll",
    "x_zipf_fit",
    "x_zorder_key",
    # -- (c) early r10-tier promotions (fill to exactly 50) ------------------
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
)

# Round-16 rotation backlog: the 28 r10-vintage names NOT promoted in
# the round-15 front (the oldest staleness tier once round 15 lands).
# It fits one front with slots to spare for round-16 additions;
# run scripts/check_rotation.py to re-derive.
_ROTATION_R16: tuple[str, ...] = (
    "l22_nation_profit",
    "l23_stock_concentration",
    "w11_asof_snapshot",
    "w12_rolling_distinct",
    "w13_range_frame",
    "x_ann_recall",
    "x_card_redact",
    "x_cluster_split",
    "x_dataset_card",
    "x_dd_quantiles",
    "x_dedup_clusters",
    "x_dedup_simhash",
    "x_dsir_weights",
    "x_golden_records",
    "x_kcore",
    "x_knn_classify",
    "x_logreg_quality",
    "x_lsh_precision",
    "x_lsh_recall",
    "x_mmr_first",
    "x_mojibake",
    "x_multimodal_meta",
    "x_nb_lang",
    "x_normalized_dedup",
    "x_pca_invariants",
    "x_softdedup_weights",
    "x_sorted_neighborhood",
    "x_video_meta",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Gate-priority names register first (see _GATE_PRIORITY), then
    # the round-2 additions, then the round-1-checked families, so
    # per-round CORRECTNESS files union toward full coverage.
    all_q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (warehouse, windows, extensions, measures, analytics, scalars, temporal):
        all_q.update(mod.QUERIES)
    out = {n: all_q[n] for n in _GATE_PRIORITY if n in all_q}
    out.update({n: all_q[n] for n in _ROTATION_R16 if n in all_q and n not in out})
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
