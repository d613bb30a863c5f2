"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship dashboard query; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2
plus the training-data-pipeline extensions — 264 registered queries,
263 with DuckDB oracles, 1 rows-only: x_pca_project
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


# Round-13 gate front block. Every round-12 front name is green in
# CORRECTNESS_r12, so the 50-slot window now holds: (a) the 6
# round-13 additions (never-checked names MUST debut in the front,
# scripts/check_rotation.py enforces it), (b) the two returning
# SENTINELS — a29/a30 sat out round 12 under an explicit IOU and
# come back first, and (c) STALENESS ROTATION — the COMPLETE 42-name
# r7-vintage tier (the oldest tier once CORRECTNESS_r12 landed;
# _ROTATION_R13 carried it plus the sentinels at 51 names, so this
# round's split is: all 44 of those here, nothing deferred).
# 6 + 2 + 42 = exactly 50 — the sixth addition (t23, a late-session
# surface) displaced the round's single r8 promotion back into
# _ROTATION_R14. After this window runs, no catalog name's newest
# driver row is older than r8.
_GATE_PRIORITY = (
    # -- (a) new in round 13 ------------------------------------------------
    "x_w1_drain",
    "x_mlt_drain",
    "x_chunk_sentences",
    "t22_rolling_drift",
    "x_ann_hnsw",
    "t23_rolling_chi2",
    # -- (b) the two returning sentinels (round-12 IOU) ---------------------
    "a29_trend_slope",
    "a30_corr_pairs",
    # -- (c) staleness rotation: the complete 42-name r7 tier ---------------
    "l14_large_volume_orders",
    "l15_disjunctive_revenue",
    "p12_bool_cast",
    "p14_reserialize",
    "p15_case_transform",
    "p17_html_strip",
    "p18_string_kit",
    "p19_posexplode",
    "t1_asof_purchase_click",
    "t2_session_stats",
    "t4_session_window",
    "t5_range_join",
    "u1_union_offices",
    "u2_backfill_stream_merge",
    "u3_except",
    "u4_intersect",
    "w4_lag_lead",
    "w5_moving_avg",
    "w6_distribution_ranks",
    "w7_growth_rates",
    "w8_ytd",
    "x_ann_bruteforce",
    "x_ann_bucketed",
    "x_ann_ivf",
    "x_ann_pq",
    "x_chunk_documents",
    "x_decontaminate",
    "x_dedup_exact",
    "x_dedup_minhash_est",
    "x_dedup_minhash_lsh",
    "x_domain_cap",
    "x_embed_near_dup",
    "x_fingerprint",
    "x_global_rank",
    "x_incremental_neardup",
    "x_lang_id",
    "x_quality_filter",
    "x_spacesaving_drain",
    "x_suffix_array",
    "x_suffix_lcp",
    "x_suffix_lcp_ranks",
    "x_suffix_removal",
)

# Round-14 rotation backlog: the complete 39-name r8-vintage tier
# (the oldest staleness tier once round 13 lands). It fits one front
# with 11 slots to spare for round-14 additions + sentinels; run
# scripts/check_rotation.py to re-derive.
_ROTATION_R14: tuple[str, ...] = (
    "a21_collect_list",
    "a23_equidepth_approx",
    "a23_equidepth_hist",
    "a24_cohort_retention",
    "a25_attribution",
    "a26_rfm",
    "a26_rfm_approx",
    "a27_benford_audit",
    "a28_ordered_funnel",
    "a31_salted_hot_keys",
    "a34_price_band_approx",
    "a42_mad_approx",
    "p20_unpivot",
    "t6_ohlc_downsample",
    "t7_gap_fill",
    "t8_ewma",
    "t9_anomaly_mad",
    "u5_cdc_apply",
    "u6_dq_checks",
    "w9_scd2_history",
    "x_ann_ivf_pq",
    "x_ann_refine",
    "x_backoff_nll",
    "x_bigram_nll",
    "x_calibration_approx",
    "x_length_clip",
    "x_ngram_jaccard",
    "x_pack_sequences",
    "x_pii_redact",
    "x_repetition",
    "x_source_mixture",
    "x_source_overlap",
    "x_stratified_sample",
    "x_suffix_removal_ranks",
    "x_text_stats",
    "x_tfidf",
    "x_token_counts",
    "x_train_split",
    "x_winnow_pairs",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Gate-priority names register first (see _GATE_PRIORITY), then
    # the round-2 additions, then the round-1-checked families, so
    # per-round CORRECTNESS files union toward full coverage.
    all_q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (warehouse, windows, extensions, measures, analytics, scalars, temporal):
        all_q.update(mod.QUERIES)
    out = {n: all_q[n] for n in _GATE_PRIORITY if n in all_q}
    out.update({n: all_q[n] for n in _ROTATION_R14 if n in all_q and n not in out})
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
