"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship dashboard query; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2
plus the training-data-pipeline extensions — 258 registered queries,
257 with DuckDB oracles, 1 rows-only: x_pca_project
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


# Round-12 gate front block. Every round-11 front name is green in
# CORRECTNESS_r11, so the 50-slot window now holds: (a) the 13
# round-12 additions (inserted at the top as they land —
# never-checked names MUST debut in the front,
# scripts/check_rotation.py enforces it), (b) 4 of the 6
# double-arithmetic SENTINELS (a29/a30 sit out this round — see the
# section comment), and (c) STALENESS ROTATION — the complete
# 33-name r6-vintage tier staged as _ROTATION_R12 last round (the
# oldest tier). 13 + 4 + 33 = exactly 50: the second session's
# additions displaced the whole r7 fill plus two sentinels into
# _ROTATION_R13, which now carries the full r7 tier + a29/a30 (51
# names — more than one front, so round 13 must split it; the
# checker only requires oldest-tier + never-checked to fit). After
# this window runs, no catalog name's newest driver row is older
# than r7.
_GATE_PRIORITY = (
    # -- (a) new in round 12 ------------------------------------------------
    "x_golden_priority",
    "x_bm25_drain",
    "x_ks_drain",
    "x_mlt",
    "x_w1_drift",
    "x_chi2_drift",
    "x_hybrid_rrf",
    "t20_seasonal",
    "t21_theil_sen",
    "x_chi2_drain",
    "a45_abc",
    "x_golden_conflicts",
    "x_ngram_novelty",
    # -- (b) sentinels: fragile double-fold bit-exactness. a29/a30 sit
    # out THIS round only — their numpy parity is independently pinned
    # in tests/test_plans.py every suite run, and the two slots let the
    # last round-12 additions make their mandatory never-checked debut;
    # both return to the front in round 13 --------------------------------
    "t10_holt",
    "t12_holt_winters",
    "x_pagerank",
    "x_linkage_score",
    # -- (c) staleness rotation: the complete 33-name r6 tier ---------------
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

# Round-13 rotation backlog: the remaining r7-vintage names (the
# oldest staleness tier once round 12 lands). Promote behind round-13
# additions + the sentinels; r8-vintage names come next (run
# scripts/check_rotation.py to re-derive).
_ROTATION_R13: tuple[str, ...] = (
    "a29_trend_slope",
    "a30_corr_pairs",
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Gate-priority names register first (see _GATE_PRIORITY), then
    # the round-2 additions, then the round-1-checked families, so
    # per-round CORRECTNESS files union toward full coverage.
    all_q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (warehouse, windows, extensions, measures, analytics, scalars, temporal):
        all_q.update(mod.QUERIES)
    out = {n: all_q[n] for n in _GATE_PRIORITY if n in all_q}
    out.update({n: all_q[n] for n in _ROTATION_R13 if n in all_q and n not in out})
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
