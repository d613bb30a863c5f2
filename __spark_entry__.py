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


# Round-14 gate front block. Every round-13 front name is green in
# CORRECTNESS_r13 (50/50), so the 50-slot window now holds: (a) the
# round-14 additions (never-checked names MUST debut in the front,
# scripts/check_rotation.py enforces it), (b) STALENESS ROTATION —
# the COMPLETE 39-name r8-vintage tier (the oldest tier once
# CORRECTNESS_r13 landed; staged verbatim as _ROTATION_R14 last
# round), and (c) the spare slots promote the alphabetically-first
# r9-tier names so the NEXT-oldest tier starts draining early.
# After this window runs, no catalog name's newest driver row is
# older than r9.
_GATE_PRIORITY = (
    # -- (a) new in round 14 ------------------------------------------------
    "x_ann_hnsw_store",
    "x_paragraph_dedup",
    "x_paragraph_dedup_drain",
    "t24_drift_dashboard_drain",
    # -- (b) staleness rotation: the complete 39-name r8 tier ---------------
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
    # -- (c) early r9-tier promotions (fill to exactly 50) -------------------
    "a32_windowed_funnel",
    "a33_salted_join_revenue",
    "a34_monthly_price_band",
    "a35_transition_matrix",
    "a37_ab_test",
    "a38_winsorized_stats",
    "a39_whatif_discount",
)

# Round-15 rotation backlog: the 30 r9-vintage names NOT promoted in
# the round-14 front (the oldest staleness tier once round 14 lands).
# It fits one front with 20 slots to spare for round-15 additions;
# run scripts/check_rotation.py to re-derive.
_ROTATION_R15: tuple[str, ...] = (
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
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Gate-priority names register first (see _GATE_PRIORITY), then
    # the round-2 additions, then the round-1-checked families, so
    # per-round CORRECTNESS files union toward full coverage.
    all_q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (warehouse, windows, extensions, measures, analytics, scalars, temporal):
        all_q.update(mod.QUERIES)
    out = {n: all_q[n] for n in _GATE_PRIORITY if n in all_q}
    out.update({n: all_q[n] for n in _ROTATION_R15 if n in all_q and n not in out})
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
