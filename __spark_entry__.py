"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship dashboard query; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2
plus the training-data-pipeline extensions — 224 registered queries,
223 with DuckDB oracles, 1 rows-only: x_pca_project
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


# Round-8 gate front block. Every round-7 front name is green in
# CORRECTNESS_r07, so the 50-slot window now holds: (a) the 6 round-8
# additions — the SCALE-MODE gate rows the round-7 verdict ordered
# (tie-robust rank audits of the approx bucketing/percentile paths,
# plus the end-to-end ranks-mode suffix removal), (b) the 4 queries
# whose plan changed this round (batch t-digest build/merge/quantiles
# moved JVM-side; x_kcore moved to the scale-robust 2-core), (c) the
# 6 permanent double-arithmetic SENTINELS, then (d) STALENESS
# ROTATION — the 14 r2-vintage names staged as _ROTATION_R8 last
# round, followed by the 20 alphabetically-first r3-vintage names;
# the remaining r3 names roll to _ROTATION_R9. After this window no
# catalog name's newest driver row is older than r3.
_GATE_PRIORITY = (
    # -- (a) new in round 8: scale modes under the gate --------------------
    "a23_equidepth_approx",
    "a26_rfm_approx",
    "a34_price_band_approx",
    "a42_mad_approx",
    "x_calibration_approx",
    "x_suffix_removal_ranks",
    # -- (b) plan changed this round ---------------------------------------
    "x_tdigest_quantiles",
    "x_tdigest_rollup",
    "t17_rolling_quantiles",
    "x_kcore",
    # -- (c) permanent sentinels: fragile double-fold bit-exactness --------
    "t10_holt",
    "t12_holt_winters",
    "x_pagerank",
    "a29_trend_slope",
    "a30_corr_pairs",
    "x_linkage_score",
    # -- (d) staleness rotation: the staged r2 vintage ---------------------
    "x_length_clip",
    "x_multimodal_meta",
    "x_ngram_jaccard",
    "x_pack_sequences",
    "x_pii_redact",
    "x_repetition",
    "x_source_mixture",
    "x_source_overlap",
    "x_stratified_sample",
    "x_text_stats",
    "x_tfidf",
    "x_token_counts",
    "x_train_split",
    "x_winnow_pairs",
    # r3 vintage from here (alphabetical; x_pca_project excluded —
    # rows-only by permanent decision, a slot spent on it re-checks
    # nothing the Parseval shadow doesn't already cover)
    "a21_collect_list",
    "a23_equidepth_hist",
    "a24_cohort_retention",
    "a25_attribution",
    "a26_rfm",
    "a27_benford_audit",
    "a28_ordered_funnel",
    "a31_salted_hot_keys",
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
)

# Round-9 rotation backlog: the 21 remaining r3-vintage names (oldest
# staleness tier after round 8). Promote behind round-9 additions +
# the sentinels; r4-vintage names (see CORRECTNESS_r04) come next.
_ROTATION_R9: tuple[str, ...] = (
    "x_bloom_decontaminate",
    "x_collocations",
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
    "x_token_spectrum",
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
    out.update({n: all_q[n] for n in _ROTATION_R9 if n in all_q and n not in out})
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
