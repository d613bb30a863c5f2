"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship dashboard query; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2
plus the training-data-pipeline extensions — 218 registered queries,
217 with DuckDB oracles, 1 rows-only: x_pca_project
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


# Round-7 gate front block. Every round-6 front name is green in
# CORRECTNESS_r06, so the 50-slot window now holds: (a) the 6 round-7
# additions, (b) the 2 queries whose plan changed this round
# (SpaceSaving drain gained the NULL-item drop; the incremental
# near-dup bootstrap now derives its id type), (c) the 6 permanent
# double-arithmetic SENTINELS, then (d) STALENESS ROTATION — the 36
# oldest-vintage names from round 6's staged _ROTATION_R7 (15 r1 +
# 21 r2); the remaining 14 r2-vintage names roll to _ROTATION_R8.
_GATE_PRIORITY = (
    # -- (a) new in round 7 ----------------------------------------------
    # distributed suffix array (prefix doubling, bucket-routed exact
    # global ranking) differential-tested against the definition.
    "x_suffix_array",
    # exact character-level duplicated substrings via SA-adjacent LCP.
    "x_suffix_lcp",
    # corpus-wide exact total-order ranking, no single-task window.
    "x_global_rank",
    # character-exact ExactSubstr removal (SA-first copy survives).
    "x_suffix_removal",
    # the rank-array LCP scale form against the same definitional oracle.
    "x_suffix_lcp_ranks",
    # per-domain document cap (C4/RefinedWeb curation step).
    "x_domain_cap",
    # -- (b) plan changed this round --------------------------------------
    "x_spacesaving_drain",
    "x_incremental_neardup",
    # -- (c) permanent sentinels: fragile double-fold bit-exactness --------
    "t10_holt",
    "t12_holt_winters",
    "x_pagerank",
    "a29_trend_slope",
    "a30_corr_pairs",
    "x_linkage_score",
    # -- (d) staleness rotation: r1 vintage first, then r2 ----------------
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
    "x_quality_filter",
    # r2 vintage from here
    "l14_large_volume_orders",
    "l15_disjunctive_revenue",
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
    "x_dedup_clusters",
    "x_dedup_clusters_star",
    "x_dedup_exact",
    "x_dedup_minhash_est",
    "x_dedup_minhash_lsh",
    "x_embed_near_dup",
    "x_fingerprint",
    "x_lang_id",
)

# Round-8 rotation backlog: the 14 r2-vintage names that did not fit
# round 7's window, then the r3-vintage catalog names become next in
# staleness order. Promote behind round-8 additions + the sentinels.
_ROTATION_R8: tuple[str, ...] = (
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
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Gate-priority names register first (see _GATE_PRIORITY), then
    # the round-2 additions, then the round-1-checked families, so
    # per-round CORRECTNESS files union toward full coverage.
    all_q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (warehouse, windows, extensions, measures, analytics, scalars, temporal):
        all_q.update(mod.QUERIES)
    out = {n: all_q[n] for n in _GATE_PRIORITY if n in all_q}
    out.update({n: all_q[n] for n in _ROTATION_R8 if n in all_q and n not in out})
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
