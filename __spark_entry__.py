"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship dashboard query; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2
plus the training-data-pipeline extensions, each with a DuckDB oracle
unless the op is non-SQL-expressible (rows-only by design:
k-means-trained IVF, HLL binary sketches, MMR greedy re-rank, BPE
merge training and encoding, PCA eigendecomposition — see
plans/extensions.py; SimHash graduated to a full oracle in round 4).
PCA and MMR carry SQL-checkable shadows: ``x_pca_invariants``
(Parseval check of the full eigenbasis) and ``x_mmr_first``
(rank-1 == argmax relevance).
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


# Queries with NO driver CORRECTNESS row yet (round 1 checked exactly
# the first 50 registered names; these are the other 50, rotated to the
# front for round 2 — cheapest first, the heaviest sketches/iterative
# ops and the Python-worker multimodal decode last within the block so
# a time-budgeted gate maximizes how many it reaches). Once a round's
# CORRECTNESS file shows a green row for a name, move it out of this
# list so still-unchecked and newly added queries rotate forward.
_GATE_PRIORITY = (
    # The repo's only red r3 row: DuckDB's window SUM(BIGINT) yielded
    # HUGEINT which the driver's pandas-side hash renders differently
    # from Spark's BIGINT; the oracle now CASTs to BIGINT
    # (plans/windows.py) — re-present it first.
    "w10_cumulative_distinct",
    # Same HUGEINT hazard found pre-emptively by the type check in
    # scripts/check_oracle.py; oracle cast fixed, never driver-checked.
    "x_dataset_card",
    # The 17 round-3 session-2 queries the r3 50-slot gate window cut
    # off after a31_salted_hot_keys — all local-replica green.
    "a32_windowed_funnel",
    "x_lsh_precision",
    "a33_salted_join_revenue",
    "l17_dominant_suppliers",
    "l18_idle_big_accounts",
    "a34_monthly_price_band",
    "a35_transition_matrix",
    "x_sorted_neighborhood",
    "t10_holt",
    "x_logreg_quality",
    "x_knn_classify",
    "x_nb_lang",
    "w11_asof_snapshot",
    "x_ann_recall",
    "w12_rolling_distinct",
    "x_pagerank",
)


# Queries added in round 4 (no driver row yet) — registered
# immediately after the unchecked block so the gate window reaches
# them too; every earlier name already has a green r1–r3 row.
_NEW_SINCE_R4: tuple[str, ...] = (
    # Partial oracles shrinking the rows-only set: PCA Parseval check
    # and MMR rank-1 == argmax relevance.
    "x_pca_invariants",
    "x_mmr_first",
    # Streaming interval-join logic run on batch frames (ST-family
    # driver row) and the CDC→point-in-time compose.
    "t11_interval_join_batch",
    "u7_cdc_asof",
    # TPC-H shapes Q4/Q7/Q8/Q9 (semi-join EXISTS, bidirectional pair
    # join, one-pass share-of-total, two-table profit expression).
    "l19_priority_late_orders",
    "l20_nation_trade_pairs",
    "l21_market_share",
    "l22_nation_profit",
    # Holt–Winters triple smoothing and label-propagation communities.
    "t12_holt_winters",
    "x_label_prop",
    # DSIR importance weighting (data selection, arXiv:2302.03169).
    "x_dsir_weights",
    # Time-weighted average, Q11 concentration shape, path mining.
    "t13_twap",
    "l23_stock_concentration",
    "a36_top_paths",
    # Fellegi–Sunter probabilistic record linkage over blocked pairs.
    "x_linkage_score",
    # DDSketch mergeable quantile sketch (exact-replay oracle).
    "x_dd_quantiles",
    # Event-time RANGE window frame (trailing interval sum).
    "w13_range_frame",
    # Two-proportion z-test over a deterministic 50/50 split.
    "a37_ab_test",
    # LSH recall audit vs exact ground truth on the audit slice.
    "x_lsh_recall",
    # Winsorized robust stats (p05/p95 clamp + decimal mean).
    "a38_winsorized_stats",
    # DAX what-if parameter sweep in one fact pass.
    "a39_whatif_discount",
    # TPC-H Q6 shape: triple-pushdown forecasting filter.
    "l24_forecast_revenue",
    # SimHash gains a full oracle (md5 bit votes ARE SQL-replayable) —
    # re-present so the rows-only r1 row upgrades to a hash check.
    "x_dedup_simhash",
    # Normalized-content dedup key (surface-form duplicate recovery).
    "x_normalized_dedup",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Gate-priority names register first (see _GATE_PRIORITY), then
    # the round-2 additions, then the round-1-checked families, so
    # per-round CORRECTNESS files union toward full coverage.
    all_q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (warehouse, windows, extensions, measures, analytics, scalars, temporal):
        all_q.update(mod.QUERIES)
    out = {n: all_q[n] for n in _GATE_PRIORITY if n in all_q}
    out.update({n: all_q[n] for n in _NEW_SINCE_R4 if n in all_q and n not in out})
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
