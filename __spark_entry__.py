"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship dashboard query; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2
plus the training-data-pipeline extensions, each with a DuckDB
oracle except the single non-SQL-expressible entry: x_pca_project
(numpy eigh), which carries the green Parseval shadow
``x_pca_invariants``. Round-5 graduations out of rows-only: BPE
encode (frozen merge artifact), BPE train (10 unrolled CTE rounds),
MMR re-rank (k=5 greedy trajectory unrolled), HLL rollup
(exact-distinct + tolerance boolean), trained IVF (recall-floor
audit); SimHash graduated in round 4.
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


# Round-5 gate front block. Cumulative r1-r4 driver rows cover all
# 185 previously-registered names (179 green oracle rows, 6 rows-only
# by design at the time), so the window is now spent on (a) round-5
# additions and changed queries — anything whose Spark plan or oracle
# differs from the row the driver last recorded — and (b) permanent
# regression SENTINELS: the fragile double-arithmetic folds whose
# bit-exactness is most likely to break silently. Keep rotating: once
# CORRECTNESS_r05 shows the new rows green, move (a) out and keep (b).
_GATE_PRIORITY = (
    # -- (a) new in round 5 ----------------------------------------------
    # TPC-H Q12 shape: fact x fact join, conditional split on the other
    # table's priority attribute in one hash agg.
    "l25_priority_mode_split",
    # TPC-H Q21 shape: semi + anti double-correlated existence.
    "l26_waiting_suppliers",
    # t-digest mergeable quantiles, rank-tolerance audit form.
    "x_tdigest_quantiles",
    # degree-oriented triangle enumeration (co-purchase graph).
    "x_triangles",
    # exact prefix-filtered Jaccard self-join (AllPairs/PPJoin family).
    "x_prefix_join",
    # CUSUM changepoint fold vs recursive-CTE replay.
    "t14_cusum",
    # last-touch attribution (LOCF as-of window, channel rollup).
    "a40_attribution",
    # unpivot/melt — the inverse of a17's pivot.
    "a41_unpivot_measures",
    # MAD robust outlier counts (exact interpolated percentiles).
    "a42_mad_outliers",
    # logreg reliability diagram (decile calibration curve).
    "x_calibration",
    # NB confusion matrix (x_nb_lang replay, (true, pred) rollup).
    "x_nb_confusion",
    # Holt one-step-ahead MAPE backtest (t10 replay + error tail).
    "t15_backtest",
    # -- (a) graduated out of rows-only this round -------------------------
    # frozen-artifact BPE encode: full regexp-replay oracle.
    "x_bpe_encode",
    # HLL rollup: exact-distinct + 5% tolerance boolean.
    "x_hll_rollup",
    # trained IVF: recall-floor audit vs SQL-replayed exact truth.
    "x_ann_ivf_trained",
    # BPE training: fixed rounds unrolled as CTEs — full oracle.
    "x_bpe_train",
    # MMR: fixed k=5 greedy trajectory unrolled — full oracle.
    "x_mmr_rerank",
    # -- (a) plan changed this round (same semantics, re-present) ----------
    # 3-grams now via two lead() windows (no per-user array).
    "a36_top_paths",
    # sharded_topk adopted for the final rank.
    "x_cms_heavy_hitters",
    "a6_leaderboard",
    "l5_top_revenue_orders",
    "l6_returned_customers",
    "l17_dominant_suppliers",
    "t3_top_terms",
    # per-round localCheckpoint added to the label loop.
    "x_label_prop",
    # -- (b) permanent sentinels: fragile double-fold bit-exactness --------
    "t10_holt",
    "t12_holt_winters",
    "x_pagerank",
    "a29_trend_slope",
    "a30_corr_pairs",
    "x_linkage_score",
)

# Spent in round 5 (kept for the registration order only — every name
# already has a green r4 row; rotation history lives in git).
_NEW_SINCE_R4: tuple[str, ...] = ()


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
