"""Capture `explain(formatted)` for every bench headline query into
PLANS.md — the reviewable evidence that each hot-path plan has the
shape its docstring claims (pushed filters, broadcast dims, single
fact shuffles, no cartesian products). Re-run after any
plan-affecting change; the diff of PLANS.md IS the plan review.

Usage: python scripts/plan_snapshot.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark
import __spark_entry__ as entrymod
from bench import HEADLINE

# Non-bench queries whose plan shape is load-bearing enough to keep
# under review (semi-join pushdown, shard-pruned top-k, broadcast
# pyramids, RANGE frames) — snapshotted in a second section.
EXTRAS = [
    "l19_priority_late_orders",
    "l21_market_share",
    "l24_forecast_revenue",
    "x_label_prop",
    "x_dsir_weights",
    "w13_range_frame",
    "x_pagerank",
    # round-5 plan-shape changes under review: lead()-derived 3-grams
    # (no per-user collect_list), sharded_topk adoptions, the Q12
    # shape's pre-join pushdown, and the t-digest two-stage build.
    "a36_top_paths",
    "a6_leaderboard",
    "l5_top_revenue_orders",
    "l17_dominant_suppliers",
    "l25_priority_mode_split",
    "x_tdigest_quantiles",
    "l26_waiting_suppliers",
    "x_triangles",
    # round-7 plan shapes under review: bucket-routed exact ranking
    # (no rangepartitioning), the approx-bucket fold, and the
    # exploded equi-join rewrite of the rolling-quantile audit.
    "x_global_rank",
    "a23_equidepth_hist",
    "a40_attribution",
    "x_prefix_join",
    # round-6 plan shapes under review: the gaps-and-islands substring
    # inventory (one window-text agg + equi-join + per-doc window) and
    # the linear-chain Hilbert fold (must stay one projection, no join).
    "x_substring_spans",
    "x_hilbert_key",
    "x_kcore",
    "x_golden_records",
    "t17_rolling_quantiles",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = [
        "# PLANS — formatted physical plans of the bench headline set",
        "",
        f"Captured by `scripts/plan_snapshot.py` on `{sf_dir}`. Regenerate",
        "after plan-affecting changes; review the diff.",
        "",
    ]
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
    out += ["# Round-4 extras (non-bench, plan-shape review set)", ""]
    for name in EXTRAS:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINE) + len(EXTRAS)} plans)")


if __name__ == "__main__":
    main()
