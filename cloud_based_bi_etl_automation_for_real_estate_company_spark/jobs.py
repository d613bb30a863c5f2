"""End-to-end pipeline jobs — the composition layer that replaces the
reference's cron-ish operational loop (backfill script + webhook
receiver + 8×/day Power BI refresh, reference README.md:511–513).

``refresh_gold`` is the scheduled batch: silver event log → current
snapshot → every dashboard measure materialized as partition-pruned
gold parquet + SQL views. Incremental by construction: dynamic
partition overwrite only rewrites changed months.

``run_backfill_merge`` is the U2/J4 flow: merge a historical bulk load
with live silver, latest-per-key, write the snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .operators.snapshot import upsert_merge
from .plans import gold
from .sources.sinks import materialize_gold


def refresh_gold(
    spark: SparkSession, silver_path: str, gold_path: str, prefix: str = "gold_"
) -> dict[str, DataFrame]:
    """The 8×/day dashboard refresh as one Spark job."""
    silver = spark.read.parquet(silver_path)
    snap = gold.lead_snapshot(silver)
    out: dict[str, DataFrame] = {}
    out["lead_snapshot"] = materialize_gold(
        snap, os.path.join(gold_path, "lead_snapshot"),
        view_name=f"{prefix}lead_snapshot", partition_by=["account"],
    )
    builders = {
        "funnel": gold.funnel,
        "conversion_rates": gold.conversion_rates,
        "sales_totals": gold.sales_totals,
        "agent_table": gold.agent_table,
        "agent_ranking": gold.agent_ranking,
        "monthly_trend": gold.monthly_trend,
        "detail_listing": gold.detail_listing,
    }
    for name, fn in builders.items():
        out[name] = materialize_gold(
            fn(snap), os.path.join(gold_path, name), view_name=f"{prefix}{name}"
        )
    return out


def run_backfill_merge(
    backfill: DataFrame, live: DataFrame, out_path: str
) -> DataFrame:
    """U2/J4 — one-time history merge: bulk-loaded backfill ∪ live
    stream → last-write-wins snapshot (reference README.md:149)."""
    merged = upsert_merge(backfill, live, ["lead_id"], ["received_at", "id"])
    return materialize_gold(merged, out_path, partition_by=["account"])
