"""Skew soak: measure what salting buys when key skew ACTUALLY exists
(round-3 VERDICT item 7 — the a31/a33 salted rewrites are gate-proven
value-identical, but the perf claim needs a measured table).

Construction: the sf0.1 events fixture blown up N× (key-offset copies,
same recipe as scripts/soak.py), then a Zipf-style hot key injected by
remapping ~30% of ALL rows to one user id — the bot-account shape. The
join is events ⋈ user-dim on user_id followed by a per-segment revenue
aggregation. Broadcast is disabled for every leg: at this harness's
scale the dim WOULD broadcast, but the scenario under test is the
100 TB one where the dim is a billion users and cannot — the sort-merge
path is the object of study, so the stand-in is labeled, not hidden.

Three legs, same plan shape:
  unsalted_noaqe — SMJ, AQE skew-split OFF: the naive engine; the hot
                   key's entire row set sorts in ONE task.
  unsalted_aqe   — SMJ, AQE skew-split ON: Spark's runtime mitigation.
  salted_noaqe   — operators.skew.salted_join (16 shards), AQE skew
                   OFF: the explicit rewrite for shapes AQE can't
                   split (e.g. the join feeds a same-key aggregate).

All three legs are asserted VALUE-IDENTICAL before timings are
reported. Usage: python scripts/soak_skew.py [N] (default 27).
Prints one JSON line; PERF.md records the table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.measures import t
from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000
HOT_USER = 0
HOT_PCT = 30  # % of all rows remapped to the hot key


def stage(spark, n_copies: int) -> str:
    dst = f"/tmp/spark_graft_soak/skew_x{n_copies}"
    marker = os.path.join(dst, "_STAGED")
    if os.path.exists(marker):
        return dst
    base = t(spark, SRC, "events")
    parts = []
    for i in range(n_copies):
        parts.append(
            base.withColumn("event_id", F.col("event_id") + F.lit(i * OFF))
            .withColumn("user_id", F.col("user_id") + F.lit(i * OFF))
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    skewed = big.withColumn(
        "user_id",
        F.when(
            F.pmod(F.xxhash64("event_id"), F.lit(100)) < HOT_PCT,
            F.lit(HOT_USER),
        ).otherwise(F.col("user_id")),
    )
    skewed.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "events.parquet")
    )
    # user dim derived from the skewed fact so referential integrity
    # holds; segment is the dim attribute the rollup groups by
    (
        spark.read.parquet(os.path.join(dst, "events.parquet"))
        .select("user_id")
        .distinct()
        .withColumn("segment", F.pmod(F.col("user_id"), F.lit(10)))
        .repartition(8)
        .write.mode("overwrite")
        .parquet(os.path.join(dst, "users.parquet"))
    )
    with open(marker, "w") as f:
        f.write(str(n_copies))
    return dst


def _rollup_plain(ev, users):
    j = ev.join(users, "user_id")
    return j.groupBy("segment").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("revenue"),
        F.count(F.lit(1)).alias("n_events"),
    )


def _rollup_salted(ev, users):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.skew import (
        salted_join,
    )

    j = salted_join(ev, users, key="user_id", num_shards=16,
                    salt_cols=["event_id"])
    return j.groupBy("segment").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("revenue"),
        F.count(F.lit(1)).alias("n_events"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 27
    spark = get_spark("soak-skew")
    spark.sparkContext.setLogLevel("ERROR")
    dst = stage(spark, n)
    ev = spark.read.parquet(os.path.join(dst, "events.parquet"))
    users = spark.read.parquet(os.path.join(dst, "users.parquet"))

    # the 100 TB stand-in: dim too big to broadcast → force SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    legs = {
        "unsalted_noaqe": ("false", _rollup_plain),
        "unsalted_aqe": ("true", _rollup_plain),
        "salted_noaqe": ("false", _rollup_salted),
    }
    results = {}
    times = {}
    for name, (skew_conf, fn) in legs.items():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_conf)
        best = None
        for _ in range(2):
            t0 = time.time()
            out = fn(ev, users)
            rows = {
                r["segment"]: (str(r["revenue"]), r["n_events"])
                for r in out.collect()
            }
            el = time.time() - t0
            best = el if best is None or el < best else best
        times[name] = round(best, 3)
        results[name] = rows
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")

    assert results["unsalted_noaqe"] == results["unsalted_aqe"] == results[
        "salted_noaqe"
    ], "legs disagree — salted rewrite is NOT value-identical"

    n_rows = ev.count()
    hot_rows = ev.filter(F.col("user_id") == HOT_USER).count()
    print(
        json.dumps(
            {
                "metric": "skew_soak",
                "n_copies": n,
                "n_rows": n_rows,
                "hot_key_rows": hot_rows,
                "hot_fraction": round(hot_rows / n_rows, 3),
                "times_sec": times,
                "speedup_salted_vs_naive": round(
                    times["unsalted_noaqe"] / times["salted_noaqe"], 2
                ),
                "speedup_aqe_vs_naive": round(
                    times["unsalted_noaqe"] / times["unsalted_aqe"], 2
                ),
                "value_identical": True,
            }
        )
    )


if __name__ == "__main__":
    main()
