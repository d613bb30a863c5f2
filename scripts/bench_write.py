"""Write-side bench (secondary series, round 9): the layout sinks get
a tracked number without disturbing the 20-query headline bench's
comparability.

Legs, each writing the sf0.1 events fact (~600k rows) to a temp dir:
- plain_write: unsorted single-pass parquet write — the floor every
  layout op is paying on top of.
- sorted_write: TeraSort layout on `value` (cuts aggregate + ranged
  sorted write) — the range-pruning layout.
- shuffled_write: deterministic seed-keyed corpus shuffle on
  `event_id` — the training-data shuffle sink.
- sorted_read_prune: after sorted_write, a `value` range read through
  the layout manifest — the payoff the sort buys (files pruned is
  printed; the read must touch O(1) of them).

Best-of-2 per leg (first run pays codegen), one JSON line, same
contract as the soak scripts.

Usage: python scripts/bench_write.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.ranking import (
    shuffled_write,
    sorted_write,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.measures import t
from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        fn()
        el = time.time() - t0
        best = el if best is None or el < best else best
    return round(best, 3)


def run(spark, src: str) -> dict:
    """Run the four write-side legs and return the result dict —
    callable both standalone (main below) and from bench.py, which
    folds the row into the per-round BENCH artifact (round-10: the
    write series gets a recorded point every round, same quiet-host
    discipline as the headline numbers)."""
    ev = (
        t(spark, src, "events")
        .select("event_id", "user_id", "event_type", "value", "ts")
        .localCheckpoint(eager=True)  # isolate write cost from scan
    )
    n = ev.count()
    root = tempfile.mkdtemp(prefix="spark_graft_bench_write_")
    out = {"metric": "write_side_bench", "n_rows": n, "sf_dir": src,
           "queries": {}}
    try:
        out["queries"]["plain_write"] = timed(
            lambda: ev.write.mode("overwrite").parquet(
                os.path.join(root, "plain")
            )
        )
        sorted_dir = os.path.join(root, "sorted")
        out["queries"]["sorted_write"] = timed(
            lambda: sorted_write(ev, "value", sorted_dir,
                                 tiebreaks=["event_id"])
        )
        out["queries"]["shuffled_write"] = timed(
            lambda: shuffled_write(ev, "event_id",
                                   os.path.join(root, "shuffled"))
        )
        # the payoff read: value range predicate over the sorted layout
        lo, hi = 100.0, 110.0
        n_files = len([f for f in os.listdir(sorted_dir)
                       if f.endswith(".parquet")])

        def prune_read():
            got = (
                spark.read.parquet(sorted_dir)
                .filter((F.col("value") >= lo) & (F.col("value") < hi))
                .count()
            )
            out["prune_rows"] = got

        out["queries"]["sorted_read_prune"] = timed(prune_read)
        out["n_sorted_files"] = n_files
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    spark = get_spark("bench-write")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, SRC)))


if __name__ == "__main__":
    main()
