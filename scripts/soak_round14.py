"""Round-14 operator scale soak: blow the sf0.1 fixtures up N×
(scripts/soak.py staging) and measure the round-14 additions' runtime
ratios x1 → xN. Structural expectations under test:

- paragraph_dedup: split map-side; ONE window shuffle keyed by the
  paragraph text (high-cardinality — each group is the copies of one
  paragraph; copies are word-rotated so cross-copy dup density stays
  ~constant) + ONE reassembly groupBy → ~linear in the corpus.
- nsw_query_index on a PREBUILT persisted store (the x_ann_hnsw_store
  path): search cost O(queries · beam · M · hops) independent of N
  given the graph — growth only from the id-keyed graph/vector scans,
  same expectation the r13 in-memory nsw_query soak confirmed (1.79×
  at 8×).
- t24 sink-body drain (3 silver appends + 3 dual-panel gold
  refreshes): panel frames are week-grain CONSTANT in N, so the cost
  is the 3 accumulated-events scans → ~linear.

Usage: python scripts/soak_round14.py [N]   (default 8)
Prints one JSON line {"n": N, "x1": {...}, "xN": {...}, "ratio": {...}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.jobs import (
    refresh_drift_dashboard,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.dedup import (
    paragraph_dedup,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.similarity import (
    nsw_build_graph,
    nsw_index_append,
    nsw_query_index,
    save_nsw_index,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.measures import t
from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark
from soak import stage


def _para_dedup(spark, sf_dir: str):
    d = t(spark, sf_dir, "documents").withColumn(
        "text",
        F.regexp_replace(F.col("text"), r"\b(batch|data|join) ", "$1. "),
    )
    return paragraph_dedup(d, sep=r"\. ", joiner=". ").agg(
        F.sum("n_paras_kept"), F.sum("n_paras")
    )


_NSW_STORES: dict[str, str] = {}


def _nsw_store_for(spark, sf_dir: str) -> str:
    # built once per staged dir, OUTSIDE the timed query (the gate-row
    # posture: the store row prices the search path)
    if sf_dir not in _NSW_STORES:
        e = t(spark, sf_dir, "embeddings")
        store = tempfile.mkdtemp(prefix="spark_graft_soak14_nsw_")
        even = e.filter(F.col("vec_id") % 2 == 0)
        save_nsw_index(even, nsw_build_graph(even), store)
        nsw_index_append(e.filter(F.col("vec_id") % 2 == 1), store)
        _NSW_STORES[sf_dir] = store
    return _NSW_STORES[sf_dir]


def _nsw_store_query(spark, sf_dir: str):
    store = _nsw_store_for(spark, sf_dir)
    q = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5)
    return nsw_query_index(spark, store, q, k=5)


def _t24_drain(spark, sf_dir: str):
    ev = t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="spark_graft_soak14_dash_")
    try:
        silver = f"{tmp}/events_silver"
        for s in range(3):
            ev.filter(
                F.coalesce(F.pmod(F.col("event_id"), F.lit(3)), F.lit(0)) == s
            ).write.mode("append").parquet(silver)
            panels = refresh_drift_dashboard(
                spark, spark.read.parquet(silver), tmp
            )
        out = panels["drift_panel"].localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


CASES = {
    "paragraph_dedup": _para_dedup,
    "nsw_store_query": _nsw_store_query,
    "t24_dashboard_drain": _t24_drain,
}


def run_set(spark, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    for name, fn in CASES.items():
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).count()
            el = time.time() - t0
            best = el if best is None or el < best else best
        times[name] = round(best, 3)
    return times


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("soak-round14")
    spark.sparkContext.setLogLevel("ERROR")
    big = stage(spark, n)
    try:
        x1 = run_set(spark, "/root/testdata/sf0.1")
        xn = run_set(spark, big)
        ratio = {k: round(xn[k] / x1[k], 2) for k in x1}
        print(json.dumps({"n": n, "x1": x1, "xN": xn, "ratio": ratio}))
    finally:
        for store in _NSW_STORES.values():
            shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
