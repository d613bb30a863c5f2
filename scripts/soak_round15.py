"""Round-15 tombstone-family scale soak: blow the sf0.1 fixtures up
N× (scripts/soak.py staging) and price the takedown path against the
store sizes that matter. Structural expectations under test:

- bm25_query_store with a 10% tombstone set vs without: the delete
  filter is ONE anti-join of the postings scan against a small id
  set (AQE broadcasts it) — query cost must stay within a small
  constant factor of the tombstone-free query at the SAME scale
  (asserted ≤ 1.8×; the statistics re-derivation is unchanged work).
- compact_bm25_store WITH tombstones vs the plain rewrite: the
  physical drop rides the compaction's existing scan — same-shaped
  job, bounded overhead (asserted ≤ 1.8×).
- incremental_minhash_dedup admission against a store carrying
  tombstones: one extra anti-join on the store read, flat per-batch
  cost (asserted ≤ 1.8× of the tombstone-free admission).

Usage: python scripts/soak_round15.py [N]   (default 8)
Prints one JSON line {"n": N, "x1": {...}, "xN": {...}, "ratio": ...}.
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

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.corpus import (
    bm25_delete_docs,
    bm25_index_append,
    bm25_query_store,
    compact_bm25_store,
    corpus_bigram_queries,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.dedup import (
    delete_from_minhash_store,
    incremental_minhash_dedup,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.measures import t
from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark
from soak import stage

OVERHEAD_CAP = 1.8


def timed(fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        fn()
        el = time.time() - t0
        best = el if best is None or el < best else best
    return round(best, 3)


def run_scale(spark, sf_dir: str) -> dict:
    out: dict = {}
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    out["n_docs"] = d.count()
    q = corpus_bigram_queries(d).localCheckpoint(eager=True)
    root = tempfile.mkdtemp(prefix="spark_graft_soak15_")
    try:
        store = os.path.join(root, "bm25")
        bm25_index_append(d, store)
        out["bm25_query_clean"] = timed(
            lambda: bm25_query_store(spark, store, q, k=5).count()
        )
        bm25_delete_docs(
            d.filter(F.col("doc_id") % 10 == 0).select("doc_id"), store
        )
        out["bm25_query_tombstoned"] = timed(
            lambda: bm25_query_store(spark, store, q, k=5).count()
        )
        # plain rewrite first (tombstones still pending — pass a copy)
        plain = os.path.join(root, "bm25_plain")
        shutil.copytree(store, plain)
        shutil.rmtree(os.path.join(plain, "tombstones"))
        out["bm25_compact_plain"] = timed(
            lambda: compact_bm25_store(spark, plain)
        )
        t0 = time.time()
        compact_bm25_store(spark, store)  # once: the drop is one-shot
        out["bm25_compact_tombstoned"] = round(time.time() - t0, 3)

        mh = os.path.join(root, "mh")
        seed = d.filter(F.col("doc_id") % 2 == 0)
        batch = d.filter(F.col("doc_id") % 2 == 1).localCheckpoint(eager=True)
        incremental_minhash_dedup(seed, mh)
        out["mh_admit_clean"] = timed(
            lambda: incremental_minhash_dedup(batch, mh).count()
        )
        delete_from_minhash_store(
            seed.filter(F.col("doc_id") % 10 == 0).select("doc_id"), mh
        )
        out["mh_admit_tombstoned"] = timed(
            lambda: incremental_minhash_dedup(batch, mh).count()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("soak-round15")
    try:
        x1 = run_scale(spark, os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ))
        xn = run_scale(spark, stage(spark, n))
        overhead = {
            "bm25_query": round(
                xn["bm25_query_tombstoned"] / xn["bm25_query_clean"], 3
            ),
            "bm25_compact": round(
                xn["bm25_compact_tombstoned"] / xn["bm25_compact_plain"], 3
            ),
            "mh_admit": round(
                xn["mh_admit_tombstoned"] / xn["mh_admit_clean"], 3
            ),
        }
        for leg, r in overhead.items():
            assert r <= OVERHEAD_CAP, (
                f"tombstone overhead blown at x{n} on {leg}: {r}"
            )
        print(json.dumps({"n": n, "x1": x1, "xN": xn,
                          "overhead_xN": overhead}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
