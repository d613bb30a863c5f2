"""Round-12 operator scale soak: blow the sf0.1 fixtures up N×
(scripts/soak.py staging — key-offset copies, rotated document text,
single-copy dims) and measure the round-12 additions' runtime ratios
x1 → xN. The structural expectations under test:

- w1_drift / chi2_drift: one corpus-grain count agg feeding
  grid/category-sized frames — ratio ≈ the agg's (sub-)linear cost.
- t20_seasonal: daily-grain agg over N× events, then calendar-sized
  windows — agg linear, decomposition CONSTANT.
- t21_theil_sen: monthly-revenue rollup over N× facts, then a
  month-spine²-sized pair frame — rollup linear, pairs CONSTANT
  (the bucket-grain contract made measurable).
- a45_abc: per-nation window over N× customers — linear, sort is
  nation-partitioned.
- hybrid retrieval legs with a FIXED copy-0 query set against the
  N× corpus (the gate query's %29 set would grow with the corpus and
  measure benchmark construction, not the operator): MLT pair frame
  is bounded by the query docs' postings; brute-force dense leg is
  queries × base — both expected ~linear in corpus size.

Usage: python scripts/soak_round12.py [N]   (default 8)
Prints one JSON line {"n": N, "x1": {...}, "xN": {...}, "ratio": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.corpus import (
    more_like_this,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.quality import (
    chi2_drift,
    w1_drift,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.similarity import (
    brute_force_topk,
    rrf_fuse,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.measures import t
from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.analytics import (
    q_a45_abc,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.temporal import (
    q_t20_seasonal,
    q_t21_theil_sen,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark
from soak import SRC, stage


def _hybrid(spark, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    e = t(spark, sf_dir, "embeddings")
    # fixed copy-0 query set regardless of blow-up factor
    qdocs = d.filter(
        (F.col("doc_id") % 29 == 0) & (F.col("doc_id") < 10_000_000)
    ).select("doc_id")
    sparse = more_like_this(d, qdocs, k=10)
    dense = brute_force_topk(
        e, e.filter((F.col("vec_id") % 29 == 0) & (F.col("vec_id") < 10_000_000)), k=10
    ).select(
        F.col("q_id").alias("query_id"),
        F.col("vec_id").alias("doc_id"),
        "rnk",
    )
    return rrf_fuse(sparse.select("query_id", "doc_id", "rnk"), dense, k=5)


CASES = {
    "w1_drift": lambda spark, sf: w1_drift(t(spark, sf, "documents")),
    "chi2_drift": lambda spark, sf: chi2_drift(t(spark, sf, "documents")),
    "t20_seasonal": q_t20_seasonal,
    "t21_theil_sen": q_t21_theil_sen,
    "a45_abc": q_a45_abc,
    "hybrid_rrf_fixed_queries": _hybrid,
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
    spark = get_spark("soak_round12")
    spark.sparkContext.setLogLevel("ERROR")
    big = stage(spark, n)
    r1 = run_set(spark, SRC)
    rn = run_set(spark, big)
    ratio = {
        k: round(rn[k] / r1[k], 2) if r1[k] else None for k in CASES
    }
    print(json.dumps({"n": n, "x1": r1, f"x{n}": rn, "ratio": ratio}))


if __name__ == "__main__":
    main()
