"""t-digest JVM-build soak: scale the events fact 1×/8×/27× (exact
row replication — equal values co-bucket by design, and the value
hash spreads the 17k distinct values across shards regardless) and
measure the full build→merge→quantiles chain.

What should happen at scale: the round-8 JVM form is one shuffle to
(key, shard), a per-group window sort bounded by the shard key, one
hash agg, then the same over the O(shards·delta) centroid table —
runtime should track the row count ~linearly (sub-linearly while
scheduling overhead dominates). The executed plan is audited to hold
ZERO Python/Arrow nodes and exactly 2 exchanges.

Usage: python scripts/soak_tdigest.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators import sketches as K
from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.measures import t
from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark

SRC = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("soak-tdigest")
    spark.sparkContext.setLogLevel("ERROR")
    ev = t(spark, SRC, "events").select("event_type", "value")
    out = {"metric": "tdigest_soak", "factors": {}}
    for factor in (1, 8, 27):
        big = ev.crossJoin(
            spark.range(factor).select(F.col("id").alias("__rep"))
        ).drop("__rep").localCheckpoint(eager=True)
        n = big.count()
        best = None
        for _ in range(2):
            t0 = time.time()
            cent = K.tdigest_centroids(big, ["event_type"], "value", delta=100)
            K.tdigest_quantiles(cent, ["event_type"], [0.5, 0.95, 0.99]).count()
            el = time.time() - t0
            best = el if best is None or el < best else best
        out["factors"][factor] = {"n_rows": n, "s": round(best, 2)}
    f = out["factors"]
    out["ratio_27x"] = round(f[27]["s"] / f[1]["s"], 1)
    # plan audit: the batch chain must stay JVM-side
    cent = K.tdigest_centroids(ev, ["event_type"], "value", delta=100)
    est = K.tdigest_quantiles(cent, ["event_type"], [0.5])
    plan = est._jdf.queryExecution().executedPlan().toString()
    out["python_nodes"] = len(re.findall(r"(?i)python|arrow", plan))
    out["exchanges"] = len(re.findall(r"Exchange", plan))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
