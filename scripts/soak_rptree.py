"""RP-tree scale-path soak (round-6 verdict item 1's 'done' clause):
measure the exact (global-ntile) vs approx (percentile-routed) leaf
assignment forms of rptree_topk on the staged 1×/8×/27× embedding
corpora, plus the recall agreement between the two at 1×.

What should happen: the approx form has no global sort, so its
runtime should stay at-or-below the exact form's and both track the
corpus sub-linearly at this harness's scale; recall through the
routed leaves must stay within 0.10 of the exact forest's (the
tests/test_bucketing.py tolerance, re-checked here at fixture scale).

Usage: python scripts/soak_rptree.py   (requires the round-6 soak
staging under /tmp/spark_graft_soak — run scripts/soak.py first if
missing). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.similarity import (
    brute_force_topk,
    rptree_topk,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark


def main() -> None:
    spark = get_spark("soak-rptree")
    spark.sparkContext.setLogLevel("ERROR")
    pred = F.col("vec_id") < 5
    out = {"metric": "rptree_soak", "trees": 3, "factors": {}}
    for factor in (1, 8, 27):
        path = f"/tmp/spark_graft_soak/x{factor}/embeddings.parquet"
        if not os.path.exists(path):
            print(json.dumps({"error": f"missing staging {path}"}))
            return
        emb = spark.read.parquet(path).localCheckpoint(eager=True)
        row = {"n_vectors": emb.count()}
        for mode in ("exact", "approx"):
            best = None
            for _ in range(2):
                t0 = time.time()
                rptree_topk(emb, pred, k=5, trees=3, mode=mode).count()
                el = time.time() - t0
                best = el if best is None or el < best else best
            row[f"{mode}_s"] = round(best, 2)
        out["factors"][factor] = row
    emb1 = spark.read.parquet("/tmp/spark_graft_soak/x1/embeddings.parquet")
    truth = {
        (r["q_id"], r["vec_id"])
        for r in brute_force_topk(emb1, emb1.filter(pred), k=5).collect()
    }
    rec = {}
    for mode in ("exact", "approx"):
        got = {
            (r["q_id"], r["vec_id"])
            for r in rptree_topk(emb1, pred, k=5, trees=3, mode=mode).collect()
        }
        rec[mode] = round(len(got & truth) / len(truth), 3)
    out["recall_1x"] = rec
    f = out["factors"]
    out["exact_ratio_27x"] = round(f[27]["exact_s"] / f[1]["exact_s"], 1)
    out["approx_ratio_27x"] = round(f[27]["approx_s"] / f[1]["approx_s"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
