"""Streaming-admission store-growth soak: drive the drift admission
family (psi_admit, chi2_admit, ks_admit) for N consecutive batches
against one store each and measure per-batch wall time plus final
store row counts. The design claim under test: each admission is
O(batch + store), and the stores grow by AGGREGATED rows only
(≤ n_buckets / ≤ categories / ≤ 2δ centroids per batch) — so batch
latency stays flat as history accumulates instead of creeping with
corpus lifetime.

Usage: python scripts/soak_admission.py [n_batches] [rows_per_batch]
Prints one JSON line with first-5/last-5 mean-latency ratios and
store row counts.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.quality import (
    chi2_admit,
    ks_admit,
    psi_admit,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark

LANGS = ["en", "de", "fr", "nl", "es"]


def batch_df(spark, i: int, rows: int):
    # deterministic per-batch synthetic slice; mild drift with i so
    # the statistics have something to do
    data = [
        (
            (i * rows + j) * 2654435761 % 3000 + (i % 7) * 10,
            LANGS[(j + i) % len(LANGS)],
        )
        for j in range(rows)
    ]
    return spark.createDataFrame(data, "n_chars bigint, lang string")


def drive(spark, admit, store, n_batches: int, rows: int) -> dict:
    times = []
    for i in range(n_batches):
        b = batch_df(spark, i, rows)
        t0 = time.time()
        admit(b, store)
        times.append(time.time() - t0)
    head = sum(times[:5]) / 5
    tail = sum(times[-5:]) / 5
    return {
        "head_s": round(head, 3),
        "tail_s": round(tail, 3),
        "ratio": round(tail / head, 2),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark("soak_admission")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="spark_graft_admit_soak_")
    out = {"n_batches": n, "rows_per_batch": rows}
    try:
        out["psi"] = drive(
            spark,
            lambda b, s: psi_admit(b, s),
            os.path.join(root, "psi"),
            n,
            rows,
        )
        out["psi"]["store_rows"] = spark.read.parquet(
            os.path.join(root, "psi", "hist")
        ).count()
        out["chi2"] = drive(
            spark,
            lambda b, s: chi2_admit(b, s),
            os.path.join(root, "chi2"),
            n,
            rows,
        )
        out["chi2"]["store_rows"] = spark.read.parquet(
            os.path.join(root, "chi2", "cats")
        ).count()
        out["ks"] = drive(
            spark,
            lambda b, s: ks_admit(b, s),
            os.path.join(root, "ks"),
            n,
            rows,
        )
        out["ks"]["store_rows"] = spark.read.parquet(
            os.path.join(root, "ks", "centroids")
        ).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
