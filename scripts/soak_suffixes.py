"""Suffix-array soak: scale the slice the gate query bounds (the
input to the prefix-doubling construction is docs × chars = suffix
count) by 1×/8×/27× and measure runtime ratios for suffix_array and
duplicated_suffix_lcp over the sf0.1 documents table.

What should happen at scale: round count is log2(max_chars) —
CONSTANT under doc growth — and every round is a keyed shuffle plus
a bucket-routed dense re-rank, so runtime should track the suffix
count ~linearly (sub-linearly while per-round scheduling overhead
dominates). A super-linear ratio would mean the ranking collapsed
into a global sort somewhere — the thing operators/ranking.py exists
to prevent.

Usage: python scripts/soak_suffixes.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.suffixes import (
    duplicated_suffix_lcp,
    suffix_array,
    suffix_removal,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.measures import t
from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
BASE_DOCS = 10
MAX_CHARS = 200


def main() -> None:
    spark = get_spark("soak-suffixes")
    spark.sparkContext.setLogLevel("ERROR")
    docs = t(spark, SRC, "documents")
    out = {"metric": "suffix_soak", "max_chars": MAX_CHARS, "factors": {}}
    for factor in (1, 8, 27):
        sl = docs.filter(F.col("doc_id") < BASE_DOCS * factor).localCheckpoint(
            eager=True
        )
        n_sufs = sl.select(
            F.sum(F.least(F.length("text"), F.lit(MAX_CHARS)))
        ).collect()[0][0]
        row = {"n_docs": sl.count(), "n_suffixes": int(n_sufs)}
        for label, fn in (
            ("sa_s", lambda d: suffix_array(d, max_chars=MAX_CHARS)),
            ("lcp_s", lambda d: duplicated_suffix_lcp(
                d, min_len=15, max_chars=MAX_CHARS)),
            ("lcp_ranks_s", lambda d: duplicated_suffix_lcp(
                d, min_len=15, max_chars=MAX_CHARS, mode="ranks")),
            # END-TO-END removal through the ranks discovery path —
            # the full 100 TB ExactSubstr pipeline (spans → interval
            # union → char rebuild), round-8 verdict item 6
            ("removal_ranks_s", lambda d: suffix_removal(
                d, min_len=15, max_chars=MAX_CHARS, lcp_mode="ranks")),
        ):
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(sl).count()
                el = time.time() - t0
                best = el if best is None or el < best else best
            row[label] = round(best, 2)
        out["factors"][factor] = row
    f = out["factors"]
    out["sa_ratio_27x"] = round(f[27]["sa_s"] / f[1]["sa_s"], 1)
    out["lcp_ratio_27x"] = round(f[27]["lcp_s"] / f[1]["lcp_s"], 1)
    out["lcp_ranks_ratio_27x"] = round(f[27]["lcp_ranks_s"] / f[1]["lcp_ranks_s"], 1)
    out["removal_ranks_ratio_27x"] = round(
        f[27]["removal_ranks_s"] / f[1]["removal_ranks_s"], 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
