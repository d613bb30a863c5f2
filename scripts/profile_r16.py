"""Round-16 measurement harness: per-leg Spark JOB/STAGE counts.

Evidence for the scaling block (VERDICT r15 item 6): most headline
legs are 0.2-2 s at sf0.1, where job-launch + stage-barrier latency
dominates and core count barely matters. Counting jobs/stages per leg
makes that attribution auditable instead of asserted — a leg with 25
jobs at ~0.1 s/job is overhead-bound by inspection.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... python scripts/profile_r16.py [leg ...]
Prints one TSV row per leg: name, seconds, n_jobs, n_stages.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import (
    get_spark,
)
import __spark_entry__ as entrymod


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-r16")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    import bench as benchmod

    if not os.environ.get("SPARK_GRAFT_NO_STAGE"):
        sf_dir = benchmod.stage_fixtures(spark, sf_dir)

    names = sys.argv[1:] or benchmod.HEADLINE
    spark.range(1000).selectExpr("sum(id)").collect()

    st = spark.sparkContext.statusTracker()
    print("leg\tsec\tn_jobs\tn_stages")
    for name in names:
        fn = qs[name]
        # warm (codegen) pass, untracked
        fn(spark, sf_dir).count()
        group = f"prof_{name}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.time()
        fn(spark, sf_dir).count()
        el = time.time() - t0
        spark.sparkContext._jsc.clearJobGroup()
        jids = st.getJobIdsForGroup(group)
        n_stages = 0
        for j in jids:
            ji = st.getJobInfo(j)
            if ji is not None:
                n_stages += len(ji.stageIds)
        print(f"{name}\t{el:.3f}\t{len(jids)}\t{n_stages}")


if __name__ == "__main__":
    main()
