"""NSW append-parity soak AT DEPTH (round 14 — the r13 verdict's
task 5: nsw_index_append was only ever measured at one half+half
split): seed the persisted index from a 1/(G+1) slice of the x8-staged
embeddings, then fold the remaining G slices in as SEQUENTIAL
generations with a compaction every ``compact_every`` appends —
the shape a long-lived streaming index actually ages through.

Pinned per generation (hard asserts, not just reporting):

- recall@5 of nsw_query_index (5 fixed copy-0 queries) vs brute force
  over the ACCUMULATED corpus ≥ RECALL_FLOOR — search quality must
  not decay as append generations and compactions stack up;
- after every compaction, max out-degree per (level, src) ≤ M — the
  degree cap the reverse-edge appends deliberately overflow must be
  restored by compact_nsw_graph across generations, not just once;
- append wall-time ratio last/first bounded: each append searches the
  grown graph for a FIXED-size slice, so per-generation cost should
  grow gently (graph/vector scan term), never super-linearly.

Usage: python scripts/soak_nsw_depth.py [N_COPIES] [GENERATIONS] [REFRESH]
[SELECT] (defaults 8, 8, 0, topm; the r13 single-split datapoint was
2.06x at 8x). SELECT = topm | heuristic picks the compaction's
neighbor-selection rule (round 15).
REFRESH > 0 passes compact_nsw_graph(refresh_iters=REFRESH) at each
compaction — the round-14 post-prune NN-descent re-enrichment — so
the post-compaction recall dip the default run records can be
compared against the refreshed path. Prints one JSON line for
PERF.md.
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

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.similarity import (
    brute_force_topk,
    compact_nsw_graph,
    nsw_build_graph,
    nsw_index_append,
    nsw_query_index,
    save_nsw_index,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.measures import t
from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark
from soak import stage

M = 12
RECALL_FLOOR = 0.6  # overall recall@5; r13 measured 0.92-1.0 append-built


def _recall(spark, store: str, base, queries) -> float:
    truth = {
        (r["q_id"], r["vec_id"])
        for r in brute_force_topk(base, queries, k=5).collect()
    }
    got = {
        (r["q_id"], r["vec_id"])
        for r in nsw_query_index(spark, store, queries, k=5).collect()
    }
    return len(got & truth) / len(truth)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    gens = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    refresh = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    select = sys.argv[4] if len(sys.argv) > 4 else "topm"
    compact_every = 4
    spark = get_spark("soak-nsw-depth")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = stage(spark, n)

    e = t(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    queries = e.filter(F.col("vec_id") < 5).localCheckpoint(eager=True)
    slot = F.pmod(F.col("vec_id"), F.lit(gens + 1))
    store = tempfile.mkdtemp(prefix="spark_graft_soak_nswdepth_")
    report: dict = {
        "n": n, "generations": gens, "refresh_iters": refresh,
        "select": select, "gen": []
    }
    try:
        seed = e.filter(slot == 0)
        t0 = time.time()
        save_nsw_index(seed, nsw_build_graph(seed), store)
        build_s = round(time.time() - t0, 3)
        acc = seed
        append_times: list[float] = []
        for g in range(1, gens + 1):
            batch = e.filter(slot == g).localCheckpoint(eager=True)
            t0 = time.time()
            nsw_index_append(batch, store)
            el = round(time.time() - t0, 3)
            append_times.append(el)
            acc = acc.unionByName(batch).localCheckpoint(eager=True)
            compacted = g % compact_every == 0
            if compacted:
                compact_nsw_graph(
                    spark, store, M=M, refresh_iters=refresh, select=select
                )
                deg = (
                    spark.read.parquet(f"{store}/graph")
                    .groupBy("level", "src")
                    .count()
                    .agg(F.max("count"))
                    .collect()[0][0]
                )
                assert deg <= M, f"degree cap broken post-compaction: {deg}"
            rec = _recall(spark, store, acc, queries)
            assert rec >= RECALL_FLOOR, f"recall floor broken at gen {g}: {rec}"
            # graph-store file count — the round-15 stats_frame fix's
            # tripwire (a checkpointed-stats rewrite exploded to the
            # 100k-file guard and octupled every later append)
            n_files = len(
                [x for x in os.listdir(f"{store}/graph")
                 if x.endswith(".parquet")]
            )
            assert n_files <= 1000, f"graph file explosion at gen {g}: {n_files}"
            report["gen"].append(
                {
                    "g": g,
                    "append_s": el,
                    "recall@5": round(rec, 3),
                    "compacted": compacted,
                    "graph_files": n_files,
                }
            )
        report["seed_build_s"] = build_s
        report["append_ratio_last_over_first"] = round(
            append_times[-1] / append_times[0], 2
        )
        report["min_recall"] = min(x["recall@5"] for x in report["gen"])
        report["max_degree_post_final_compaction"] = int(deg) if gens >= compact_every else None
    finally:
        shutil.rmtree(store, ignore_errors=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
