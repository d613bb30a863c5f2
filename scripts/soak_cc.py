"""Connected-components soak: star contraction vs min-label
propagation on graphs whose DIAMETER scales — the measurement behind
round 9's promotion of connected_components_star to the headline
x_dedup_clusters form.

Graph per factor f: 200·f cliques of size 4 (the near-dup shape,
diameter 1) PLUS one path of length 50·f (the long-chain shape a
crawl-link or coreference graph produces). Expectation:
- star: rounds grow ~log(path length); wall time ~flat-ish.
- min-label: rounds grow LINEARLY with path length; at the default
  max_iter=20 bound it stops converging beyond factor 1 and silently
  under-merges (we count distinct labels on the path component to
  show it), while require_convergence=True raises.

Prints one JSON line.

Usage: python scripts/soak_cc.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark


def build_edges(spark, factor: int):
    n_cliques, path_len = 200 * factor, 50 * factor
    rows = []
    base = 1_000_000  # clique ids above the path id range
    for c in range(n_cliques):
        ids = [base + 4 * c + j for j in range(4)]
        rows += [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
    rows += [(i, i + 1) for i in range(path_len)]
    return (
        spark.createDataFrame(rows, "id_a bigint, id_b bigint")
        .repartition(32)
        .localCheckpoint(eager=True)
    ), path_len


def main() -> None:
    spark = get_spark("soak-cc")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "cc_soak", "factors": {}}
    for factor in (1, 4, 16):
        edges, path_len = build_edges(spark, factor)
        n_edges = edges.count()
        rec = {"n_edges": n_edges, "path_len": path_len}
        for fn, name in (
            # star runs with the local finish DISABLED: this soak
            # measures the distributed fixpoint loop's diameter
            # scaling, which the size-gated union-find would bypass
            # at these edge counts
            (
                lambda e: connected_components_star(
                    e, local_finish_max_edges=0
                ),
                "star",
            ),
            (connected_components, "minlabel"),
        ):
            best = None
            for _ in range(2):
                t0 = time.time()
                res = fn(edges).localCheckpoint(eager=True)
                el = time.time() - t0
                best = el if best is None or el < best else best
            # correctness on the path component: fully merged iff the
            # path's nodes all carry label 0
            path_labels = (
                res.filter(F.col("doc_id") <= path_len)
                .select("cluster_id")
                .distinct()
                .count()
            )
            rec[name] = {"s": round(best, 2), "path_labels": path_labels}
        out["factors"][factor] = rec
    f = out["factors"]
    out["star_ratio_16x"] = round(
        f[16]["star"]["s"] / f[1]["star"]["s"], 1
    )
    out["minlabel_converged_at_16x"] = (
        f[16]["minlabel"]["path_labels"] == 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
