"""Adversarial triangle soak: degree-ORIENTED wedge expansion vs the
naive id-ordered enumeration on a hub-skewed graph (round-5 VERDICT
item 4 — the 27× fixture soak showed 2.9× sub-linear growth on the
co-purchase graph, which is benign; this pins the orientation's skew
resistance on the graph shape that actually breaks naive enumeration).

Construction (deterministic, no RNG): scale factor N gives n = 3000·N
nodes with
  - ring edges (i, i+1 mod n)            — n edges
  - skip edges (i, i+7 mod n)            — n edges
  - one HUB: node 0 joined to every node with i % 10 < 8
                                         — ~0.8·n edges, ≈ 29% of all
The hub is node 0, the LOWEST id: id-ordered enumeration builds all
its wedges at the hub — C(0.8n, 2) ≈ 0.32·n² pairs, quadratic in
graph size — while degree-ordered orientation points every hub edge
AT the hub (highest degree), so the hub expands zero wedges and the
work stays near-linear. Same two-join plan shape either way; the
orientation is the only difference.

Legs:
  oriented — operators.graph.triangles (degree-ordered)
  naive    — id-ordered wedge join (the DuckDB oracle's form, run as
             a Spark plan)
Both legs are asserted COUNT-IDENTICAL where both run. The naive leg
is only run while its wedge count stays tractable (factors ≤ 8 here);
larger factors report oriented-only — stated, not silently dropped.

Usage: python scripts/soak_triangles.py [factors...] (default 1 8 27 64)
Prints one JSON line; PERF.md records the table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.graph import triangles
from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark

N0 = 3000
NAIVE_MAX_FACTOR = 8  # beyond this the naive leg's 0.32·n² hub wedges
                      # are the pathology under study, not a timing


def hub_graph(spark, factor: int):
    n = N0 * factor
    ids = spark.range(n).select(F.col("id").cast("bigint").alias("i"))
    ring = ids.select(F.col("i").alias("src"), ((F.col("i") + 1) % n).alias("dst"))
    skip = ids.select(F.col("i").alias("src"), ((F.col("i") + 7) % n).alias("dst"))
    hub = (
        ids.filter((F.col("i") % 10 < 8) & (F.col("i") != 0))
        .select(F.lit(0).cast("bigint").alias("src"), F.col("i").alias("dst"))
    )
    return ring.unionByName(skip).unionByName(hub)


def naive_triangles(edges):
    """Id-ordered enumeration: wedges pivot at each edge's LOW id —
    exactly the oracle's replay form, which is correct but lets a
    low-id hub build quadratic wedge pairs."""
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    x = e.select(F.col("a"), F.col("b").alias("b1"))
    y = e.select(F.col("a").alias("a2"), F.col("b").alias("b2"))
    w = x.join(y, (F.col("a") == F.col("a2")) & (F.col("b1") < F.col("b2")))
    z = e.select(F.col("a").alias("a3"), F.col("b").alias("b3"))
    return w.join(
        z, (F.col("b1") == F.col("a3")) & (F.col("b2") == F.col("b3")), "left_semi"
    ).select(F.col("a").alias("p1"), F.col("b1").alias("p2"), F.col("b2").alias("p3"))


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 8, 27, 64]
    spark = get_spark("soak-triangles")
    out = {"n0": N0, "hub_pct_edges": None, "factors": {}}
    for f in factors:
        # cache (not localCheckpoint): unpersist() actually frees cache
        # blocks, where checkpointed RDD blocks linger until GC and a
        # multi-factor soak would accumulate every factor's edge set in
        # executor storage (round-6 ADVICE). count() below materializes.
        edges = hub_graph(spark, f).cache()
        n_edges = edges.count()
        hub_deg = edges.filter((F.col("src") == 0) | (F.col("dst") == 0)).count()
        out["hub_pct_edges"] = round(100.0 * hub_deg / n_edges, 1)
        t0 = time.time()
        n_tri_o = triangles(edges).count()
        t_orient = time.time() - t0
        row = {
            "n_edges": n_edges,
            "hub_degree": hub_deg,
            "n_triangles": n_tri_o,
            "oriented_s": round(t_orient, 2),
        }
        if f <= NAIVE_MAX_FACTOR:
            t0 = time.time()
            n_tri_n = naive_triangles(edges).count()
            row["naive_s"] = round(time.time() - t0, 2)
            row["naive_over_oriented"] = round(row["naive_s"] / max(t_orient, 1e-9), 1)
            assert n_tri_n == n_tri_o, (n_tri_n, n_tri_o)
        else:
            row["naive_s"] = None  # quadratic hub wedges — the point
        out["factors"][f] = row
        edges.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
