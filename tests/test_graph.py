"""PageRank operator: hand-computed reference on a tiny graph, plus
partition-invariance of the decimal contribution sums (oracle-checked
end-to-end as x_pagerank)."""

from __future__ import annotations

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.graph import (
    pagerank,
)


def _ref_pagerank(edges, iterations=3, d=0.85):
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    n = len(nodes)
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {}
        for s, t, w in edges:
            c = round(r[s] * w / outw[s], 12)
            contrib[t] = contrib.get(t, 0.0) + c
        r = {v: (1.0 - d) / n + d * contrib.get(v, 0.0) for v in nodes}
    return r


EDGES = [
    ("a", "b", 2.0),
    ("a", "c", 1.0),
    ("b", "c", 1.0),
    ("c", "a", 1.0),
    ("d", "c", 3.0),
]


def test_pagerank_matches_reference(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string, w double")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    ref = _ref_pagerank(EDGES)
    assert set(got) == set(ref)
    for v in ref:
        assert abs(got[v] - ref[v]) < 1e-12
    # c receives the most mass; d (pure source) has only the teleport share
    assert got["c"] == max(got.values())
    assert got["d"] == min(got.values())


def test_pagerank_partition_invariant(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string, w double")
    one = {r["node"]: r["rank"] for r in pagerank(df.coalesce(1)).collect()}
    many = {r["node"]: r["rank"] for r in pagerank(df.repartition(7)).collect()}
    assert one == many
