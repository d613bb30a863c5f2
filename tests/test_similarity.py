"""Similarity-search operator tests: exact top-k correctness vs numpy,
bucketed-ANN containment, near-dup symmetry."""

from __future__ import annotations

import math

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators import (
    similarity as S,
)


def _vecs(spark):
    # strictly-signed dims: zeros sit exactly on the sign-bucket
    # boundary and make bucket membership an accident of the test data
    rows = [
        (0, [1.0, 0.1, 0.1, 0.1]),
        (1, [0.9, 0.2, 0.1, 0.1]),
        (2, [0.1, 1.0, -0.5, 0.2]),
        (3, [-1.0, -0.1, -0.1, -0.1]),
        (4, [0.5, 0.5, 0.1, 0.1]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def test_brute_force_topk_matches_reference(spark):
    base = _vecs(spark)
    out = S.brute_force_topk(base, base.filter("vec_id = 0"), k=2).collect()
    got = [(r["vec_id"], r["sim"]) for r in sorted(out, key=lambda r: r["rnk"])]
    assert got[0][0] == 1  # nearest neighbour of vec 0
    expected = round(_cos([1.0, 0.1, 0.1, 0.1], [0.9, 0.2, 0.1, 0.1]), 6)
    assert abs(got[0][1] - expected) < 1e-9
    assert got[1][0] == 4


def test_bucketed_ann_multiprobe_candidates(spark):
    base = _vecs(spark)
    out = S.bucketed_ann_topk(base, base.filter("vec_id = 0"), k=5).collect()
    ids = {r["vec_id"] for r in out}
    # query bucket 15; probes = {15, 14, 13, 11, 7}
    assert 3 not in ids  # all-negative vector (bucket 0, Hamming 4) pruned
    assert 2 in ids      # bucket 11 (Hamming 1) reached via multi-probe
    assert 1 in ids and 4 in ids  # same-bucket neighbours


def test_near_dup_pairs_threshold(spark):
    base = _vecs(spark)
    out = S.embedding_near_dup_pairs(base, threshold=0.95)
    pairs = {(r["id_a"], r["id_b"]): r["sim"] for r in out.collect()}
    assert (0, 1) in pairs  # cos ≈ 0.9939
    assert all(v >= 0.95 for v in pairs.values())
    assert all(a < b for a, b in pairs)


def test_ann_recall_vs_bruteforce(spark):
    """Measured recall of the approximate strategies against the exact
    top-k on the real embeddings fixture — the quality metric an ANN
    needs alongside speed. Deterministic data → stable assertion."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter("vec_id < 5")
    exact = {
        (r["q_id"], r["vec_id"]) for r in S.brute_force_topk(e, q, k=5).collect()
    }

    def recall(df):
        approx = {(r["q_id"], r["vec_id"]) for r in df.collect()}
        return len(approx & exact) / len(exact)

    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.similarity import (
        bucketed_ann_topk,
        ivf_topk,
        pq_topk,
    )

    r_lsh = recall(bucketed_ann_topk(e, q, k=5))
    r_lsh2 = recall(bucketed_ann_topk(e, q, k=5, tables=2))
    r_ivf = recall(ivf_topk(e, q, k=5))
    r_pq = recall(pq_topk(e, q, k=5))
    # all prune hard; they must still find a nontrivial share of the
    # true neighbours on this fixture
    assert r_lsh >= 0.4, r_lsh   # measured 0.52 multi-probe
    assert r_lsh2 >= 0.7, r_lsh2  # measured 0.80 — OR-amplified 2-table
    assert r_lsh2 > r_lsh         # amplification must actually help
    assert r_ivf >= 0.8, r_ivf   # measured 0.96 single-probe IVF
    assert r_pq >= 0.3, r_pq     # measured 0.40 (m=8, ks=64) — random
    # fixture vectors are the PQ worst case; trained codebooks raise this
