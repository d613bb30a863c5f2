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


def test_bucketed_ann_subset_of_bucket(spark):
    base = _vecs(spark)
    out = S.bucketed_ann_topk(base, base.filter("vec_id = 0"), k=5).collect()
    # bucket of [1,0,0,0] = bit0 only → candidates must share bucket 1
    ids = {r["vec_id"] for r in out}
    assert 3 not in ids  # opposite-sign vector pruned by design
    assert 2 not in ids  # different bucket


def test_near_dup_pairs_threshold(spark):
    base = _vecs(spark)
    out = S.embedding_near_dup_pairs(base, threshold=0.95)
    pairs = {(r["id_a"], r["id_b"]): r["sim"] for r in out.collect()}
    assert (0, 1) in pairs  # cos ≈ 0.9939
    assert all(v >= 0.95 for v in pairs.values())
    assert all(a < b for a, b in pairs)
