"""Driver-contract guards: the harness compares Spark vs oracle by
sorting columns BY NAME and hashing values, so violations here fail
the gate in confusing ways — catch them as plain asserts instead.
All checks are plan/schema-level (no job execution)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES), set(ORACLES) - set(QUERIES)


def test_rows_only_set_is_intentional():
    # queries without an oracle get only the weaker rows-only check;
    # keep this list explicit so a forgotten oracle is loud
    # x_dedup_simhash graduated to a full oracle in round 4 (the md5
    # bit votes replay as shift/mask SQL); round 5 graduated
    # x_bpe_encode (frozen merge artifact -> pure regexp replay),
    # x_hll_rollup (exact-distinct + 5% tolerance boolean),
    # x_ann_ivf_trained (recall-floor audit vs SQL-replayed truth),
    # x_bpe_train (fixed iteration count -> 10 unrolled CTE rounds),
    # and x_mmr_rerank (fixed k=5 greedy trajectory unrolled over
    # 6-dp-rounded cosines). The one remaining entry is genuinely
    # non-replayable — numpy eigh has no SQL form — and carries the
    # green Parseval shadow x_pca_invariants.
    assert set(QUERIES) - set(ORACLES) == {
        "x_pca_project",
    }


@pytest.mark.parametrize("name", sorted(QUERIES))
@pytest.mark.slow  # round 16: heavy leg, slow tier (see pytest.ini)
def test_query_schema_is_driver_comparable(spark, name):
    df = QUERIES[name](spark, SF)
    cols = df.columns
    # duplicate names break the sort-by-name value comparison
    assert len(set(cols)) == len(cols), cols
    # the driver re-invokes queries; schema must be stable across calls
    assert QUERIES[name](spark, SF).columns == cols


def test_gate_rotation_invariant():
    """Round-11: the hand-staged 50-name gate front must satisfy the
    rotation invariant (never-checked queries + the entire oldest
    staleness tier are inside the front), derived from the recorded
    CORRECTNESS_r*.json artifacts — and the checker must actually
    catch a mis-staged front."""
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "scripts"))
    import check_rotation as cr

    import __spark_entry__ as entrymod

    registered = set(entrymod.queries())
    front = list(entrymod.queries())[: cr.GATE_N]
    latest = cr.load_latest(root)
    assert cr.check_front(front, latest, registered) == []

    # negative control: dropping one oldest-tier name from the front
    # must be flagged (the checker is not vacuously green)
    known = {n: r for n, r in latest.items() if n in registered}
    if known:
        oldest = min(known.values())
        victim = sorted(n for n, r in known.items() if r == oldest)[0]
        bad_front = [n for n in front if n != victim]
        problems = cr.check_front(bad_front, latest, registered)
        assert any(victim in p for p in problems)
    # and a never-checked name missing from the front is flagged too
    fake = registered | {"zz_brand_new_query"}
    problems = cr.check_front(front, latest, fake)
    assert any("zz_brand_new_query" in p for p in problems)
