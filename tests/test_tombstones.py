"""Round 15 — store takedown family (tombstones over the append-only
lifetime stores: dedup.append_tombstones / read_tombstones +
bm25_delete_docs, delete_from_minhash_store, nsw_delete).

The append-only stores had no delete path: a takedown
(right-to-be-forgotten, licensing removal) at 100 TB cannot rewrite a
multi-TB postings/signature/graph store inline. The design is the
Delta/Iceberg delete-file split: deletions land as an append-only
``{store}/tombstones`` id set, every reader anti-joins it (the doc
vanishes from results AND derived statistics immediately), and the
store's compaction makes the delete physical and clears the set —
crash anywhere in between leaves only no-op tombstones.

Pinned here, per store family:
- post-delete query ≡ a store never containing the doc (the strong
  statistics claim: N / avgdl / doc_freq re-derive from survivors);
- deletion is replay-idempotent (same ids appended twice);
- compaction physically drops the rows, clears tombstones, and the
  query answer is invariant across the compaction;
- minhash: a deleted doc stops suppressing new near-duplicates (the
  takedown semantics — a fresh copy of removed content is a fresh
  admit, not a duplicate of a ghost);
- NSW: deleted ids vanish from top-k while still ROUTING pre-compact
  (HNSW soft delete), and post-compact the vectors are physically
  gone with the NN-descent refresh re-linking around the holes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.corpus import (
    bm25_delete_docs,
    bm25_index_append,
    bm25_query_store,
    compact_bm25_store,
    corpus_bigram_queries,
    mlt_query_store,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.dedup import (
    compact_minhash_store,
    delete_from_minhash_store,
    incremental_minhash_dedup,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.similarity import (
    brute_force_topk,
    compact_nsw_graph,
    nsw_build_graph,
    nsw_delete,
    nsw_query_index,
    save_nsw_index,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        tuple(
            round(v, 9) if isinstance(v, float) else v for v in r
        )
        for r in df.collect()
    )


def test_bm25_delete_matches_reduced_one_shot(spark, tmp_path):
    d = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    keep = d.filter(F.col("doc_id") % 7 != 0)
    q = corpus_bigram_queries(keep).localCheckpoint(eager=True)

    full = str(tmp_path / "full")
    bm25_index_append(d, full)
    bm25_delete_docs(d.filter(F.col("doc_id") % 7 == 0).select("doc_id"), full)
    reduced = str(tmp_path / "reduced")
    bm25_index_append(keep, reduced)

    got = _rows(bm25_query_store(spark, full, q, k=5))
    want = _rows(bm25_query_store(spark, reduced, q, k=5))
    assert got == want and len(got) > 0

    # replay the SAME delete (at-least-once feed) — answer unchanged
    bm25_delete_docs(d.filter(F.col("doc_id") % 7 == 0).select("doc_id"), full)
    assert _rows(bm25_query_store(spark, full, q, k=5)) == want

    # MLT reads the same store through the same tombstone filter
    qd = keep.filter(F.col("doc_id") < 30).select("doc_id")
    got_m = _rows(mlt_query_store(spark, full, qd, k=3))
    want_m = _rows(mlt_query_store(spark, reduced, qd, k=3))
    assert got_m == want_m and len(got_m) > 0

    # compaction: physical drop, tombstones cleared, answer invariant
    import os

    compact_bm25_store(spark, full)
    assert not os.path.exists(f"{full}/tombstones")
    left = spark.read.parquet(f"{full}/postings")
    assert left.filter(F.col("doc_id") % 7 == 0).count() == 0
    assert _rows(bm25_query_store(spark, full, q, k=5)) == want


def test_minhash_delete_readmits_fresh_copy(spark, tmp_path):
    store = str(tmp_path / "mh")
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    d1 = spark.createDataFrame([(1, base)], "doc_id bigint, text string")
    assert incremental_minhash_dedup(d1, store).collect()[0]["admitted"]
    d2 = spark.createDataFrame(
        [(2, base + " tail")], "doc_id bigint, text string"
    )
    assert not incremental_minhash_dedup(d2, store).collect()[0]["admitted"]

    # take down BOTH admitted ids: a fresh near-copy is a fresh admit
    delete_from_minhash_store(
        spark.createDataFrame([(1,), (2,)], "doc_id bigint"), store
    )
    d3 = spark.createDataFrame(
        [(3, base + " coda")], "doc_id bigint, text string"
    )
    assert incremental_minhash_dedup(d3, store).collect()[0]["admitted"]

    # compaction drops the tombstoned signatures physically; doc 3's
    # signature survives and still suppresses its near-dups
    import os

    compact_minhash_store(spark, store)
    assert not os.path.exists(f"{store}/tombstones")
    ids = {r["doc_id"] for r in spark.read.parquet(f"{store}/sigs").collect()}
    assert ids == {3}
    d4 = spark.createDataFrame(
        [(4, base + " encore")], "doc_id bigint, text string"
    )
    assert not incremental_minhash_dedup(d4, store).collect()[0]["admitted"]


def test_soft_store_delete(spark, tmp_path):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.dedup import (
        compact_soft_store,
        delete_from_soft_store,
        soft_dedup_admit,
        soft_dedup_finalize,
    )

    store = str(tmp_path / "soft")
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    soft_dedup_admit(
        spark.createDataFrame(
            [(1, base), (2, base + " tail")], "doc_id bigint, text string"
        ),
        store,
    )
    # both landed in one cluster
    fin = {r["doc_id"]: r for r in soft_dedup_finalize(spark, store).collect()}
    assert fin[1]["cluster_id"] == fin[2]["cluster_id"]
    assert fin[1]["n_cluster"] == 2

    delete_from_soft_store(
        spark.createDataFrame([(1,)], "doc_id bigint"), store
    )
    # finalize over survivors only: 2 is now a singleton
    fin2 = {
        r["doc_id"]: r for r in soft_dedup_finalize(spark, store).collect()
    }
    assert set(fin2) == {2} and fin2[2]["n_cluster"] == 1
    # a new near-copy clusters with the SURVIVOR only: running size 2
    # (members {2, 3}) — a broken tombstone filter would count the
    # ghost and report 3
    out3 = soft_dedup_admit(
        spark.createDataFrame([(3, base + " coda")], "doc_id bigint, text string"),
        store,
    ).collect()[0]
    assert out3["n_cluster"] == 2

    import os

    compact_soft_store(spark, store)
    assert not os.path.exists(f"{store}/tombstones")
    ids = {r["doc_id"] for r in spark.read.parquet(f"{store}/sigs").collect()}
    assert ids == {2, 3}


def test_ivf_delete_logical(spark, tmp_path):
    from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.similarity import (
        build_ivf_index,
        ivf_delete,
        ivf_query_index,
        load_ivf_index,
        save_ivf_index,
    )

    store = str(tmp_path / "ivf")
    base = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") < 80)
        .localCheckpoint(eager=True)
    )
    save_ivf_index(build_ivf_index(base), store)
    deleted = base.filter(F.col("vec_id") % 10 == 3).select("vec_id")
    ivf_delete(deleted, store)
    ivf_delete(deleted, store)  # replay-idempotent
    q = base.filter(F.col("vec_id") < 3)
    got = ivf_query_index(load_ivf_index(spark, store), q, k=5, n_probes=2)
    del_ids = {r["vec_id"] for r in deleted.collect()}
    rows = got.collect()
    assert len(rows) > 0
    assert not ({r["vec_id"] for r in rows} & del_ids)


def test_nsw_delete_soft_then_physical(spark, tmp_path):
    store = str(tmp_path / "nsw")
    base = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") < 120)
        .localCheckpoint(eager=True)
    )
    save_nsw_index(base, nsw_build_graph(base), store)
    deleted = base.filter(F.col("vec_id") % 10 == 7).select("vec_id")
    kept = base.join(deleted, "vec_id", "left_anti")
    nsw_delete(deleted, store)
    q = base.filter(F.col("vec_id") < 3)

    # soft delete: excluded from top-k, recall vs the SURVIVING corpus
    got = nsw_query_index(spark, store, q, k=5).localCheckpoint(eager=True)
    del_ids = {r["vec_id"] for r in deleted.collect()}
    assert not ({r["vec_id"] for r in got.collect()} & del_ids)
    truth = {
        (r["q_id"], r["vec_id"])
        for r in brute_force_topk(kept, q, k=5).collect()
    }
    hits = {(r["q_id"], r["vec_id"]) for r in got.collect()} & truth
    assert len(hits) / len(truth) >= 0.4

    # physical delete at compaction (+ NN-descent re-link), tombstones
    # cleared, results still clean and recall holds
    import os

    compact_nsw_graph(spark, store, refresh_iters=1)
    assert not os.path.exists(f"{store}/tombstones")
    vec_ids = {
        r["vec_id"] for r in spark.read.parquet(f"{store}/vectors").collect()
    }
    assert not (vec_ids & del_ids) and vec_ids == {
        r["vec_id"] for r in kept.collect()
    }
    g = spark.read.parquet(f"{store}/graph")
    assert g.filter(
        F.col("src").isin(*del_ids) | F.col("dst").isin(*del_ids)
    ).count() == 0
    got2 = nsw_query_index(spark, store, q, k=5)
    assert not ({r["vec_id"] for r in got2.collect()} & del_ids)
    hits2 = {(r["q_id"], r["vec_id"]) for r in got2.collect()} & truth
    assert len(hits2) / len(truth) >= 0.4
