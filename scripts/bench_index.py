"""Index-query bench (secondary series, round 15 — the r14 verdict's
task 5): the STORE-BACKED search paths get a tracked per-round number
without disturbing the 20-query headline bench's comparability, the
same posture as the write-side series (bench_write.py).

Legs, each a pure QUERY over a PREBUILT persisted store at sf0.1
(builds are untimed — the whole point of the persisted-index family
is that the build is paid once and amortized across every query, so
the tracked number must be the query path alone, the r13→r14 lesson
from the build-dominated x_ann_hnsw row):

- nsw_query_index: beam-search descent over the cached two-batch
  layered-NSW store (the SAME (sf_dir, mtime, params)-keyed cache the
  x_ann_hnsw_store gate uses — repeated bench/gate runs share one
  build), 50 query vectors, k=5.
- bm25_query_store: BM25 top-5 for 25 deterministic 3-token queries
  drawn from the corpus itself, against the one-shot-appended
  postings store.
- mlt_query_store: "more like this" TF-IDF cosine top-3 for 25 query
  docs against the same postings store (one store serves both
  retrieval surfaces — the rows are format-identical).

Best-of-2 per leg (first run pays codegen), one JSON line, same
contract as bench_write. bench.py folds the row into the per-round
BENCH artifact as the ``index_bench`` sub-object.

Usage: python scripts/bench_index.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.corpus import (
    bm25_index_append,
    bm25_query_store,
    mlt_query_store,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.similarity import (
    nsw_query_index,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.extensions import (
    _nsw_gate_store,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.measures import t
from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        fn()
        el = time.time() - t0
        best = el if best is None or el < best else best
    return round(best, 3)


def run(spark, src: str) -> dict:
    """Run the three index-query legs and return the result dict —
    callable standalone (main below) and from bench.py, which folds
    the row into the per-round BENCH artifact."""
    out = {"metric": "index_query_bench", "sf_dir": src, "queries": {}}

    # ---- NSW: reuse the gate's cached two-batch store (build untimed,
    # and usually already paid by a prior gate/driver run this round)
    nsw_store = _nsw_gate_store(spark, src)
    emb = t(spark, src, "embeddings")
    q_vecs = emb.filter(F.col("vec_id") < 50).localCheckpoint(eager=True)
    out["n_nsw_queries"] = q_vecs.count()
    out["queries"]["nsw_query_index"] = timed(
        lambda: nsw_query_index(spark, nsw_store, q_vecs, k=5).count()
    )

    # ---- BM25/MLT: one-shot-appended postings store in a temp dir
    # (the build is a single tokenize+agg over the documents fixture —
    # untimed; both text legs then query the same store)
    root = tempfile.mkdtemp(prefix="spark_graft_bench_index_")
    try:
        store = os.path.join(root, "bm25")
        docs = t(spark, src, "documents")
        bm25_index_append(docs, store)
        out["n_docs"] = docs.count()

        # deterministic 3-token queries drawn from the corpus itself
        q_text = (
            docs.filter(F.col("doc_id") < 25)
            .select(
                F.concat_ws(
                    " ", F.slice(F.split(F.trim("text"), r"\s+"), 1, 3)
                ).alias("query")
            )
            .filter(F.length("query") > 0)
            .localCheckpoint(eager=True)
        )
        out["n_text_queries"] = q_text.count()
        out["queries"]["bm25_query_store"] = timed(
            lambda: bm25_query_store(spark, store, q_text, k=5).count()
        )

        q_docs = (
            docs.filter(F.col("doc_id") < 25)
            .select("doc_id")
            .localCheckpoint(eager=True)
        )
        out["queries"]["mlt_query_store"] = timed(
            lambda: mlt_query_store(spark, store, q_docs, k=3).count()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    spark = get_spark("bench-index")
    try:
        print(json.dumps(run(spark, SRC)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
