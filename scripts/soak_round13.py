"""Round-13 operator scale soak: blow the sf0.1 fixtures up N×
(scripts/soak.py staging) and measure the round-13 additions' runtime
ratios x1 → xN. Structural expectations under test:

- chunk_sentences: map-only zero-shuffle fold — ratio ≈ linear scan
  cost (the punctuation injection is part of the measured map).
- rolling_drift: ONE fact-grain count agg over N× events feeding
  week×value-grid frames; the grid is CONSTANT in N (copies reuse the
  same ts span and value hull), so agg linear, downstream constant.
- w1_admit two-batch replay: batch digest build linear, scoring grid
  O(batch distinct values + 2δ centroids) — near-linear overall.
- mlt_query_store with a FIXED copy-0 query set: postings-store build
  (two appends) linear in corpus; query bounded by the fixed query
  docs' posting lists plus the N× corpus-side postings join — ~linear.
- nsw_build_graph: LSH-seeded NN-descent, O(N·M²) per round →
  ~linear; nsw_topk on the PREBUILT graph with 5 fixed queries —
  beam search is O(beam·M·hops) per query, INDEPENDENT of N (the
  point of graph ANN; the soak makes that measurable).

Usage: python scripts/soak_round13.py [N]   (default 8)
Prints one JSON line {"n": N, "x1": {...}, "xN": {...}, "ratio": {...}}.
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
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.corpus import (
    bm25_index_append,
    chunk_sentences,
    mlt_query_store,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.quality import (
    rolling_chi2,
    rolling_drift,
    w1_admit,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.operators.similarity import (
    nsw_build_graph,
    nsw_index_append,
    nsw_topk,
    save_nsw_index,
)
from cloud_based_bi_etl_automation_for_real_estate_company_spark.plans.measures import t
from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import get_spark
from soak import SRC, stage


def _chunks(spark, sf_dir: str):
    d = t(spark, sf_dir, "documents").withColumn(
        "text", F.regexp_replace(F.col("text"), r"\b(batch|data|join) ", "$1. ")
    )
    return chunk_sentences(d, max_tokens=32)


def _rolling(spark, sf_dir: str):
    ev = t(spark, sf_dir, "events")
    return rolling_drift(ev.withColumn("value", F.floor("value")), "value")


def _w1_two_batch(spark, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="spark_graft_soak_w1_")
    try:
        w1_admit(d.filter(F.col("doc_id") % 2 == 0), tmp, delta=500)
        out = w1_admit(
            d.filter(F.col("doc_id") % 2 == 1), tmp, delta=500
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _mlt_store(spark, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    q = d.filter(
        (F.col("doc_id") % 29 == 0) & (F.col("doc_id") < 10_000_000)
    ).select("doc_id")
    tmp = tempfile.mkdtemp(prefix="spark_graft_soak_mlt_")
    try:
        bm25_index_append(d.filter(F.col("doc_id") % 2 == 0), tmp)
        bm25_index_append(d.filter(F.col("doc_id") % 2 == 1), tmp)
        out = mlt_query_store(spark, tmp, q).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


_GRAPH_CACHE: dict[str, object] = {}


def _nsw_build(spark, sf_dir: str):
    e = t(spark, sf_dir, "embeddings")
    g = nsw_build_graph(e).localCheckpoint(eager=True)
    _GRAPH_CACHE[sf_dir] = g
    return g


def _nsw_query(spark, sf_dir: str):
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return nsw_topk(e, q, k=5, graph=_GRAPH_CACHE[sf_dir])


def _rolling_cat(spark, sf_dir: str):
    return rolling_chi2(t(spark, sf_dir, "events"))


def _nsw_append(spark, sf_dir: str):
    """Half-seed + half-append — measures the search-then-connect
    insert path (per-vector cost should track the corpus size only
    through the graph/vector scans, i.e. ~linear)."""
    e = t(spark, sf_dir, "embeddings")
    old = e.filter(F.col("vec_id") % 2 == 0)
    new = e.filter(F.col("vec_id") % 2 == 1)
    tmp = tempfile.mkdtemp(prefix="spark_graft_soak_nswapp_")
    try:
        save_nsw_index(old, nsw_build_graph(old), tmp)
        nsw_index_append(new, tmp)
        out = (
            new.sparkSession.read.parquet(f"{tmp}/graph")
            .groupBy("level")
            .count()
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


CASES = {
    "chunk_sentences": _chunks,
    "rolling_drift": _rolling,
    "rolling_chi2": _rolling_cat,
    "w1_admit_2batch": _w1_two_batch,
    "mlt_store_fixed_queries": _mlt_store,
    "nsw_build": _nsw_build,
    "nsw_query_prebuilt": _nsw_query,
    "nsw_append_half": _nsw_append,
}


_HEAVY = {"nsw_build", "nsw_append_half"}  # index builds: one rep


def run_set(spark, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    for name, fn in CASES.items():
        best = None
        # nsw_query needs the SAME-dir build from nsw_build's run;
        # CASES order guarantees the cache is populated first
        for _ in range(1 if name in _HEAVY else 2):
            t0 = time.time()
            fn(spark, sf_dir).count()
            el = time.time() - t0
            best = el if best is None or el < best else best
        times[name] = round(best, 3)
    return times


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("soak_round13")
    spark.sparkContext.setLogLevel("ERROR")
    big = stage(spark, n)
    r1 = run_set(spark, SRC)
    rn = run_set(spark, big)
    ratio = {k: round(rn[k] / r1[k], 2) if r1[k] else None for k in CASES}
    print(json.dumps({"n": n, "x1": r1, f"x{n}": rn, "ratio": ratio}))


if __name__ == "__main__":
    main()
