"""Streaming semantics tests (SURVEY.md §5 item 4): watermark+dedup
through availableNow micro-batches; stream output == batch output on
the same input (replay determinism, ST2/ST4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_based_bi_etl_automation_for_real_estate_company_spark.sources import webhook as W
from cloud_based_bi_etl_automation_for_real_estate_company_spark.streaming.pipeline import (
    stream_silver,
)


def test_stream_equals_batch(spark, webhook_corpus, tmp_path):
    path, exp = webhook_corpus
    batch_out = str(tmp_path / "batch")
    stream_out = str(tmp_path / "stream")
    ckpt = str(tmp_path / "ckpt")

    batch, metrics = W.ingest_batch(spark, path, batch_out)
    assert metrics["n_rows"] == batch.count()
    assert metrics["n_accounts"] == 3
    q = stream_silver(spark, path, stream_out, ckpt, available_now=True)
    q.awaitTermination(120)

    stream = spark.read.parquet(stream_out)
    batch_ids = {r[0] for r in batch.select("id").collect()}
    stream_ids = {r[0] for r in stream.select("id").collect()}
    assert batch_ids == stream_ids
    # duplicate deliveries collapsed in both paths
    assert stream.groupBy("id").count().filter(F.col("count") > 1).count() == 0


def test_stream_restart_is_incremental(spark, webhook_corpus, tmp_path):
    """Re-running with the same checkpoint must not reprocess (no new
    rows) — Structured Streaming's exactly-once bookkeeping."""
    path, _ = webhook_corpus
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt2")
    q1 = stream_silver(spark, path, out, ckpt, available_now=True)
    q1.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    q2 = stream_silver(spark, path, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2


def test_stream_dedup_documents_across_restarts(spark, tmp_path):
    """Content dedup must hold across micro-batches AND across stream
    restarts (the persistent hash store outlives the watermark horizon
    that bounds dropDuplicates)."""
    import json

    from cloud_based_bi_etl_automation_for_real_estate_company_spark.streaming.pipeline import (
        stream_dedup_documents,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out = str(tmp_path / "docs")
    store = str(tmp_path / "hash_store")
    ckpt = str(tmp_path / "ckpt_docs")

    def write_batch(name, rows):
        (in_dir / name).write_text(
            "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows)
        )

    write_batch("b1.json", [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")])
    q = stream_dedup_documents(spark, str(in_dir), out, store, ckpt)
    q.awaitTermination(120)

    # restart with new files: one cross-restart dup, one new doc
    write_batch("b2.json", [(10, "gamma delta"), (11, "epsilon zeta")])
    q2 = stream_dedup_documents(spark, str(in_dir), out, store, ckpt)
    q2.awaitTermination(120)

    got = spark.read.parquet(out)
    assert {r["doc_id"] for r in got.collect()} == {1, 2, 11}
    texts = [r["text"] for r in got.collect()]
    assert len(texts) == len(set(texts))  # every surviving content unique
