"""Generation-directory table maintenance — atomic snapshot refresh
without a table format's MERGE/commit log.

Problem: `mode("overwrite")` deletes files before the rewrite
finishes; a dashboard query running mid-refresh reads a half table.
The reference sidesteps this because Power BI copies data into its own
store at import time (reference README.md:511) — our readers hit the
files directly, so the swap must be atomic.

Mechanism: each refresh writes a complete snapshot into a fresh
``gen-<n>/`` directory, then atomically re-points a one-line manifest
(os.replace — POSIX-atomic on the same filesystem). Readers resolve
the manifest first, so they see either the old or the new generation,
never a mix. Old generations are retired only after a retention count,
letting in-flight readers finish (the same reader/writer isolation
idea a table format's snapshot log provides, minus the format
dependency; on object stores swap the rename for a conditional PUT).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_current.json"


def _manifest_path(table_path: str) -> str:
    return os.path.join(table_path, MANIFEST)


def current_generation(table_path: str) -> int | None:
    p = _manifest_path(table_path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["generation"]


def write_generation(
    df: DataFrame,
    table_path: str,
    keep_generations: int = 2,
    partition_by: list[str] | None = None,
) -> int:
    """Write ``df`` as the next generation and atomically publish it.
    Returns the new generation number."""
    cur = current_generation(table_path)
    nxt = 0 if cur is None else cur + 1
    gen_dir = os.path.join(table_path, f"gen-{nxt}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(gen_dir)

    os.makedirs(table_path, exist_ok=True)
    tmp = _manifest_path(table_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"generation": nxt}, f)
    os.replace(tmp, _manifest_path(table_path))  # the atomic publish

    # retire generations beyond the retention window
    floor = nxt - keep_generations
    for name in os.listdir(table_path):
        if name.startswith("gen-") and int(name.split("-")[1]) < floor:
            shutil.rmtree(os.path.join(table_path, name), ignore_errors=True)
    return nxt


def read_current(spark: SparkSession, table_path: str) -> DataFrame:
    """Resolve the manifest, read that generation's parquet."""
    gen = current_generation(table_path)
    if gen is None:
        raise FileNotFoundError(f"no published generation under {table_path}")
    return spark.read.parquet(os.path.join(table_path, f"gen-{gen}"))


def compact_generation(
    spark: SparkSession,
    table_path: str,
    target_mb: int = 128,
    keep_generations: int = 2,
) -> int:
    """Small-file compaction: rewrite the current generation with
    file count sized from the data's actual bytes (~``target_mb`` per
    file) and publish atomically as the next generation — the
    OPTIMIZE/maintenance job every streaming or micro-batch sink
    eventually needs (thousands of kilobyte files turn every scan
    into a listing+open storm; at 100 TB the metadata cost alone
    dominates). Readers are never disturbed: they follow the manifest
    and see old-or-new, the generation mechanism's whole point.
    Returns the new generation number."""
    gen = current_generation(table_path)
    if gen is None:
        raise FileNotFoundError(f"no published generation under {table_path}")
    src = os.path.join(table_path, f"gen-{gen}")
    n_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-n_bytes // (target_mb << 20)))
    df = spark.read.parquet(src).repartition(n_files)
    return write_generation(df, table_path, keep_generations=keep_generations)


def read_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written under an EVOLVING schema (columns added
    over time) as one frame: ``mergeSchema`` unions the file footers'
    schemas, older files surface NULL for later-added columns — the
    schema-drift posture a long-lived ingest directory needs (the
    reference's fixed DDL sidesteps drift by dropping unknown fields;
    a lake keeps them). Column RENAMES/type changes still need a
    migration rewrite — mergeSchema only handles additive drift."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
