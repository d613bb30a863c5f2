"""Bucketed storage for co-located joins — the physical-layout lever
that removes the per-query shuffle from repeated fact⋈fact joins.

A 100 TB lineitem⋈orders on orderkey shuffles both sides every query.
Bucketing both tables by the join key at write time pre-partitions the
data once: Spark's bucketed scan exposes the hash distribution, the
join planner sees compatible partitioning on both sides, and the
Exchange disappears (asserted in tests/test_bucketing.py).

Trade-offs at scale: pick bucket counts so each bucket is
O(100 MB–1 GB); both sides need the same bucket count (or a
multiple, with spark.sql.bucketing.coalesceBucketsInJoin.enabled);
writes pay one shuffle up front to amortize over every later join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Sorting within buckets additionally enables merge-join without a
    per-query sort."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — shuffle-free
    when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), list(on))
