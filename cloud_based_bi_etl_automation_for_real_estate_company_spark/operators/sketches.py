"""Mergeable distinct-count sketch rollups (Apache DataSketches HLL,
via Spark's ``hll_sketch_agg`` / ``hll_union_agg`` built-ins).

The 100 TB pattern these exist for: materialize a per-(day, slice)
sketch table ONCE (one pass over the facts), then answer any distinct
count over any slice combination by UNIONING sketches — kilobytes
merged instead of facts re-scanned. Distinct counting is the one
aggregate that cannot be partially aggregated exactly (sums/counts
merge; sets don't), which is exactly what the sketch's mergeability
buys back, at a bounded relative error (~1.6% at lgK=12).

Both stages are single hash-agg shuffles with map-side partial
aggregation of the sketches themselves. The sketch column is opaque
binary — engine-specific, so these register rows-only with the
driver gate (no ANSI-SQL replay); accuracy and merge-consistency are
pinned in tests/test_scale_paths.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch_rollup(
    df: DataFrame, keys: list[str], col: str, lgk: int = 12
) -> DataFrame:
    """One pass over the facts → per-key HLL sketch + its estimate.
    Returns (*keys, sketch binary, approx_distinct bigint). Persist
    the sketch column; it is the mergeable artifact."""
    return (
        df.groupBy(*keys)
        .agg(F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("sketch"))
        .withColumn("approx_distinct", F.hll_sketch_estimate(F.col("sketch")))
    )


def merge_distinct_sketches(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Union pre-built sketches up to a coarser grain (or to a single
    global row when ``group_cols`` is empty/None) — the facts are
    never re-read. Returns (*group_cols, approx_distinct bigint)."""
    gb = sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    return gb.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
            "approx_distinct"
        )
    )
