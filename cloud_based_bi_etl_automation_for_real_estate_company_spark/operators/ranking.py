"""Exact distributed global ranking — the missing half of the scale
story around global order.

``operators/bucketing.approx_bucket`` replaces global-sort ``ntile``
when APPROXIMATE equal-count buckets are enough. This module covers
the cases that need the EXACT global ``row_number`` / dense rank (the
suffix-array construction in :mod:`.suffixes`, "rank every row of the
corpus" reports) without ever collapsing the corpus into one task the
way ``Window.orderBy`` with no partition key does.

The plan is the textbook two-phase ranking (the same decomposition
TeraSort / Spark's own ``sortByKey`` use for total order):

1. route every row to one of ``n_buckets`` value ranges via broadcast
   ``percentile_approx`` cut points (monotone in the order column, so
   bucket id is a coarse prefix of the total order) —
   :func:`..bucketing.approx_bucket`;
2. rank WITHIN each bucket with an ordinary partitioned window;
3. add each bucket's starting offset — the bucket sizes are a bounded
   (``n_buckets``-row) driver artifact, folded into a broadcast
   literal map.

Sketch error only skews bucket SIZES, never correctness: routing is
monotone and the within-bucket window re-sorts exactly, so the final
rank equals the single-task ``row_number`` bit-for-bit (differential-
tested in ``tests/test_ranking.py``; the suffix-array oracle replays
it corpus-wide through DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .bucketing import approx_bucket

_B = "__gr_b"


def global_row_number(
    df: DataFrame,
    order_col: str,
    tiebreaks: list[str] | tuple[str, ...] = (),
    rank_col: str = "rn",
    n_buckets: int | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """Exact 1-based global ``row_number`` over
    ``(order_col, *tiebreaks)`` ascending, NULL order values first —
    identical to ``row_number().over(Window.orderBy(...))`` but
    parallel: per-bucket windows plus a broadcast offset map instead
    of one global sort task. ``order_col`` must be numeric (castable
    to double for the range routing); callers with composite keys
    pack them into one value (the suffix-array rounds combine two
    ranks into ``r1*(R+1)+r2``). The only driver-side artifact is the
    ``n_buckets``-row size list.

    Skew note (stated, not hidden): routing is deterministic by
    VALUE, so every row tied on ``order_col`` lands in one bucket —
    required for correctness (ties must meet to be ordered by the
    tiebreaks), but a column where one value carries a large share of
    the corpus makes that bucket's window sort the bottleneck. The
    suffix-array consumer is safe by construction (tie mass shrinks
    geometrically per doubling round and the pack-w round 0 already
    splits most of it); a general caller with a 90%-constant column
    should pre-split by a secondary routed dimension — round-8
    backlog in NEXT.md."""
    spark = df.sparkSession
    n_buckets = n_buckets or spark.sparkContext.defaultParallelism
    b = approx_bucket(
        df, order_col, n_buckets, bucket_col=_B, accuracy=accuracy
    ).withColumn(_B, F.coalesce(F.col(_B), F.lit(0)))  # NULLs sort first
    sizes = {
        r[_B]: r["n"]
        for r in b.groupBy(_B).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for k in sorted(sizes):
        offsets[k] = acc
        acc += sizes[k]
    omap = F.create_map(
        *[x for k, v in offsets.items() for x in (F.lit(k), F.lit(v))]
    ) if offsets else F.create_map()
    w = Window.partitionBy(_B).orderBy(
        F.col(order_col).asc_nulls_first(), *[F.col(c) for c in tiebreaks]
    )
    return b.withColumn(
        rank_col,
        (F.element_at(omap, F.col(_B)) + F.row_number().over(w)).cast("bigint"),
    ).drop(_B)


def global_dense_rank(
    df: DataFrame,
    order_col: str,
    rank_col: str = "rank",
    n_buckets: int | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """Exact global ``dense_rank`` over ``order_col`` ascending: rank
    the DISTINCT values (a keyed shuffle + :func:`global_row_number`
    over the much smaller distinct set), then join back on the value
    (null-safely — a NULL order value is a rankable key of its own,
    sorting first, exactly like ``dense_rank`` over
    ``asc_nulls_first``). Equal values share a rank; ranks are dense
    1..n_distinct — the re-ranking primitive of each suffix-array
    doubling round."""
    keys = df.select(F.col(order_col).alias("__dr_k")).distinct()
    ranked = global_row_number(
        keys, "__dr_k", rank_col=rank_col, n_buckets=n_buckets, accuracy=accuracy
    )
    return df.join(
        ranked, F.col(order_col).eqNullSafe(F.col("__dr_k"))
    ).drop("__dr_k")
