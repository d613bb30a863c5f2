"""Shared percentile-routing helper — the 100 TB substitute for
global-sort ``ntile``.

Several operators need "assign every row to one of ``n`` equal-count
buckets": the equi-depth histogram (a23), RFM quartile scoring (a26),
the calibration-curve deciles (x_calibration), and the RP-tree median
splits (rptree_leaves). The engine-exact form is ``ntile(n)`` over a
global ``Window.orderBy`` — a single-task global sort, which is the
right AUDIT form (DuckDB replays it bit-for-bit) but a scale-killer on
a corpus-sized frame.

The scale form implemented here is the classic two-pass routing plan:

1. one partial-aggregable pass computes the ``n-1`` interior cut
   points with ``percentile_approx`` (Greenwald–Khanna sketch —
   map-side mergeable, bounded memory, no sort);
2. the bounded cuts frame (1 row, or |keys| rows for grouped
   bucketing) is broadcast back and every row is routed with a
   map-side comparison fold over the cut array — no shuffle of the
   data at all beyond the aggregation's partials.

Bucket semantics: bucket ``b`` (1-based) contains rows with
``cut[b-1] < v <= cut[b]`` (open below, closed above), matching the
side ``percentile_approx`` itself uses; ties on a cut value all land
in the lower bucket, where ``ntile`` would split them by the
tie-break id — the only systematic divergence between the two forms,
bounded by the tied mass at each cut (tolerance-tested in
``tests/test_bucketing.py``). NULL values route to a NULL bucket
(``ntile`` sorts them first; callers that care filter them first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_V = "__ab_v"
_C = "__ab_cuts"


def approx_cuts(
    df: DataFrame,
    col: str,
    n: int,
    keys: list[str] | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """The ``n-1`` interior cut points of ``col`` as one array column
    ``__ab_cuts`` — per ``keys`` group if given, else one global row.
    A bounded artifact (|keys| rows) meant to be broadcast."""
    probs = F.array(*[F.lit(i / n) for i in range(1, n)])
    agg = F.percentile_approx(F.col(col).cast("double"), probs, F.lit(accuracy)).alias(_C)
    return df.groupBy(*keys).agg(agg) if keys else df.agg(agg)


def approx_bucket(
    df: DataFrame,
    col: str,
    n: int,
    keys: list[str] | None = None,
    bucket_col: str = "bucket",
    descending: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Append an equal-count bucket id (1..``n``) for ``col`` to
    ``df`` — the map-side-routed scale form of
    ``ntile(n).over(Window.orderBy(col))`` (or ``orderBy(desc(col))``
    with ``descending=True``, bucket 1 = largest values).

    ``keys`` switches to per-group bucketing (the scale form of
    ``Window.partitionBy(*keys).orderBy(col)``); the per-group cuts
    frame is |keys|-sized and broadcast-joined, so this is only
    appropriate when the key cardinality is broadcastable — exactly
    the regime where the grouped ntile's per-key sort was the
    alternative.

    Plan shape: one hash-aggregate pass (GK sketch partials), one
    broadcast join, one map-side ``aggregate`` fold over the cut
    array. No global sort, no corpus shuffle.
    """
    val = F.col(col).cast("double")
    if descending:
        val = -val
    work = df.withColumn(_V, val)
    cuts = approx_cuts(work, _V, n, keys=keys, accuracy=accuracy)
    if keys:
        # null-safe key equality: approx_cuts' groupBy DOES produce a
        # NULL-key cuts group, and a plain left join would never match
        # it — silently handing every NULL-keyed row a NULL bucket
        renamed = cuts.select(
            *[F.col(k).alias(f"__ab_k{i}") for i, k in enumerate(keys)], _C
        )
        cond = F.lit(True)
        for i, k in enumerate(keys):
            cond = cond & F.col(k).eqNullSafe(F.col(f"__ab_k{i}"))
        joined = work.join(F.broadcast(renamed), cond, "left").drop(
            *[f"__ab_k{i}" for i in range(len(keys))]
        )
    else:
        joined = work.crossJoin(F.broadcast(cuts))
    fold = F.aggregate(
        F.col(_C),
        F.lit(1),
        lambda acc, c: acc + F.when(F.col(_V) > c, 1).otherwise(0),
    )
    bucket = F.when(F.col(_V).isNotNull(), fold)
    return joined.withColumn(bucket_col, bucket.cast("int")).drop(_V, _C)


def bucket_rank_audit(
    bucketed: DataFrame,
    col: str,
    n: int,
    bucket_col: str = "bucket",
    tol: float = 0.005,
    descending: bool = False,
) -> DataFrame:
    """Tie-robust rank audit of :func:`approx_bucket`'s routing — the
    driver-gate form of the scale path (the ``x_tdigest_quantiles``
    pattern: exact hash-checkable counts plus booleans that only fail
    on a real sketch regression).

    For each bucket ``b`` (full 1..``n`` spine — duplicate cut values
    under heavy ties legitimately yield EMPTY buckets), let ``cum(b)``
    be the rows routed to buckets ``<= b``, ``rmax(b)`` the running
    max routed value, and ``tmass(b)`` the tied mass AT ``rmax(b)``.
    Because routing is monotone and ties co-bucket,
    ``cum(b) = count(v <= cut_b)`` and ``cum(b) - tmass(b) =
    count(v < cut_b)`` exactly, so the Greenwald–Khanna guarantee
    (|rank(cut_b) − b·N/n| ≤ εN for a rank consistent with ties)
    becomes two one-sided checks that hold for ANY tie distribution::

        cum(b)            >= (b/n − tol)·N      -- rank_max side
        cum(b) − tmass(b) <= (b/n + tol)·N      -- rank_min side

    ``tol`` is floored at ``2/N`` (with N rows the achievable rank
    granularity is 1/N — small groups would otherwise fail on index
    conventions, not sketch health; the x_tdigest_quantiles floor).
    Returns one row per bucket: ``(bucket, n_total, rank_ok)`` with
    ``n_total`` the exact non-null row count (hash-checked by the
    oracle) — an ``n``-row frame, so the spine windows are bounded.
    """
    spark = bucketed.sparkSession
    v = F.col(col).cast("double")
    if descending:
        v = -v
    work = bucketed.filter(F.col(col).isNotNull()).select(
        v.alias("__v"), F.col(bucket_col).cast("int").alias("__b")
    )
    per = work.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__n"), F.max("__v").alias("__hi")
    )
    ties = (
        work.join(F.broadcast(per), "__b")
        .filter(F.col("__v") == F.col("__hi"))
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__t"))
    )
    stats = per.join(ties, "__b")
    spine = spark.range(1, n + 1).select(F.col("id").cast("int").alias("__sb"))
    joined = spine.join(
        F.broadcast(stats), F.col("__sb") == F.col("__b"), "left"
    )
    w = Window.orderBy("__sb").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("__sb").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = F.sum(F.coalesce(F.col("__n"), F.lit(0))).over(w)
    # the running max is always achieved at the LAST non-empty bucket
    # (routing is monotone), so its tied mass is that bucket's __t
    tmass = F.last("__t", ignorenulls=True).over(w)
    total = F.sum(F.coalesce(F.col("__n"), F.lit(0))).over(wall)
    # max(total, 1) only guards the tolerance division on an EMPTY
    # input (total = 0): the rank bounds themselves then read
    # 0 >= -tol*0 and 0 <= tol*0 — trivially TRUE, the right verdict
    # for auditing nothing
    eff_tol = F.greatest(
        F.lit(float(tol)),
        F.lit(2.0) / F.greatest(total, F.lit(1)).cast("double"),
    )
    frac = F.col("__sb").cast("double") / F.lit(float(n))
    rank_ok = (
        cum.cast("double") >= (frac - eff_tol) * total.cast("double")
    ) & (
        (cum - F.coalesce(tmass, F.lit(0))).cast("double")
        <= (frac + eff_tol) * total.cast("double")
    )
    return joined.select(
        F.col("__sb").alias(bucket_col),
        total.alias("n_total"),
        rank_ok.alias("rank_ok"),
    )
