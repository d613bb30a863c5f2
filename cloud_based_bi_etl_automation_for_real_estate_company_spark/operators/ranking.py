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

1. route every row to one of ``n_buckets`` value ranges against
   ``percentile_approx`` cut points COLLECTED once and baked in as
   literals (monotone in the order column, so bucket id is a coarse
   prefix of the total order; literals, not a lazy subtree, because
   the offset job and the output job must route identically — a
   re-evaluated quantile sketch is not deterministic across jobs);
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
from pyspark.sql import types as T

_B = "__gr_b"

# Largest integer exactly representable as a double; an order column
# whose integral values exceed this can alias under the double cast
# used for bucket routing. Harmless with tie_split=False (aliased
# values share a bucket and the window re-sorts exactly) but fatal
# with tie_split=True (aliased values may route by TIEBREAK into
# different buckets while the window orders by the exact values).
_DOUBLE_EXACT_INT = 1 << 53


def global_row_number(
    df: DataFrame,
    order_col: str,
    tiebreaks: list[str] | tuple[str, ...] = (),
    rank_col: str = "rn",
    n_buckets: int | None = None,
    accuracy: int = 10000,
    tie_split: bool = False,
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

    Skew note (stated, not hidden): with ``tie_split=False`` routing
    is deterministic by VALUE, so every row tied on ``order_col``
    lands in one bucket — a column where one value carries a large
    share of the corpus makes that bucket's window sort the
    bottleneck. ``tie_split=True`` fixes exactly that: the cut list
    is collected (bounded, n_buckets-1 rows) and any value spanning
    ≥ 2 cut positions — the quantile sketch's free heavy-value
    detector — gets its cut positions REFINED with that value's own
    quantiles of ``tiebreaks[0]`` (one grouped percentile pass over
    the heavy values only, also bounded); routing then compares
    ``(value, tiebreak)`` lexicographically against composite cut
    points, so a 90%-constant column spreads across its quantile
    share of buckets while ranks stay EXACT (ties on the full
    composite still colocate; one refinement level — a corpus tied
    on BOTH columns for most rows would need the next tiebreak).
    Requires a numeric first tiebreak; NULL tiebreaks route as -inf
    (matching the window's nulls-first order). The suffix-array
    consumer keeps the default (tie mass shrinks geometrically per
    doubling round; pack-w round 0 splits most of it).

    Precision bound (``tie_split=True`` only): composite routing
    compares DOUBLE-cast order values, so two distinct integers above
    2^53 that collapse to the same double could route by tiebreak into
    different buckets while the window orders them by the exact
    original values — breaking exactness. Integral order columns are
    therefore range-checked (|v| < 2^53, one extra max-abs in the
    existing cuts aggregate — raises loudly) and decimal columns with
    precision > 15 are rejected up front. ``tie_split=False`` needs no
    bound: routing there is monotone under double collapse (aliased
    values co-bucket and the window re-sorts them exactly)."""
    spark = df.sparkSession
    n_buckets = n_buckets or spark.sparkContext.defaultParallelism
    if tie_split and not tiebreaks:
        raise ValueError("tie_split=True requires a numeric tiebreak")
    # cut points are COLLECTED and routed as literals in both paths:
    # the offset-map job and the output job must route identically,
    # and a lazily re-evaluated percentile sketch is not guaranteed
    # deterministic across jobs on a cluster (partial-merge order) —
    # literal cuts make routing a pure function of the row
    b = _composite_bucket(
        df, order_col, tiebreaks[0] if tie_split else None, n_buckets, accuracy
    )
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


def _composite_bucket(
    df: DataFrame,
    order_col: str,
    tb_col: str | None,
    n_buckets: int,
    accuracy: int,
) -> DataFrame:
    """Literal-cut routing for :func:`global_row_number`: collect the
    order-column cuts once (bounded, n_buckets-1 values) and route
    every row against them as pure literals — deterministic across
    jobs by construction. With ``tb_col`` set (tie_split), equal cut
    runs (= heavy values) are refined with per-value tiebreak
    quantiles and routing compares ``(value, tiebreak)``
    lexicographically. All driver artifacts are ≤ n_buckets-1 rows."""
    v = F.col(order_col).cast("double")
    tb = (
        F.coalesce(F.col(tb_col).cast("double"), F.lit(float("-inf")))
        if tb_col is not None
        else F.lit(float("-inf"))
    )
    check_range = False
    if tb_col is not None:
        try:
            dt = df.schema[order_col].dataType
        except Exception:
            dt = None
        if isinstance(dt, T.DecimalType) and dt.precision > 15:
            raise ValueError(
                "tie_split=True routes on double-cast order values; "
                f"decimal({dt.precision},{dt.scale}) can alias above 15 "
                "significant digits, which would break rank exactness. "
                "Cast the order column down or use tie_split=False."
            )
        # only LongType can hold integers >= 2^53 (int/short/byte max
        # out below it; float/double casts are injective widenings)
        check_range = isinstance(dt, T.LongType)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    aggs = [
        F.percentile_approx(
            v, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("__cuts")
    ]
    if check_range:
        aggs.append(F.max(F.abs(F.col(order_col))).alias("__maxabs"))
    row0 = df.agg(*aggs).collect()[0]
    if check_range and (row0["__maxabs"] or 0) >= _DOUBLE_EXACT_INT:
        raise ValueError(
            "tie_split=True routes on double-cast order values; "
            f"|{order_col}| reaches {row0['__maxabs']} >= 2^53, where "
            "distinct integers alias as doubles and composite routing "
            "would break rank exactness. Use tie_split=False."
        )
    cuts = list(row0["__cuts"] or [])
    runs: dict[float, int] = {}
    for c in cuts:
        if c is not None:
            runs[c] = runs.get(c, 0) + 1
    heavy = (
        sorted(c for c, m in runs.items() if m >= 2) if tb_col is not None else []
    )
    tb_cuts: dict[float, list[float]] = {}
    if heavy:
        m_by_v = {c: runs[c] for c in heavy}
        hv = df.filter(v.isin(heavy)).select(
            v.alias("__hv"), tb.alias("__htb")
        )
        # per heavy value: its multiplicity m = number of cut slots it
        # occupies; refine with that value's own m-quantile tiebreaks
        maxm = max(m_by_v.values())
        grouped = hv.groupBy("__hv").agg(
            F.percentile_approx(
                F.col("__htb"),
                F.array(*[F.lit(j / (maxm + 1)) for j in range(1, maxm + 1)]),
                F.lit(accuracy),
            ).alias("__tcuts")
        ).collect()
        for r in grouped:
            m = m_by_v[r["__hv"]]
            full = list(r["__tcuts"] or [])
            # take m evenly-spaced refinements from the maxm computed
            step = max(1, len(full) // (m + 1)) if full else 1
            picks = [full[min(len(full) - 1, (j + 1) * step - 1)]
                     for j in range(m)] if full else [float("inf")] * m
            tb_cuts[r["__hv"]] = picks
    inf = float("inf")
    composite: list[tuple[float, float]] = []
    used: dict[float, int] = {}
    for c in cuts:
        if c is None:
            continue
        if c in tb_cuts:
            i = used.get(c, 0)
            used[c] = i + 1
            t = tb_cuts[c][i] if i < len(tb_cuts[c]) else inf
            composite.append((float(c), float(t) if t is not None else inf))
        else:
            composite.append((float(c), inf))
    cutarr = F.array(*[
        F.struct(
            F.lit(cv).cast("double").alias("cv"),
            F.lit(ct).cast("double").alias("ct"),
        )
        for cv, ct in composite
    ])
    work = df.withColumn("__cs_v", v).withColumn("__cs_t", tb)
    if composite:
        fold = F.aggregate(
            cutarr,
            F.lit(1),
            lambda acc, c: acc
            + F.when(
                (F.col("__cs_v") > c["cv"])
                | ((F.col("__cs_v") == c["cv"]) & (F.col("__cs_t") > c["ct"])),
                1,
            ).otherwise(0),
        )
    else:
        fold = F.lit(1)
    bucket = F.when(F.col("__cs_v").isNotNull(), fold).otherwise(F.lit(0))
    return work.withColumn(_B, bucket.cast("int")).drop("__cs_v", "__cs_t")


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


def global_dense_rank_pair(
    df: DataFrame,
    col1: str,
    col2: str,
    rank_col: str = "rank",
    n_buckets: int | None = None,
    accuracy: int = 10000,
    tie_split: bool = True,
) -> DataFrame:
    """Exact global ``dense_rank`` over the ``(col1, col2)`` PAIR
    ascending, NULLs first in each component — the overflow-safe form
    of packing two ranks into one bigint ``r1*(R+1)+r2``, which wraps
    silently (ANSI off) once ``R+1`` exceeds floor(sqrt(2^63)) ≈
    3.04e9. Rank the DISTINCT pairs with :func:`global_row_number`
    (bucket-routed on ``col1``, within-bucket window ordered by the
    exact pair), then join back null-safely on both columns. The
    NULLs-first component order matches ``coalesce(r2, 0)`` packing
    when real ranks start at 1 — the suffix-array doubling round's
    contract (:mod:`.suffixes` switches to this path automatically
    above the pack-safe bound).

    ``tie_split`` defaults to True (unlike the scalar entry points):
    this path only activates above ~3e9 positions, where a
    low-cardinality ``col1`` — an early doubling round's rank column
    — could concentrate billions of distinct ``(col1, col2)`` pairs
    tied on one heavy ``col1`` value into a single window task, the
    exact single-task-sort regime this module exists to avoid.
    tie_split refines the heavy values' cuts by ``col2`` quantiles
    (bigint in the suffix consumer), so they spread across buckets
    while ranks stay exact. Requires a numeric ``col2``; pass
    ``tie_split=False`` for a non-numeric pair component and accept
    the documented one-bucket-per-heavy-``col1``-value bound."""
    keys = df.select(
        F.col(col1).alias("__dr_k1"), F.col(col2).alias("__dr_k2")
    ).distinct()
    ranked = global_row_number(
        keys,
        "__dr_k1",
        tiebreaks=["__dr_k2"],
        rank_col=rank_col,
        n_buckets=n_buckets,
        accuracy=accuracy,
        tie_split=tie_split,
    )
    return df.join(
        ranked,
        F.col(col1).eqNullSafe(F.col("__dr_k1"))
        & F.col(col2).eqNullSafe(F.col("__dr_k2")),
    ).drop("__dr_k1", "__dr_k2")


def sorted_write(
    df: DataFrame,
    order_col: str,
    path: str,
    tiebreaks: list[str] | tuple[str, ...] = (),
    n_files: int | None = None,
    accuracy: int = 10000,
    tie_split: bool = False,
    mode: str = "overwrite",
    drop_order_col: bool = False,
) -> None:
    """Globally-sorted parquet write — the TeraSort layout as a sink:
    output files tile the ``order_col`` range (file i's max ≤ file
    i+1's min), so a range predicate prunes to O(1) files via the
    :mod:`.layout` min/max manifest, and every file is internally
    sorted (tight parquet row-group stats for row-level skipping).

    The total order reuses :func:`_composite_bucket`'s LITERAL cut
    points (this module's ranking primitive) instead of ``df.sort``'s
    internal range sampler: VALUE→bucket routing is a pure
    deterministic function of the row (the range partitioner under it
    only ever merges ADJACENT buckets, never reorders or splits one),
    and the same ``tie_split`` heavy-value refinement is available
    when one value carries a large share of the corpus. The bucket id is
    monotone in ``(order_col, tiebreaks)``, so range-repartitioning
    on it (a bounded int key — the sampler sees n_files distinct
    values, and equal keys never straddle partitions) puts adjacent
    value ranges in order-preserving partitions; the within-partition
    sort then yields a globally sorted file sequence.

    With ``tie_split=True`` a heavy value legitimately spans adjacent
    files (split by tiebreak quantiles): file min/max intervals then
    OVERLAP at exactly that value — manifest pruning stays correct
    (interval intersection), only the disjoint-tiling property is
    relaxed. NULL order values route to the first file, matching
    ``asc_nulls_first``. ``drop_order_col=True`` projects the order
    column away AFTER the sort (for synthetic keys — the row order
    survives the projection): the written files are then ordered by a
    column they don't contain, which is :func:`shuffled_write`'s
    contract."""
    spark = df.sparkSession
    n_files = n_files or spark.sparkContext.defaultParallelism
    if tie_split and not tiebreaks:
        raise ValueError("tie_split=True requires a numeric tiebreak")
    b = _composite_bucket(
        df, order_col, tiebreaks[0] if tie_split else None, n_files, accuracy
    )
    out = b.repartitionByRange(n_files, _B).sortWithinPartitions(
        F.col(order_col).asc_nulls_first(), *[F.col(c) for c in tiebreaks]
    ).drop(_B)
    if drop_order_col:
        out = out.drop(order_col)
    out.write.mode(mode).parquet(path)


def shuffled_write(
    df: DataFrame,
    id_col: str,
    path: str,
    seed: int = 0,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Deterministic global corpus shuffle as a sink — the "shuffle
    the training data" step every LLM pipeline runs before packing:
    rows are written in the total order of ``xxhash64(id_col, seed)``,
    a pseudo-random permutation that is (a) DETERMINISTIC — re-runs
    and reshards produce the identical global row sequence when files
    are read in part order (boundaries may merge adjacent ranges, the
    sequence cannot change), so a training run is reproducible from
    (corpus, seed) alone, (b) seed-switchable for
    epoch reshuffles without re-reading anything but the corpus, and
    (c) free of source locality — adjacent input documents (same
    crawl, same domain, same shard) land ~uniformly far apart, which
    is the point: gradient batches see decorrelated samples.

    Implementation is one :func:`sorted_write` over the hash key
    (bucket-routed range partition + within-partition sort — no
    single-task global sort), with the id as tiebreak so hash
    collisions stay deterministic. The hash key column itself is not
    written."""
    key = F.xxhash64(F.col(id_col), F.lit(seed))
    work = df.withColumn("__shuffle_key", key)
    sorted_write(
        work,
        "__shuffle_key",
        path,
        tiebreaks=[id_col],
        n_files=n_files,
        mode=mode,
        drop_order_col=True,
    )
