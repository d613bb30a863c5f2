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

from pyspark.sql import DataFrame, Window
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


# --- KMV (k-minimum-values) theta sketches -------------------------------
#
# The HLL rollups above are opaque binary (rows-only with the gate);
# the KMV family below is the ENGINE-PORTABLE theta sketch (Bar-Yossef
# et al. 2002; the basis of DataSketches Theta): keep the k smallest
# deterministic hash fractions of the distinct keys. Every step is
# relational — md5, a rank-filtered window, one aggregate — so a SQL
# oracle replays it bit-for-bit, AND (unlike HLL) the sketches support
# set ALGEBRA: union (merge + re-truncate) and intersection (count
# common hashes below the joint theta), which is how 100 TB overlap
# questions ("distinct users in BOTH funnels") get answered from
# kilobyte artifacts instead of fact re-scans.


def _hash_frac(col: str):
    """Deterministic uniform [0,1) fraction of a key: the first 8 hex
    chars of md5 over 2^32 — identical arithmetic in Spark and the
    DuckDB oracle."""
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10
    ).cast("double") / F.lit(4294967296.0)


def kmv_kept(df: DataFrame, keys: list[str], col: str, k: int = 128) -> DataFrame:
    """The retained set of a per-group KMV sketch: the k smallest
    distinct hash fractions of ``col`` within each key group. One
    distinct-agg shuffle, then a rank-filtered window Spark executes
    as a map-side WindowGroupLimit — each task forwards only its local
    k minima, so the exchange carries O(groups·k) rows. Returns
    (*keys, u) — the mergeable artifact the estimate/set-op functions
    consume."""
    hashed = df.select(*keys, _hash_frac(col).alias("u")).distinct()
    w = Window.partitionBy(*keys).orderBy("u")
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(kept: DataFrame, keys: list[str], k: int = 128) -> DataFrame:
    """Distinct-count estimate from a retained set: exact when the
    group held fewer than k distinct keys (the sketch IS the set),
    else the unbiased KMV estimator (k-1)/u_(k). Returns (*keys,
    n_kept, theta, estimate)."""
    return kmv_stats(kept.groupBy(*keys), k)


def kmv_stats(grouped, k: int):
    """Shared estimate aggregate over a grouped retained set."""
    return grouped.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("u").alias("theta"),
        F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.max("u"))
        .alias("estimate"),
    )


def kmv_union(
    kept_a: DataFrame, kept_b: DataFrame, k: int = 128
) -> DataFrame:
    """Union cardinality from two single-group retained sets: merge,
    dedupe, re-truncate to the k smallest, re-estimate — the theta
    union. Input frames carry just (u). Returns one row (n_kept,
    theta, estimate)."""
    merged = kept_a.select("u").union(kept_b.select("u")).distinct()
    w = Window.orderBy("u")
    kept = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    return kmv_stats(kept.groupBy(), k)


def kmv_intersect(
    kept_a: DataFrame, kept_b: DataFrame, k: int = 128
) -> DataFrame:
    """Intersection cardinality (theta intersection): joint theta =
    min of the two sketch thetas (1.0 for a non-full sketch — it saw
    everything), count the hashes retained by BOTH below it, estimate
    = |common<θ| / θ. Returns one row (n_common, theta, estimate)."""
    def theta_of(kept: DataFrame):
        return kept.agg(
            F.when(F.count(F.lit(1)) < k, F.lit(1.0))
            .otherwise(F.max("u"))
            .alias("th")
        )

    thetas = theta_of(kept_a).join(theta_of(kept_b).withColumnRenamed("th", "th_b"))
    joint = thetas.select(F.least("th", "th_b").alias("theta"))
    common = kept_a.select("u").join(kept_b.select("u"), "u")
    return (
        common.join(F.broadcast(joint))
        .filter(F.col("u") < F.col("theta"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.min("theta").alias("theta"),
            (F.count(F.lit(1)) / F.min("theta")).alias("estimate"),
        )
    )


# --- Count-min sketch ----------------------------------------------------


def cms_build(
    occurrences: DataFrame, term_col: str = "term", d: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over a stream
    of term occurrences: d hash rows × width buckets of ADDITIVE
    counters — the frequency-estimation sibling of the cardinality
    sketches above, and like KMV it is engine-portable (md5 buckets →
    the oracle replays it exactly). Counters are sums, so sketches
    merge by cell-wise addition: per-partition partial aggregation is
    the merge, and day-level sketch tables roll up by the same
    groupBy — frequency questions at 100 TB from d·width-row
    artifacts.

    One exploded pass (d rows per occurrence) into one hash-agg.
    Returns (i, bucket, cnt), at most d·width rows.
    """
    hashed = occurrences.select(
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i"),
        F.col(term_col).alias("__t"),
    ).select(
        "i",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("__t"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(width),
        ).alias("bucket"),
    )
    return hashed.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    cms: DataFrame, terms: DataFrame, term_col: str = "term", d: int = 4, width: int = 256
) -> DataFrame:
    """Point-query the sketch: a term's estimate is the MIN of its d
    counters — an overestimate by construction (collisions only add),
    within εN with probability 1−δ for d=ln(1/δ), width=e/ε. The
    sketch is d·width rows → broadcast; per-term work is a map-side
    hash + one tiny join. Returns (*terms.columns, cms_count)."""
    probes = terms.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i")
    ).withColumn(
        "bucket",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("i").cast("string"), F.lit(":"), F.col(term_col))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(width),
        ),
    )
    return (
        probes.join(F.broadcast(cms), ["i", "bucket"])
        .groupBy(*terms.columns)
        .agg(F.min("cnt").alias("cms_count"))
    )


def dd_buckets(
    df: DataFrame,
    keys: list[str],
    col: str = "value",
    alpha: float = 0.01,
) -> DataFrame:
    """DDSketch bucket table (Masson et al., VLDB 2019): log-spaced
    buckets b = ceil(ln(x)/ln(γ)) with γ = (1+α)/(1−α) guarantee every
    quantile estimate is within relative error α. The bucket table is
    the SKETCH — per-key counts over ~log_γ(max/min) buckets (a few
    hundred for any realistic domain), exactly mergeable by adding
    counts, streamable as an incremental state table. The log ratio is
    rounded at 9 dp before ceil so both engines (and any future
    re-bucketing of merged partials) agree on boundary values.
    Requires x > 0 (shift or reserve a zero bucket upstream)."""
    g = (1.0 + float(alpha)) / (1.0 - float(alpha))
    b = F.ceil(F.round(F.log(F.col(col)) / F.log(F.lit(g)), 9))
    return (
        df.select(*keys, b.alias("bucket"))
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dd_quantiles(
    buckets: DataFrame,
    keys: list[str],
    qs: list[float],
    alpha: float = 0.01,
) -> DataFrame:
    """Quantile estimates from a DDSketch bucket table: per key, the
    q-quantile lives in the smallest bucket whose cumulative count
    reaches ceil(q·n) (n = total count), and the estimate is the
    bucket's log-midpoint 2γ^b/(γ+1) — within α relative error of the
    true quantile by construction. One per-key cumulative window over
    the bucket-sized sketch (never the raw data) computes every
    requested quantile in a single pass. Returns
    (keys..., q, est)."""
    from pyspark.sql import Window

    g = (1.0 + float(alpha)) / (1.0 - float(alpha))
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wk = Window.partitionBy(*keys)
    cum = buckets.select(
        *keys,
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wk).alias("n"),
    )
    est = (
        F.lit(2.0)
        * F.pow(F.lit(g), F.col("bucket").cast("double"))
        / F.lit(g + 1.0)
    )
    # one pass for ALL quantiles: explode the q literals against the
    # bucket-sized cum table and take min-bucket per (keys, q) — the
    # same shape as the oracle's CROSS JOIN + GROUP BY
    qlit = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    hit = (
        cum.select(*keys, "bucket", "cum", "n", qlit)
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy(*keys, "q")
        .agg(F.min("bucket").alias("bucket"))
    )
    return hit.select(*keys, "q", est.alias("est"))


# --- t-digest (Dunning & Ertl, arXiv:1902.04023) --------------------------
#
# The rank-adaptive sibling of DDSketch above: DDSketch guarantees
# RELATIVE-VALUE error from fixed log buckets, the t-digest guarantees
# RANK-space accuracy (tight at the tails, looser in the middle) from
# data-adaptive centroids bounded by the k1 scale function. Mergeable:
# a digest is just a (mean, weight) table, and merging digests is the
# same clustering applied to the union — which is exactly the two-stage
# Spark shape below (per-shard digest -> union -> re-cluster). The
# centroid tables are O(delta) rows per key regardless of input size,
# so the second stage is a bounded-size group no matter the corpus.
#
# Cluster assignment uses the one-pass k-space binning variant: sort,
# take each element's centre rank q, bin by floor(k1(q)) with
# k1(q) = delta/(2*pi)*asin(2q-1). This is fully vectorized (no
# sequential accumulation loop) and deterministic under a total sort
# order; the capacity bound holds for cluster CENTRES (edges can
# overhang a unit k-interval slightly), which preserves the t-digest
# accuracy asymptotics — the rank-error tolerance is what tests pin.


def _tdigest_cluster(means, weights, delta: int):
    import numpy as np

    order = np.lexsort((weights, means))
    m = means[order].astype(float)
    w = weights[order].astype(float)
    total = w.sum()
    cum = np.cumsum(w)
    qc = (cum - w / 2.0) / total
    kk = np.floor(delta / (2.0 * np.pi) * np.arcsin(2.0 * qc - 1.0))
    starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
    ws = np.add.reduceat(w, starts)
    wm = np.add.reduceat(m * w, starts)
    return wm / ws, ws


def _cluster_grouped(
    df: DataFrame, keys: list[str], val_col: str, w_col: str, delta: int
) -> DataFrame:
    """JVM-side k-space binning (the same variant `_tdigest_cluster`
    runs in numpy for the streaming state op, re-expressed as one
    partitioned running-sum window + one hash aggregate so the batch
    path never leaves whole-stage codegen — the round-8 change that
    removed ~3 s of Arrow/Python overhead from the t17 bench leg).
    Within each ``keys`` group: sort by (value, weight), take each
    point's centre rank qc, bin by floor(delta/(2π)·asin(2qc−1)),
    then one weighted-mean aggregate per bin. Tie permutations can't
    change the result (equal values share a value, so only the COUNT
    per bin matters, which cumulative positions fix), keeping the
    build bit-deterministic under any Spark partitioning. The window
    partitions on the full ``keys`` (callers bound group size via the
    value-hash shard key), never a global sort."""
    import math

    part = [F.col(k) for k in keys] if keys else [F.lit(1)]
    order = Window.partitionBy(*part).orderBy(val_col, w_col)
    wseq = order.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy(*part)
    cum = F.sum(w_col).over(wseq)
    total = F.sum(w_col).over(wall)
    qc = (cum - F.col(w_col) / F.lit(2.0)) / total
    kk = F.floor(
        F.lit(delta / (2.0 * math.pi)) * F.asin(F.lit(2.0) * qc - F.lit(1.0))
    )
    return (
        df.withColumn("__td_kk", kk)
        .groupBy(*keys, "__td_kk")
        .agg(
            (
                F.sum(F.col(val_col) * F.col(w_col)) / F.sum(w_col)
            ).alias("__td_mean"),
            F.sum(w_col).alias("weight"),
        )
        .select(*keys, F.col("__td_mean").alias("mean"), "weight")
    )


def tdigest_centroids(
    df: DataFrame,
    keys: list[str],
    col: str,
    delta: int = 100,
    n_shards: int = 32,
) -> DataFrame:
    """Two-stage distributed t-digest build: values shard by value
    hash (equal values stay together, keeping tie handling exact and
    the assignment deterministic regardless of Spark partitioning —
    a constant column would hot-spot one shard, at which point the
    digest is trivial anyway), each (key, shard) group digests its
    values with the k-space clustering, and stage 2 re-clusters the
    unioned per-shard centroids — O(n_shards * delta) rows per key —
    into the final per-key digest. Both stages run JVM-side
    (`_cluster_grouped`); the shard key bounds every window sort to
    ~1/n_shards of a key's rows. NULL values are dropped up front —
    the same skip-null semantics as ``percentile_approx`` /
    ``approx_bucket`` — because without the filter a null row adds
    to F.sum(w) in `_cluster_grouped` yet vanishes from the
    weighted-mean numerator, silently deflating every quantile. A
    group that is all-NULL yields zero centroid rows, hence zero
    quantile rows downstream. Returns (*keys, mean, weight)."""
    shard = F.pmod(F.xxhash64(F.col(col)), F.lit(n_shards)).alias("__td_shard")
    fine = _cluster_grouped(
        df.filter(F.col(col).isNotNull())
        .select(*keys, F.col(col), shard)
        .withColumn(
            "__td_w", F.lit(1.0)
        ),
        [*keys, "__td_shard"],
        col,
        "__td_w",
        delta,
    )
    return tdigest_merge(fine.select(*keys, "mean", "weight"), keys, delta)


def tdigest_merge(
    centroids: DataFrame, keys: list[str], delta: int = 100
) -> DataFrame:
    """Merge/ROLL UP a centroid table to coarser keys by re-clustering
    centroids as weighted points — the t-digest's mergeability made a
    public operator (the quantile sibling of the HLL rollup story):
    build per-(key, day) digests ONCE, then answer any coarser slice
    — per-key, per-month, global — from the kilobyte sketch table
    with no fact re-scan. Also stage 2 of the distributed build, so
    rollup and build can never disagree on merge semantics. The
    centroid table is O(delta)-per-key-sized, so the unpartitioned
    window in the keys=[] global-rollup form is bounded. NULL-mean
    rows are dropped before clustering: `tdigest_centroids` never
    emits them (it filters null values up front), so one here means a
    hand-built or corrupted centroid table — skipping matches the
    build path's null semantics rather than letting a null mean
    poison the weighted average of its whole bin. Returns
    (*keys, mean, weight)."""
    return _cluster_grouped(
        centroids.filter(F.col("mean").isNotNull()),
        keys,
        "mean",
        "weight",
        delta,
    )


def _tdigest_quantile_rows(m, w, qs):
    """Interpolate quantile estimates over a centroid set (midpoint
    ranks, clamped at the extreme centroids) — THE single copy of the
    t-digest query half, shared by batch ``tdigest_quantiles``, the
    streaming state op, and the batch drain so tie handling or
    clamping fixes can never diverge between runtimes."""
    import numpy as np

    order = np.lexsort((w, m))
    ms, ws = m[order], w[order]
    cum = np.cumsum(ws)
    mid = cum - ws / 2.0
    qa = np.array(qs, dtype=float)
    est = (
        np.interp(qa * ws.sum(), mid, ms)
        if len(ms)
        else np.full(len(qa), np.nan)
    )
    return qa, est, len(ms)


def tdigest_quantiles(
    centroids: DataFrame, keys: list[str], qs: list[float]
) -> DataFrame:
    """Quantile estimates from a centroid table: linear interpolation
    of the target rank over centroid midpoint ranks (the standard
    t-digest query, clamped at the extreme centroids — the same
    semantics `_tdigest_quantile_rows` runs in numpy for the streaming
    drain). JVM-side: midpoint ranks are a running-sum window over the
    O(delta)-per-key centroid table, each target rank q·W picks its
    single bracketing centroid pair by filter (midpoints STRICTLY
    increase — consecutive mids differ by (w_i+w_{i+1})/2 > 0 — so
    exactly one row survives per (key, q)), then one projection
    interpolates. Returns (*keys, q, est)."""
    part = [F.col(k) for k in keys] if keys else [F.lit(1)]
    order = Window.partitionBy(*part).orderBy("mean", "weight")
    wseq = order.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy(*part)
    c = centroids.select(
        *keys,
        "mean",
        (F.sum("weight").over(wseq) - F.col("weight") / F.lit(2.0)).alias(
            "__mid"
        ),
        F.sum("weight").over(wall).alias("__w_tot"),
        F.row_number().over(order).alias("__rn"),
        F.lead("mean").over(order).alias("__next_mean"),
        (
            F.lead(
                F.sum("weight").over(wseq) - F.col("weight") / F.lit(2.0)
            ).over(order)
        ).alias("__next_mid"),
    )
    qd = c.select(
        "*", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    ).withColumn("__tgt", F.col("q") * F.col("__w_tot"))
    picked = qd.filter(
        (
            (F.col("__mid") <= F.col("__tgt"))
            & (
                F.col("__next_mid").isNull()
                | (F.col("__tgt") < F.col("__next_mid"))
            )
        )
        | ((F.col("__rn") == 1) & (F.col("__tgt") < F.col("__mid")))
    )
    est = (
        F.when(F.col("__tgt") < F.col("__mid"), F.col("mean"))  # low clamp
        .when(F.col("__next_mid").isNull(), F.col("mean"))  # high clamp
        .otherwise(
            F.col("mean")
            + (F.col("__tgt") - F.col("__mid"))
            / (F.col("__next_mid") - F.col("__mid"))
            * (F.col("__next_mean") - F.col("mean"))
        )
    )
    return picked.select(*keys, "q", est.alias("est"))
