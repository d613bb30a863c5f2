"""Multi-dimensional data layout: Z-order (Morton) clustering.

A sort on ONE column gives perfect parquet min/max pruning on that
column and none on any other. Interleaving the bits of two (or more)
normalized key columns into a single Morton key and range-partitioning
+ sorting the write on it gives every file a small hyper-rectangle of
the key space — so row-group statistics prune scans filtered on ANY of
the clustered columns (the technique behind Delta/Databricks OPTIMIZE
ZORDER and Hudi/Iceberg z-curves).

All pure column arithmetic (bit picks and shifted adds — no UDFs), so
the key computation fuses into the write scan; the only data movement
is the range repartition that any clustered write needs anyway. At
100 TB the win is directly proportional to files skipped: a 2-D
z-order over (customer, date) turns a full-table scan for either
predicate into a ~sqrt-fraction file subset.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale_to_bits(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Affine-map ``col`` from [lo, hi] into the integer grid
    [0, 2^bits): the per-dimension quantization Morton interleaving
    needs. Values outside the range clamp to the grid edge (layout
    keys must never be NULL or out of range; NULL maps to 0)."""
    top = (1 << bits) - 1
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit((float(hi) - float(lo)) or 1.0)
        * F.lit(float(top) + 1.0)
    )
    return F.coalesce(
        F.least(F.greatest(scaled, F.lit(0)), F.lit(top)), F.lit(0)
    ).cast("bigint")


def interleave_bits(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton key: bit j of column i lands at position
    j * n_cols + i. Built as a balanced sum of shifted bit picks —
    ~bits × n_cols arithmetic ops, constant-folded into one projection
    (no loop at runtime, no UDF). Columns must already be integers in
    [0, 2^bits), e.g. from :func:`scale_to_bits`."""
    terms = []
    n = len(cols)
    for i, c in enumerate(cols):
        for j in range(bits):
            # ((c >> j) & 1) << (j * n + i), via exact arithmetic
            bit = F.pmod(F.floor(c / F.lit(float(1 << j))).cast("bigint"), F.lit(2))
            terms.append(bit * F.lit(1 << (j * n + i)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    ranges: Sequence[tuple[float, float]],
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Morton key of ``cols``:
    range-repartition on the key (equal-size files, since the range
    partitioner samples the key distribution) then sort within each
    partition so row groups inside a file are tight too. ``ranges``
    supplies each column's (lo, hi) — at scale these come from table
    stats, passed in so the write plan needs no extra aggregation
    pass."""
    zkey = interleave_bits(
        [
            scale_to_bits(F.col(c), lo, hi, bits)
            for c, (lo, hi) in zip(cols, ranges)
        ],
        bits,
    )
    keyed = df.withColumn("__zkey", zkey)
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(n, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def build_manifest(spark, path: str, cols: Sequence[str]) -> DataFrame:
    """File-level min/max statistics manifest — the Iceberg/Delta
    manifest analog for a plain parquet directory: one row per data
    file with each tracked column's (lo, hi) and row count, built in
    ONE scan via input_file_name grouping. The manifest is
    file-count-sized (KBs for TBs of data) and is what makes
    predicate-driven file skipping explicit and testable rather than
    an engine internal."""
    df = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    return df.groupBy(F.col("__file").alias("file")).agg(*aggs)


def prune_files(manifest: DataFrame, ranges: dict[str, tuple]) -> list[str]:
    """Data files whose stats interval intersects EVERY queried range
    — the file-skipping step a catalog runs before handing Spark the
    scan list. Interval-overlap test per column: keep file unless
    hi < q_lo or lo > q_hi. Collecting is correct here: the manifest
    is file-count-sized metadata, not data."""
    cond = F.lit(True)
    for c, (q_lo, q_hi) in ranges.items():
        cond = cond & ~(
            (F.col(f"hi_{c}") < F.lit(q_lo)) | (F.col(f"lo_{c}") > F.lit(q_hi))
        )
    return [r["file"] for r in manifest.filter(cond).select("file").collect()]


def read_pruned(spark, manifest: DataFrame, ranges: dict[str, tuple]) -> DataFrame:
    """Read only the files surviving :func:`prune_files` (callers
    still apply the row-level filter — file skipping is a superset
    guarantee, not an exact one)."""
    files = prune_files(manifest, ranges)
    if not files:
        raise ValueError("no files match the queried ranges")
    return spark.read.parquet(*files)


def build_manifest_bloom(
    spark,
    path: str,
    col: str,
    m_bits: int = 8192,
    k: int = 4,
) -> DataFrame:
    """Per-FILE Bloom filter manifest over a high-cardinality column —
    the data-skipping companion to :func:`build_manifest`: min/max
    intervals prune RANGE predicates but are useless for point lookups
    on a uniformly distributed key (every file's [lo, hi] covers the
    probe); a per-file Bloom answers "might this file contain key v?"
    in O(k) with no false negatives. This is the manifest analog of
    parquet's bloom_filter_enabled / Delta's bloom index, made
    explicit and testable.

    One scan: each value hashes to k positions (Kirsch–Mitzenmacher
    double hashing off one md5 — engine-portable, replayable in
    Python), positions collect_set per file into a sorted sparse
    position array (≤ m_bits ints, file-count-sized metadata total).
    """
    from .quality import _bloom_hashes

    df = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    h1, h2 = _bloom_hashes(F.col(col).cast("string"))
    pos = F.explode(
        F.array(
            *[
                F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)).cast("int")
                for i in range(k)
            ]
        )
    )
    return (
        df.select(F.col("__file").alias("file"), pos.alias("pos"))
        .groupBy("file")
        .agg(F.array_sort(F.collect_set("pos")).alias("bloom_pos"))
    )


def _bloom_positions_py(value, m_bits: int, k: int) -> list[int]:
    """Driver-side replay of the Spark-side hash (same md5-derived
    double hashing) for probe values."""
    import hashlib

    d = hashlib.md5(str(value).encode()).hexdigest()
    h1 = int(d[:8], 16)
    h2 = int(d[8:16], 16) * 2 + 1
    return [(h1 + i * h2) % m_bits for i in range(k)]


def prune_files_bloom(
    manifest: DataFrame, value, m_bits: int = 8192, k: int = 4
) -> list[str]:
    """Files that MIGHT contain ``value``: keep a file iff every one
    of the probe's k bit positions is present in its Bloom position
    array. No false negatives (the containing file always survives);
    false-positive rate falls exponentially in k for a given fill.
    The filter evaluates on the file-count-sized manifest; collecting
    the survivor list is metadata, not data."""
    cond = F.lit(True)
    for p in _bloom_positions_py(value, m_bits, k):
        cond = cond & F.array_contains(F.col("bloom_pos"), p)
    return [r["file"] for r in manifest.filter(cond).select("file").collect()]


def _hilbert_tables():
    """Derive the 2-D Hilbert per-bit state machine from the classic
    xy2d loop (Warren, Hacker's Delight fig. 16-6 lineage): walking
    bits MSB-first, the accumulated rotation is always one of FOUR
    reachable transforms of the remaining sub-square, so the whole
    curve is a 4-state machine over 2-bit inputs. Returns
    (digit_table, next_table), each 16 ints indexed by
    state*4 + (2*bx + by) on the RAW bits.

    A transform is (swap, fx, fy): current_x = fx ^ raw_[y if swap
    else x], current_y = fy ^ raw_[x if swap else y]. Per step the
    algorithm reads the TRANSFORMED bits (rx, ry), emits digit
    (3*rx)^ry, and prepends: ry==0,rx==0 → swap; ry==0,rx==1 → flip
    both then swap; else identity. States are discovered by BFS from
    the identity, so the tables are provably consistent with the
    reference fold (pinned against literal xy2d in
    tests/test_layout.py)."""
    def apply(t, bx, by):
        sw, fx, fy = t
        cx = fx ^ (by if sw else bx)
        cy = fy ^ (bx if sw else by)
        return cx, cy

    def compose_step(t, rx, ry):
        # new current coords from step applied AFTER t
        sw, fx, fy = t
        # write t as: cur_x = fx ^ raw_p1, cur_y = fy ^ raw_p2
        p1, p2 = ("y", "x") if sw else ("x", "y")
        if ry == 0 and rx == 0:        # swap(cx, cy)
            nx = (fy, p2)
            ny = (fx, p1)
        elif ry == 0 and rx == 1:      # flip both, then swap
            nx = (1 ^ fy, p2)
            ny = (1 ^ fx, p1)
        else:
            nx = (fx, p1)
            ny = (fy, p2)
        nsw = nx[1] == "y"
        return (nsw, nx[0], ny[0])

    states = [(False, 0, 0)]
    digit, nxt = {}, {}
    i = 0
    while i < len(states):
        t = states[i]
        for bx in (0, 1):
            for by in (0, 1):
                rx, ry = apply(t, bx, by)
                digit[(i, 2 * bx + by)] = (3 * rx) ^ ry
                t2 = compose_step(t, rx, ry)
                if t2 not in states:
                    states.append(t2)
                nxt[(i, 2 * bx + by)] = states.index(t2)
        i += 1
    assert len(states) == 4, states
    dig_tab = [digit[(s, q)] for s in range(4) for q in range(4)]
    nxt_tab = [nxt[(s, q)] for s in range(4) for q in range(4)]
    return dig_tab, nxt_tab


HILBERT_DIGIT, HILBERT_NEXT = _hilbert_tables()


def hilbert_key(x: Column, y: Column, bits: int = 8) -> Column:
    """2-D Hilbert curve index of integer grid coords in [0, 2^bits)
    — the locality-tighter alternative to the Morton key: consecutive
    key values are always GRID-ADJACENT cells (Morton jumps across
    the square at power-of-two seams), so range-partitioned files
    cover more compact rectangles and min/max pruning skips more at
    the same file count. Pure column arithmetic: per bit, one
    16-entry constant-array lookup for the output digit and one for
    the next rotation state — a LINEAR chain of ``bits`` small
    expressions (no per-step branch doubling), engine-portable, so a
    SQL oracle replays the identical fold. Columns come from
    :func:`scale_to_bits`. 2-D only; for 3+ dims compose: hilbert on
    the two hottest predicates, then interleave coarse bits of the
    rest (Hamilton's n-D generalization buys little once file counts,
    not cells, are the pruning unit)."""
    dig = F.array(*[F.lit(v) for v in HILBERT_DIGIT])
    nxt = F.array(*[F.lit(v) for v in HILBERT_NEXT])
    state = F.lit(0).cast("int")
    d = F.lit(0).cast("bigint")
    for k in range(bits - 1, -1, -1):
        bx = F.pmod(F.floor(x / F.lit(float(1 << k))).cast("bigint"), F.lit(2))
        by = F.pmod(F.floor(y / F.lit(float(1 << k))).cast("bigint"), F.lit(2))
        sel = (state * 4 + (bx * 2 + by)).cast("int")
        d = d * 4 + F.element_at(dig, sel + 1).cast("bigint")
        state = F.element_at(nxt, sel + 1)
    return d.cast("bigint")
