"""Range (interval) join — pair rows whose timestamps fall within a
bounded window of each other (e.g. "clicks within 30 min before each
purchase").

A naive theta-join `l.ts BETWEEN r.ts AND r.ts + W` degenerates to a
per-key nested loop. The scalable rewrite is **time bucketing**: hash
both sides into fixed-width buckets of the window size; a right row
matching `[l.ts − W, l.ts]` can only live in the left row's bucket or
the one before it, so the theta-join becomes an equi-join on
(key, bucket) over the left side exploded to 2 candidate buckets,
followed by the exact range filter. One shuffle each side, join
fan-out bounded by bucket occupancy — the same trick every
stream-processor uses for interval joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Inner-join rows where ``right_ts`` ∈ [left_ts − window, left_ts]
    and the ``on`` keys match. Output: all left columns + right's
    non-key columns.
    """
    on = list(on)
    w_us = window_seconds * 1_000_000
    lb = (F.unix_micros(F.col(left_ts)) / F.lit(w_us)).cast("long")
    rb = (F.unix_micros(F.col(right_ts)) / F.lit(w_us)).cast("long")
    l = left.withColumn("__cand", F.explode(F.array(lb - 1, lb)))
    r = right.withColumn("__bucket", rb)
    cond = [l[c] == r[c] for c in on] + [l["__cand"] == r["__bucket"]]
    joined = l.join(r, cond).filter(
        (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.make_dt_interval(secs=F.lit(window_seconds)))
    )
    keep = [l[c] for c in left.columns] + [
        r[c] for c in right.columns if c not in on
    ]
    return joined.select(*keep)
