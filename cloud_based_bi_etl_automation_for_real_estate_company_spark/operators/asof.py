"""As-of join — "state of X at time T" (SURVEY.md §7 extension: the
reference's action_history table holds per-lead history since 2018
(reference README.md:142,147); reconstructing lead state at an
arbitrary time is the natural query over it).

Spark has no ASOF JOIN operator; the scalable rewrite is the
union-and-propagate pattern:

  1. tag left rows (side=1) and right rows (side=0), union them;
  2. one window partitioned by the key, ordered by (ts, side):
     ``last_value(right_payload, ignoreNulls)`` up to the current row
     propagates the most recent right value onto every left row;
  3. keep left rows.

One shuffle on the key (same as any keyed window), no range
cross-join, no per-key collect — this is the 100 TB-safe shape.
Ordering puts side=0 before side=1 at equal ts, giving
right.ts <= left.ts inclusive semantics (standard ASOF).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
) -> DataFrame:
    """For each left row, attach the latest ``payload`` columns from
    the right row with the same key and right_ts <= left_ts.

    Payload columns are NULL when no prior right row exists.
    """
    on = list(on)
    lcols = left.columns
    l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols if c not in on and c != left_ts],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload],
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in on and c != left_ts],
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    merged = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "*",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload
        ],
    )
    out_cols = (
        on
        + [F.col("__ts").alias(left_ts)]
        + [c for c in lcols if c not in on and c != left_ts]
        + list(payload)
    )
    return filled.filter(F.col("__side") == 1).select(*out_cols)
