"""Skew mitigation — salting for hot keys.

AQE's skew-join splitting handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.py); salting is
the explicit fallback for the two shapes AQE doesn't cover:

- **aggregation skew**: one hot group key (e.g. a bot user in an event
  log) lands an entire 100 GB group on one reducer. Two-phase salted
  aggregation splits the group into N shards, partially aggregates,
  then re-aggregates the N partials — the classic combiner rewrite,
  valid for any associative aggregate.
- **broadcast-impossible skewed join**: replicate the small side N×
  (explode over salt values), salt the big side's key randomly in
  [0, N) — every hot key spreads over N reducers.

Salt is derived from a stable hash of other columns (not rand()) so
results stay deterministic and replay-identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df_cols: Sequence[str], n: int) -> Column:
    # stable pseudo-random shard in [0, n): hash of the full row's
    # natural identifiers — deterministic, uniform enough to spread
    return F.pmod(F.hash(*[F.col(c) for c in df_cols]), F.lit(n))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt_cols: Sequence[str],
    num_shards: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps column → 'sum'|'count'|'min'|'max' (associative
    aggregates only). Phase 1 aggregates (keys, salt) shards — the hot
    key spreads across ``num_shards`` reducers; phase 2 merges shard
    partials per key (count merges by summing partial counts).
    """
    keys = list(keys)
    salted = df.withColumn("__salt", _salt(salt_cols, num_shards))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            getattr(F, fn)(c).alias(f"__p_{c}")
            for c, fn in aggs.items()
        ]
    )
    merge = {
        "sum": F.sum,
        "count": F.sum,  # partial counts merge by summation
        "min": F.min,
        "max": F.max,
    }
    phase2 = phase1.groupBy(*keys).agg(
        *[merge[fn](f"__p_{c}").alias(c) for c, fn in aggs.items()]
    )
    return phase2


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_shards: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-resilient equi-join: replicate ``small`` across
    ``num_shards`` salt values, salt ``big`` deterministically, join on
    (key, salt). Output columns = big ∪ small (key deduplicated)."""
    salt_cols = list(salt_cols or big.columns)
    big_s = big.withColumn("__salt", _salt(salt_cols, num_shards))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_shards - 1)))
    )
    joined = big_s.join(small_s, [key, "__salt"])
    return joined.drop("__salt")
