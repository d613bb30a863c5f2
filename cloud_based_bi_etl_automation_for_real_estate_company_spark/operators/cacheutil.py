"""Cache-lifetime bookkeeping for operators that persist an
intermediate table (MinHash signatures, distinct shingle sets).

A returned DataFrame's plan references the persisted intermediate
lazily, so the operator cannot unpersist before the caller's action —
and in a long-lived session (the 8×/day job cadence this repo
targets) leaked caches accumulate until executor storage evicts
them. Operators therefore attach their cached dependencies to the
result (``cached_deps``) and callers release them after their final
action with :func:`release_cached`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def attach_cached(df: DataFrame, *deps: DataFrame) -> DataFrame:
    """Record ``deps`` (persisted DataFrames the plan of ``df`` reads)
    on the result so the caller can release them."""
    existing = list(getattr(df, "cached_deps", []))
    df.cached_deps = existing + list(deps)
    return df


def release_cached(df: DataFrame, blocking: bool = False) -> None:
    """Unpersist every cached dependency attached by the operator that
    produced ``df``. Call after the last action over ``df`` (or any
    frame derived from it before the cache was needed again)."""
    for dep in getattr(df, "cached_deps", []):
        dep.unpersist(blocking=blocking)
    df.cached_deps = []
