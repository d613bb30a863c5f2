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


def release_checkpoint(df: DataFrame | None) -> None:
    """Free the block-manager storage behind a ``localCheckpoint``'d
    DataFrame (round 16 — the r15 ADVICE leak flag on the iterative
    loops: every peel/contraction/hop round checkpoints a new frame
    and the previous round's blocks sat pinned until JVM GC got around
    to them, so a deep loop's storage grows linearly with rounds).

    A checkpointed frame's analyzed plan is a ``LogicalRDD`` holding
    the cached RDD; unpersisting that RDD drops its blocks NOW instead
    of at some future ContextCleaner pass. The lineage was truncated
    at checkpoint time, so the data is unrecoverable afterwards — call
    this ONLY on a frame no live plan will scan again (the loop
    contract: round N's frames are dead once round N+1's checkpoint
    has materialized). Non-checkpointed frames and API drift degrade
    to the old leak-until-GC behavior, never to an error."""
    if df is None:
        return
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass
