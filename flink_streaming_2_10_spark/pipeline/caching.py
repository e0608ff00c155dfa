"""Tracked persistence for operator-internal intermediates.

Dedup/similarity operators persist intermediates that multiple downstream
stages consume (postings, signatures, bucketed vectors). The persisted
block outlives the operator call — the caller's *action* is what consumes
it — so the operator cannot unpersist before returning. Spark's
CacheManager does not garbage-collect DataFrame caches, so a long-lived
session that runs these operators repeatedly would accumulate blocks.

Contract: operators register every internal ``persist`` here; callers that
run many operators in one session call :func:`release_cached` after each
result is fully consumed (``bench.py`` does this between queries). Leaving
them cached is also fine for short-lived jobs — executors reclaim
MEMORY_AND_DISK blocks under pressure — but release keeps the store clean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)`` + register the handle for bulk release."""
    out = df.persist(level)
    _TRACKED.append(out)
    return out


def release_cached() -> int:
    """Unpersist every tracked intermediate; returns how many were
    released. Safe to call at any time — unpersisting a DataFrame whose
    job already finished is a no-op beyond dropping the blocks."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing left to release
    _TRACKED.clear()
    return n
