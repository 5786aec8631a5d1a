"""Session-scoped persist discipline shared by every iterative/forked
operator (m01's funnel fork, g01's rank loop, t24's merge loop).

``swap_cached`` persists a DataFrame (MEMORY_AND_DISK) and unpersists
the PREVIOUS invocation's DF for the same key — bounding the cache
footprint of a long-lived session (one bench run executes the whole
registry in one SparkSession) to one live entry per query family
instead of one per call, the leak ADVICE r2 flagged. Mirrors the
reference's manual ``persist()`` reuse (``a2_ahuja.py:221,327,431``)
with an explicit eviction contract Spark does not provide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CACHED: dict[str, DataFrame] = {}


def swap_cached(key: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` under ``key``; unpersist the key's previous DF.

    The unpersist is best-effort: the prior DF may belong to an
    already-stopped session."""
    from pyspark import StorageLevel

    prev = _CACHED.pop(key, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:  # noqa: BLE001 — session gone; nothing to free
            pass
    _CACHED[key] = df.persist(StorageLevel.MEMORY_AND_DISK)
    return _CACHED[key]
