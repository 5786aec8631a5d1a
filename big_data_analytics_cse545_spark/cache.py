"""Session-scoped persist discipline for caches reused ACROSS
invocations (m01's funnel signatures, g01's graph relations).

``swap_cached`` persists a DataFrame (MEMORY_AND_DISK) and unpersists
the PREVIOUS invocation's DF for the same key — bounding the cache
footprint of a long-lived session (one bench run executes the whole
registry in one SparkSession) to one live entry per query family
instead of one per call, the leak ADVICE r2 flagged. Mirrors the
reference's manual ``persist()`` reuse (``a2_ahuja.py:221,327,431``)
with an explicit eviction contract Spark does not provide.

NOT for chained lineage WITHIN a loop: when iteration k+1's relation
derives from iteration k's, the new state must materialize before the
parent is released or the loop replays its whole history — and the
plan must be TRUNCATED as it advances or optimizer re-inlining makes
analysis cost superlinear in rounds. text.train_bpe gets both from a
per-round ``localCheckpoint(eager=False)``, deliberately local to the
loop (its docstring and SCALE.md round 9 have the measured story).
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
