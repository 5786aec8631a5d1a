"""Atomic on-disk fixture creation for file-source queries (t10, m03).

Queries that demonstrate REAL file sources (wholetext, binaryFile) need
deterministic files on local disk. Those fixtures are written once into
a shared temp location; creation must be safe under concurrent first
runs (two sessions, or a session racing the DuckDB oracle). The pattern:
write into a UNIQUE temp dir, then ``os.replace`` it into place — the
rename is atomic, so readers only ever see a complete directory, and
the loser of a creation race just discards its copy.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable


def ensure_fixture_dir(name: str, writer: Callable[[str], None]) -> str:
    """Return the shared fixture dir ``$TMPDIR/<name>``, creating it
    atomically via ``writer(tmp_dir)`` + ``os.replace`` on first use."""
    d = os.path.join(tempfile.gettempdir(), name)
    if os.path.isdir(d):
        return d
    tmp = f"{d}.tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    writer(tmp)
    try:
        os.replace(tmp, d)
    except OSError:
        # someone else renamed theirs in first; keep the winner's copy
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isdir(d):
            raise
    return d
