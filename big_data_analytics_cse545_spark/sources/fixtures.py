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


def ensure_fixture_dir(
    name: str,
    writer: Callable[[str], None],
    prune_prefix: str | None = None,
    prune_re: str | None = None,
) -> str:
    """Return the shared fixture dir ``$TMPDIR/<name>``, creating it
    atomically via ``writer(tmp_dir)`` + ``os.replace`` on first use.

    ``prune_prefix``: for digest-keyed fixtures (name =
    ``<prefix><content-digest>``), remove stale siblings that share the
    prefix but not the digest when a NEW digest is materialized — a
    rewritten source corpus (chaos sweeps) would otherwise mint an
    unbounded series of abandoned fixture dirs in TMPDIR (round-6
    review). The prefix must IDENTIFY ONE SOURCE: callers key it on the
    source's path (see ``_m01_fixture_dir``'s path hash), never on a
    basename two live corpora could share — ``startswith`` would
    otherwise let ``..._sf0.1_`` delete a live ``..._sf0.1_chaos_...``
    fixture. ``prune_re`` (optional) further restricts pruning to
    siblings whose name FULLY matches the regex, so a prefix collision
    cannot take out a differently-shaped name. Only on first creation,
    so the steady state never touches siblings; best-effort (a
    concurrent reader of a truly stale digest loses its files, which is
    the same contract as the corpus rewrite that invalidated it)."""
    d = os.path.join(tempfile.gettempdir(), name)
    if os.path.isdir(d):
        return d
    tmp = f"{d}.tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    try:
        writer(tmp)
    except BaseException:
        # a writer crash (disk full, corrupt source) must not leak a
        # partial .tmp dir — pruning deliberately skips .tmp entries,
        # so an orphan would survive forever (round-6 review)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    try:
        os.replace(tmp, d)
    except OSError:
        # someone else renamed theirs in first; keep the winner's copy
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isdir(d):
            raise
    if prune_prefix:
        import re

        pat = re.compile(prune_re) if prune_re else None
        root = tempfile.gettempdir()
        for entry in os.listdir(root):
            # leave in-flight .tmp-<pid> dirs alone — their writers
            # clean up after themselves and deleting one mid-write
            # would break a concurrent creation
            if (
                entry.startswith(prune_prefix)
                and entry != name
                and ".tmp-" not in entry
                and (pat is None or pat.fullmatch(entry))
            ):
                shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
    return d
