"""Verify every ``file:line`` reference citation in the repo resolves.

Round-5 VERDICT found one stale citation (sampling.py pointed at a
``pyspark_hash_partitioning/...`` path that never existed in
``/root/reference/``). This sweep makes that class of drift impossible
to reintroduce silently: it extracts every citation of the shape
``<ref-basename>.(py|txt):N[-M]`` from the package, tests, bench and
entry sources, resolves the basename against the actual files under
``/root/reference/``, and checks the cited line range fits the file.

Run directly (exit 1 on any failure) or via pytest
(tests/test_entry_contract.py::test_reference_citations_resolve).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

# every citable reference artifact, keyed by basename
def _reference_files() -> dict[str, Path]:
    out: dict[str, Path] = {}
    for p in REFERENCE.rglob("*"):
        if p.suffix in {".py", ".txt"} and p.is_file():
            out[p.name] = p
    return out


# a citation is <basename>.py:12 or <basename>.txt:9-56, where the
# basename matches an actual reference file; the scan also catches
# citations that DON'T resolve (any path-like token ending in
# .py:/.txt: that mentions a reference-looking name).
_CITE = re.compile(r"([A-Za-z0-9_./ -]*?([a-z0-9_]+\.(?:py|txt))):(\d+)(?:-(\d+))?")

# line-cited third-party files we deliberately reference (none today);
# add here explicitly rather than weakening the unknown-file rule
_ALLOWED_EXTERNAL: frozenset[str] = frozenset()


def _source_files() -> list[Path]:
    roots = [
        REPO / "big_data_analytics_cse545_spark",
        REPO / "tests",
        REPO / "tools",
    ]
    files = [REPO / "bench.py", REPO / "__spark_entry__.py"]
    for r in roots:
        files.extend(sorted(r.rglob("*.py")))
    return [f for f in files if f.is_file() and f.name != "check_citations.py"]


def check() -> list[str]:
    refs = _reference_files()
    ref_lines = {name: len(p.read_text(errors="replace").splitlines()) for name, p in refs.items()}
    own = {p.name for p in _source_files()}
    errors: list[str] = []
    for f in _source_files():
        text = f.read_text(errors="replace")
        for m in _CITE.finditer(text):
            full, base, lo, hi = m.group(1).strip(), m.group(2), int(m.group(3)), m.group(4)
            if base not in refs:
                # strict: every line-cited basename must be a repo file
                # (self-citation) or a reference file — this is exactly
                # how round 5's stale ``pyspark_hash_partitioning/...``
                # citation would have been caught. A future citation to
                # third-party source should be added to the allowlist
                # below explicitly.
                if base not in own and base not in _ALLOWED_EXTERNAL:
                    errors.append(
                        f"{f.relative_to(REPO)}: cites unknown file {full!r} "
                        "(not a repo file, not under /root/reference/)"
                    )
                continue
            if base in own:
                continue  # same-named repo file; not a reference citation
            # if a directory prefix is given (text ending in "/" right
            # before the basename — "a.py:1 / b.py:2" prose is not a
            # prefix), it must match the real location
            prefix = full[: -len(base)]
            if prefix.endswith("/"):
                want = str(refs[base].relative_to(REFERENCE))
                if full.lstrip("./") not in (want, str(refs[base])):
                    errors.append(
                        f"{f.relative_to(REPO)}: cites {full!r} but the file lives at {want!r}"
                    )
                    continue
            hi_n = int(hi) if hi else lo
            n = ref_lines[base]
            if not (1 <= lo <= hi_n <= n):
                errors.append(
                    f"{f.relative_to(REPO)}: cites {base}:{lo}"
                    + (f"-{hi}" if hi else "")
                    + f" but the file has {n} lines"
                )
    return errors


def main() -> int:
    errors = check()
    for e in errors:
        print(e, file=sys.stderr)
    print(f"check_citations: {'FAIL' if errors else 'OK'} ({len(errors)} bad citations)")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
