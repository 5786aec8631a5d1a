"""Benchmark runner — times every registered query at the bench scale factor.

Prints ONE JSON line (stdout, final line, nothing after it):
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {code: sec, ...}, "sf": <sf>}
where `code` is the query's unique short prefix (q01, d03, st11, ...)
so the line stays under the driver's 2000-char stdout tail; the
full-name map is echoed to stderr.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_SHUFFLE_PARTITIONS.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def short_code_timings(timings: dict[str, float]) -> dict[str, float]:
    """Key timings by each query's short code (prefix before the first
    underscore). On a collision, ONLY the colliding names get a stable
    ordinal suffix — never a fallback to the full-name payload, which
    is exactly the >1900-char line the short form exists to avoid
    (round-5 ADVICE)."""
    from collections import Counter

    counts = Counter(n.split("_", 1)[0] for n in timings)
    seen: dict[str, int] = {}
    short: dict[str, float] = {}
    # iterate in sorted-name order so collision suffixes are stable
    # across forward and REVERSE bench runs (round-6 review: insertion
    # order would swap #1/#2 between the two directions, corrupting
    # exactly the fwd-vs-rev comparison reverse mode exists for)
    for n, t in sorted(timings.items()):
        code = n.split("_", 1)[0]
        if counts[code] > 1:
            seen[code] = seen.get(code, 0) + 1
            code = f"{code}#{seen[code]}"
        short[code] = t
    return short


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # tolerant sf parse: bench must ALWAYS emit its JSON line, so a dir
    # like .../sf0.1_nulls or a stray 'sf' substring reports sf=-1.0
    # instead of dying on float() before the guarded loop (round-6
    # review)
    m = re.search(r"sf(\d+(?:\.\d+)?)/*$", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from big_data_analytics_cse545_spark.session import get_spark

    # 32 shuffle partitions — the config every recorded bench number has
    # actually run at (a configure_runtime reset silently pinned 32 until
    # the round-6 review; declaring 32 keeps the whole bench history
    # comparable rather than shifting every timing by a config change)
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.all_queries()  # full registry — bench ignores the driver budget
    # JVM/codegen warmup on the flagship so per-query numbers measure the
    # plan, not classloading.
    try:
        qs["q01_pricing_summary"](spark, sf_dir).collect()
    except Exception as exc:  # noqa: BLE001 — bench must always emit JSON
        print(f"bench: warmup FAILED: {exc}", file=sys.stderr)

    # SPARK_GRAFT_BENCH_ORDER=reverse runs the suite back-to-front —
    # used to separate real per-query regressions from suite-order JVM
    # effects (GC pressure, codegen cache, Python-worker reuse)
    ordered = sorted(qs.items())
    if os.environ.get("SPARK_GRAFT_BENCH_ORDER") == "reverse":
        ordered = ordered[::-1]
    timings: dict[str, float] = {}
    for name, fn in ordered:
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — bench must always emit JSON
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    payload = {
        "metric": "engine_query_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # The driver keeps only the last ~2000 chars of stdout and parses the
    # final line — a 112-query map with full names (~3.3 KB) gets its head
    # truncated and records "parsed": null (VERDICT r4 finding #1). The
    # final stdout line therefore keys the map by each query's unique
    # short code (the prefix before the first underscore: q01, d03, st11,
    # ...); the full-name map still goes to stderr for humans and to the
    # bench_runs/ artifacts written by tools/.
    compact = dict(payload, queries=short_code_timings(timings))
    print("bench full-name timings: " + json.dumps(payload), file=sys.stderr)
    line = json.dumps(compact)
    if len(line) > 1900:
        print(f"bench: WARNING final line {len(line)} chars may truncate in driver tail", file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
