"""Final-bench recorder with per-query noise context (VERDICT r7 task #4).

Rounds 3-7 adjudicated single-run swings (m04 2.0-9.6s across one
round's finals) by hand-reading N separate bench_runs/r{N}_final_*.json
files. This tool makes the noise context part of the artifact itself:

  python tools/bench_finals.py <prefix> <n_runs> [sf_dir]

runs ``python bench.py`` ``n_runs`` times on this boot, writes each full
payload to ``bench_runs/<prefix>_<i>.json`` (exactly the files the old
manual protocol produced), and additionally writes
``bench_runs/<prefix>_min.json``:

  {"metric": "engine_query_suite_wall_clock_min_across_finals",
   "n_runs": N, "value": <sum of per-query minima>,
   "queries": {name: min_sec}, "spread": {name: [min, max]}, ...}

The per-query MIN is the scheduling-noise-free estimate (the r3 "sum of
minima" insight, applied per query); the per-query [min, max] spread is
what lets the next round's judge adjudicate an m04-style swing from the
committed artifact alone, without re-running anything.

Aggregate-only mode (skip the runs, summarize existing files):

  python tools/bench_finals.py --aggregate <prefix>
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    for line in out.stderr.splitlines():
        if line.startswith("bench full-name timings: "):
            return json.loads(line.split(": ", 1)[1])
    # NO fallback to the stdout line: it keys by SHORT code, so a series
    # mixing both shapes would give aggregate() disjoint key spaces —
    # every query twice with n=1 spreads and a double-counted min
    # (r8 ADVICE). bench.py at HEAD always emits the stderr mirror.
    raise RuntimeError(
        "bench.py emitted no 'bench full-name timings:' stderr line — "
        "refusing the short-code stdout fallback (key spaces would mix)"
    )


def aggregate(payloads: list[dict], prefix: str) -> dict:
    """Fold N full bench payloads into the min/spread artifact. Failed
    runs of a query (-1.0) are excluded from min/max; a query that
    failed in EVERY run keeps -1.0 so the failure stays visible."""
    per_query: dict[str, list[float]] = {}
    for p in payloads:
        for name, t in p.get("queries", {}).items():
            per_query.setdefault(name, []).append(t)
    mins: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name, ts in sorted(per_query.items()):
        ok = [t for t in ts if t >= 0]
        if ok:
            mins[name] = min(ok)
            spread[name] = [min(ok), max(ok)]
        else:
            mins[name] = -1.0
            spread[name] = [-1.0, -1.0]
    return {
        "metric": "engine_query_suite_wall_clock_min_across_finals",
        "unit": "sec",
        "prefix": prefix,
        "n_runs": len(payloads),
        "value": round(sum(t for t in mins.values() if t >= 0), 3),
        "sf": payloads[0].get("sf") if payloads else None,
        "queries": mins,
        "spread": spread,
    }


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--aggregate":
        prefix = sys.argv[2]
        paths = sorted(
            p
            for p in glob.glob(
                os.path.join(REPO, "bench_runs", f"{prefix}_*.json")
            )
            if not p.endswith("_min.json")
        )
        if not paths:
            print(f"no bench_runs/{prefix}_*.json found", file=sys.stderr)
            return 2
        payloads = [json.load(open(p)) for p in paths]
    elif len(sys.argv) >= 3:
        prefix, n_runs = sys.argv[1], int(sys.argv[2])
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        os.makedirs(os.path.join(REPO, "bench_runs"), exist_ok=True)
        payloads = []
        for i in range(1, n_runs + 1):
            p = _run_bench(sf_dir)
            with open(
                os.path.join(REPO, "bench_runs", f"{prefix}_{i}.json"), "w"
            ) as f:
                json.dump(p, f)
            payloads.append(p)
            print(
                f"run {i}/{n_runs}: total {p.get('value')}s", file=sys.stderr
            )
    else:
        print(
            "usage: python tools/bench_finals.py <prefix> <n_runs> [sf_dir]\n"
            "       python tools/bench_finals.py --aggregate <prefix>",
            file=sys.stderr,
        )
        return 2

    out = aggregate(payloads, prefix)
    path = os.path.join(REPO, "bench_runs", f"{prefix}_min.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(json.dumps({k: out[k] for k in ("n_runs", "value", "sf")}))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
