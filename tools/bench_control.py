"""Same-boot bench control (VERDICT r5 task #7, institutionalizing the
round-5 ``r5_control_r4code`` protocol): bench the CURRENT working tree
and a PREVIOUS git ref in one session on one boot, so host drift can
never masquerade as a code regression again.

How round 5 settled the host-vs-code question: raw BENCH totals read
177.6s (r5) vs 121.7s (r4), but re-benching round 4's exact code on the
round-5 boot gave 167.8s — a uniform ~1.37× host factor; the same-boot
code-vs-code median ratio was 0.988. This tool makes that measurement a
one-command protocol:

  python tools/bench_control.py <prev_ref> [sf_dir] [out_prefix]

* checks out ``prev_ref`` into a temporary git worktree (the working
  tree itself is never touched),
* runs ``python bench.py`` as a subprocess from HEAD and from the
  worktree, interleaved (prev, head, prev, head would amplify order
  effects; a single pair is the round-5 protocol) on the SAME boot,
* writes both full bench payloads to
  ``bench_runs/<out_prefix>_{head,prev}.json`` and prints one summary
  JSON line: per-query ratios over the common query set, their median,
  and the max regression.

Interpretation rule (SCALE.md "Bench variance"): single-query deltas
under ~3× on this box are scheduling/GC noise; the actionable signals
are the MEDIAN ratio (uniform drift) and any query whose ratio exceeds
the suite's spread in both directions.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(cwd: str, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    # prefer the full-name payload bench.py mirrors to stderr (the
    # stdout line keys by short code for the driver-tail limit)
    for line in out.stderr.splitlines():
        if line.startswith("bench full-name timings: "):
            return json.loads(line.split(": ", 1)[1])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    if len(sys.argv) < 2:
        print(
            "usage: python tools/bench_control.py <prev_ref> [sf_dir] [out_prefix]",
            file=sys.stderr,
        )
        return 2
    prev_ref = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    prefix = sys.argv[3] if len(sys.argv) > 3 else "control"

    os.makedirs(os.path.join(REPO, "bench_runs"), exist_ok=True)
    wt = tempfile.mkdtemp(prefix="graft_prev_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, prev_ref],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    try:
        prev = _run_bench(wt, sf_dir)
        head = _run_bench(REPO, sf_dir)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO,
            check=True,
            capture_output=True,
        )

    for tag, payload in (("head", head), ("prev", prev)):
        with open(
            os.path.join(REPO, "bench_runs", f"{prefix}_{tag}.json"), "w"
        ) as f:
            json.dump(payload, f)

    summary = summarize(head["queries"], prev["queries"])
    print(json.dumps({"prev_ref": prev_ref, "sf_dir": sf_dir, **summary}))
    return 0


def summarize(hq: dict, pq: dict) -> dict:
    """Code-vs-code comparison over the common query set. Failed
    queries (bench records them as -1.0) are excluded from ratios but
    reported, so a crash can't silently vanish from the control."""
    common = sorted(k for k in hq if k in pq and hq[k] > 0 and pq[k] > 0)
    failed = sorted(
        k for k in set(hq) | set(pq) if hq.get(k, 1) < 0 or pq.get(k, 1) < 0
    )
    ratios = {k: round(hq[k] / pq[k], 3) for k in common}
    return {
        "common_queries": len(common),
        "failed_queries": failed,
        "head_total_common": round(sum(hq[k] for k in common), 3),
        "prev_total_common": round(sum(pq[k] for k in common), 3),
        "median_ratio": (
            round(statistics.median(ratios.values()), 3) if ratios else None
        ),
        "worst_query": (
            max(ratios.items(), key=lambda kv: kv[1]) if ratios else None
        ),
        "ratios_over_1p5": {k: v for k, v in ratios.items() if v >= 1.5},
    }


if __name__ == "__main__":
    raise SystemExit(main())
