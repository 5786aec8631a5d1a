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

Round-7 hardening (VERDICT r6 task #2 — round 6's control was recorded
seven source commits before HEAD, so a 3.3× expression regression
landed after it and sailed through adjudicated-as-noise):

* every recorded control embeds ``last_source_commit`` (the newest
  commit touching ``SOURCE_PATHS`` — the engine package, ``bench.py``,
  ``__spark_entry__.py``; ``tests/`` and ``tools/`` are deliberately
  NOT anchors, see the SOURCE_PATHS comment) plus a source-dirty flag,
  and the summary line repeats them;
* ``python tools/bench_control.py --check [control_head.json]`` exits
  non-zero (loudly) if the recorded control predates the current last
  source commit or was recorded on a dirty source tree — run it before
  committing a round's final bench artifacts;
* the summary now also compares HEAD timings against the prior round
  (``vs_prior_bench``), naming every query over 2× — the cross-round
  tripwire the r6 t13 regression needed.

Round-9 hardening (VERDICT r8 task #7): ``vs_prior_bench`` prefers the
prior round's ``bench_runs/r{N}_final_min.json`` (per-query minima
across that round's finals — tools/bench_finals.py) over the single-run
``BENCH_r{N}.json`` as its denominator, and
``python tools/bench_control.py --tripwire bench_runs/r9_final_min.json``
runs the min-vs-min compare after this round's finals are recorded —
so a q15-style GC landing spot can no longer cost an adjudication.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# import-time, guarded: vs_prior_bench imports bench.py's short-code
# mapping; an insert per CALL grew sys.path unboundedly across repeated
# invocations in one test process (r8 ADVICE)
if REPO not in sys.path:
    sys.path.insert(0, REPO)
# paths whose commits can change MEASURED behavior: the engine, the
# bench harness itself, and the query registry it runs. Docs (SCALE.md,
# bench_runs/), tests/ and tools/ are deliberately excluded — a
# test-only or audit-tool commit cannot move a bench number, and
# counting them would force a pointless 2×-full-bench re-record after
# every post-control test addition (the first cut included them and the
# gate fired on exactly that).
SOURCE_PATHS = (
    "big_data_analytics_cse545_spark",
    "bench.py",
    "__spark_entry__.py",
)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout.strip()


def source_state() -> dict:
    """(last source-touching commit, dirty flag) for HEAD-anchoring."""
    last = _git("log", "-1", "--format=%H", "HEAD", "--", *SOURCE_PATHS)
    dirty = bool(_git("status", "--porcelain", "--", *SOURCE_PATHS))
    return {"last_source_commit": last, "source_dirty": dirty}


def check_control(path: str) -> int:
    """Exit non-zero unless the recorded control is anchored at the
    CURRENT last source-touching commit and was recorded clean."""
    with open(path) as f:
        payload = json.load(f)
    recorded = payload.get("last_source_commit")
    now = source_state()
    problems = []
    if recorded is None:
        problems.append("control predates HEAD-anchoring (no last_source_commit)")
    elif recorded != now["last_source_commit"]:
        problems.append(
            f"STALE control: recorded at source commit {recorded[:12]} but "
            f"current last source commit is {now['last_source_commit'][:12]} "
            "— re-run bench_control at true HEAD"
        )
    if payload.get("source_dirty"):
        problems.append("control was recorded on a DIRTY source tree")
    if now["source_dirty"]:
        problems.append(
            "source tree is dirty NOW — commit first, then re-check"
        )
    if problems:
        for p in problems:
            print(f"CONTROL CHECK FAIL: {p}", file=sys.stderr)
        return 1
    print(
        f"control OK: anchored at {recorded[:12]} (current last source commit)"
    )
    return 0


def prior_bench(exclude_round: int | None = None) -> tuple[str, int, dict] | None:
    """The newest committed BENCH_r{N}.json — the prior round's driver
    bench, used for the cross-round per-query tripwire.
    ``exclude_round`` skips that round (pass the numerator artifact's
    own round so a tripwire run AFTER the round's BENCH lands cannot
    self-compare)."""
    best, best_n = None, -1
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n and int(m.group(1)) != exclude_round:
            best, best_n = p, int(m.group(1))
    if best is None:
        return None
    with open(best) as f:
        payload = json.load(f)
    # the driver wraps bench.py's JSON line under "parsed"
    queries = payload.get("queries") or payload.get("parsed", {}).get(
        "queries", {}
    )
    return os.path.basename(best), best_n, queries


def prior_final_min(round_n: int) -> tuple[str, dict] | None:
    """The prior round's min-across-finals artifact
    (``bench_runs/r{N}_final_min.json``, tools/bench_finals.py — FULL
    query names), if that round recorded one. Preferred over the
    single-run BENCH_r{N}.json as the tripwire denominator: per-query
    minima are the scheduling-noise-free estimate, so a min-based
    ratio can't spend a round adjudicating a GC landing spot (the
    r8 q15/m04 cost this exists to kill — VERDICT r8 task #7)."""
    p = os.path.join(REPO, "bench_runs", f"r{round_n}_final_min.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        payload = json.load(f)
    return os.path.basename(p), payload.get("queries", {})


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
    # the full-name payload bench.py mirrors to stderr (the stdout line
    # keys by short code for the driver-tail limit). NO short-code
    # fallback: a control whose two sides parse different key shapes
    # compares nothing ("common_queries": 0) — fail loudly instead
    # (r8 ADVICE on bench_finals; same class). Only pre-r5 refs lack
    # the stderr mirror, and controls always target the prior round.
    for line in out.stderr.splitlines():
        if line.startswith("bench full-name timings: "):
            return json.loads(line.split(": ", 1)[1])
    raise RuntimeError(
        f"bench.py in {cwd} emitted no 'bench full-name timings:' stderr "
        "line — refusing the short-code stdout fallback (the two control "
        "sides would compare disjoint key spaces)"
    )


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "--check":
        default = sorted(
            glob.glob(os.path.join(REPO, "bench_runs", "*control*_head.json")),
            key=os.path.getmtime,
        )
        path = (
            sys.argv[2]
            if len(sys.argv) > 2
            else (default[-1] if default else None)
        )
        if path is None:
            print("no recorded control found to check", file=sys.stderr)
            return 2
        print(f"checking {path}")
        return check_control(path)
    if len(sys.argv) >= 2 and sys.argv[1] == "--tripwire":
        # min-vs-min cross-round tripwire: compare THIS round's
        # min-across-finals artifact (path given explicitly — the
        # newest *_final_min.json could be the PRIOR round's committed
        # one, which would silently compare prior vs prior at 1.0)
        # against the prior round's. Run after tools/bench_finals.py.
        if len(sys.argv) < 3:
            print(
                "usage: python tools/bench_control.py --tripwire "
                "bench_runs/r{N}_final_min.json",
                file=sys.stderr,
            )
            return 2
        with open(sys.argv[2]) as f:
            head_min = json.load(f)
        m = re.search(r"r(\d+)_final_min\.json$", sys.argv[2])
        result = vs_prior_bench(
            head_min.get("queries", {}),
            head_kind="min",
            # never let the newest-BENCH heuristic resolve the
            # denominator to the numerator's own round (self-compare
            # reads a vacuous 1.0 once BENCH_r{N}.json is committed)
            exclude_round=int(m.group(1)) if m else None,
        )
        print(json.dumps({"head_min": sys.argv[2], "vs_prior_bench": result}))
        return 0
    if len(sys.argv) < 2:
        print(
            "usage: python tools/bench_control.py <prev_ref> [sf_dir] [out_prefix]\n"
            "       python tools/bench_control.py --check [control_head.json]\n"
            "       python tools/bench_control.py --tripwire <final_min.json>",
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

    anchor = source_state()
    for tag, payload in (("head", head), ("prev", prev)):
        payload.update(anchor)
        with open(
            os.path.join(REPO, "bench_runs", f"{prefix}_{tag}.json"), "w"
        ) as f:
            json.dump(payload, f)

    summary = summarize(head["queries"], prev["queries"])
    summary["vs_prior_bench"] = vs_prior_bench(head["queries"])
    print(json.dumps({"prev_ref": prev_ref, "sf_dir": sf_dir, **anchor, **summary}))
    return 0


def vs_prior_bench(
    hq: dict,
    head_kind: str = "single_run",
    exclude_round: int | None = None,
) -> dict | None:
    """Cross-round tripwire: HEAD timings (``hq``, FULL query names) vs
    the prior round, compared LIKE FOR LIKE (round-9 review — two fixes
    over the first r8-task-#7 cut):

    * a MIN numerator (``head_kind="min"``, the --tripwire path)
      compares against the prior round's ``r{N}_final_min.json`` —
      min-vs-min, the form that ends single-run adjudication;
    * a SINGLE-RUN numerator (the control path) compares against the
      prior round's single-run BENCH_r{N}.json — dividing one noisy
      run by a 5-run minimum systematically inflates every ratio and
      would MANUFACTURE the q15-style false trips the min artifact
      exists to kill;
    * ``exclude_round`` skips that round when resolving the prior —
      once this round's BENCH_r{N}.json is committed, the newest-BENCH
      heuristic would otherwise resolve the denominator to the SAME
      artifact passed as the numerator and read a vacuous 1.0.

    Every query over 2× is NAMED so a regression like round 6's t13
    cannot be adjudicated away as noise without an explicit decision;
    ``basis`` records which compare actually ran."""
    pb = prior_bench(exclude_round)
    if pb is None:
        return None
    fname, round_n, prior_q = pb
    pm = prior_final_min(round_n) if head_kind == "min" else None
    if pm is not None:
        prior_name, prior_min_q = pm
        head, prior = hq, prior_min_q
        basis = "min_vs_min"
    else:
        # bench.py's exact short-code mapping (stable '#N' suffixes on
        # collision) — a dict comprehension here silently kept only the
        # LAST colliding name, dropping rows from this tripwire (r7
        # ADVICE)
        from bench import short_code_timings

        head, prior = short_code_timings(hq), prior_q
        prior_name, basis = fname, f"{head_kind}_vs_single_run"
    ratios = {
        k: round(head[k] / prior[k], 3)
        for k in sorted(head)
        if k in prior and head[k] > 0 and prior[k] > 0
    }
    return {
        "prior_bench": prior_name,
        "basis": basis,
        "median_ratio": (
            round(statistics.median(ratios.values()), 3) if ratios else None
        ),
        "over_2x": {k: v for k, v in ratios.items() if v >= 2.0},
    }


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
