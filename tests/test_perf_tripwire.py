"""Per-round perf tripwire (VERDICT r6 task #8): the three historically
hottest queries run in ONE fresh subprocess (fresh JVM + fresh Catalyst
state — the bench's conditions) and each must finish within a generous
3× of a recorded floor.

This is NOT a bench replacement — floors are deliberately loose so host
scheduling noise never trips it — it exists so an expression-level
regression (round 6: a shared n-gram builder ~8× slower on t13's
aggregation than the form it replaced) cannot reach the driver bench
unnoticed by pytest.

Two lessons are baked into the probe:

* it collect()s, never count()s — count() lets Catalyst prune
  unreferenced subtrees (t13's whole bigram aggregation vanishes under
  unique-key left-join elimination), so a count-based probe measures an
  empty shell of the query;
* t13 probes at sf0.1: its historical failure mode is per-element
  expression cost over the token mass, which at sf0.01 (~27k tokens)
  hides inside fixed overhead — the round-6 regression measures ~2.7s
  vs a 1.4s floor there, but 19s vs 2.3s at sf0.1. Mutation-checked:
  re-introducing the round-6 sequence/element_at builder trips exactly
  the t13 row.

Floors recorded round 7 on this box (fresh subprocess, sequential, so
later queries run warm); s06 added round 8 (VERDICT r7 task #7) to
cover the ANN/similarity family. Its mutation check needed a SOURCE
edit (N_PLANES is captured as a def-time default arg — monkeypatching
the module constant is a silent no-op): collapsing the bucket space
16-32× (N_PLANES 6 → 2 or 1) reads 7.6-8.0s vs the 2.9s floor at
sf0.1, a ~2.7x ceiling — exact scoring saturates there at this corpus
— hence s06 carries a tighter per-query factor (2.4x, trip at 7.2s;
the noisiest r7 final read 3.1s, so 2.3x headroom over real noise).
p07 was evaluated and rejected: its sf0.01 AND sf0.1 walls are fixed
overhead (query set is bounded), flat under kernel-chunk and
rerank-size mutations — a p07 floor would be a dead tripwire.

g01 + t24 added round 9 (VERDICT r8 task #4 — the round-8 newcomers
were the suite's two heaviest queries and carried no floor):

* t24 probes at a 10×-sf0.1 documents corpus (manufactured once per
  source digest by tools/make_scale_documents.py — ~1.6s, 50k rows),
  NOT at sf0.1: its historical failure modes scale with corpus mass
  (the r8 swap-first cache ordering replayed the whole fold chain
  from the corpus — 28.5s vs the 10.5s floor at 10×, 2.72×, trips
  the 2.4× factor, but only 1.28× at sf0.1). Round 9 replaced the
  persist/release-one-behind loop with per-round
  localCheckpoint(eager=False), which rules the swap-first class out
  BY CONSTRUCTION (a parent's deps are cleared only when the child
  checkpoint materializes) and fixes the superlinear plan-growth
  OOM at production merge counts (train_bpe docstring); the current
  code reads 7.4s at 10× (floor holds unchanged). Like g01, the
  checkpoint-removal mutation is FASTER at this scale (4.2s — per-
  round materialization only pays beyond ~32 merges, where the
  no-truncation variant measured 54.6s at 32 merges on sf0.01 and
  OOMs beyond; that regime is pinned by the K=32 batched golden in
  tests/test_text.py), so t24's floor guards the t13 class: an
  expression regression in the corpus agg, the pair-count shuffle,
  or the fold kernel lands directly on its wall.
* g01 carries the standard 3× factor at sf0.1 (floor 7.0; five
  baseline readings 6.7-7.2s). Mutations evaluated: REMOVING the
  edge/node caches reads FASTER at sf0.1 (6.3s vs 7.1 — the persist
  pays only when the corpus-sized edge derivation is expensive, i.e.
  at scale; it is a 100 TB design choice, not a local-perf one), and
  host-relation plan slips are per-job-overhead-bound at this corpus
  — so g01's floor guards the t13 class (an expression regression in
  the corpus-sized hosted/edge derivation or the 6-iteration
  join/agg chain lands directly on its wall), not the cache contract.

g02 + p08 + m04 added round 10 (VERDICT r9 tasks #2 and #7):

* g02 shares g01's kernel (graph.trustrank_micro — g01 IS its
  all-seeds special case), so g01's mutation analysis transfers
  verbatim; its floor (4.5; probe readings 3.65-4.28) guards the
  same corpus-derivation/iteration-chain expression class on the
  seeded path, which g01's floor does not execute (seed semi-join +
  per-seed normalization).
* p08's floor (3.5; probe readings 3.24-3.43) guards the driver-loop
  class its eager Lloyd iteration is prone to: a plan-depth or
  expression regression in the fused assignment+partials pass lands
  directly on its wall ×4 iterations. Mutation evaluated: dropping
  the quantized relation's persist reads 4.24s vs ~3.3 (1.3× — like
  g01's caches, the persist is a 100 TB design choice at this corpus,
  so the floor guards the expression class, not the cache contract).
* m04's floor (2.5, probe readings 2.28-2.30s) pins the round-10
  diagnosis of its r5-r9 bench spread ([2.61, 14.62] in
  r9_final_min.json; SCALE.md "m04 spread"): the structural term was
  the session's FIRST-mapInPandas worker spawn amplified by 16 empty
  tasks (spark.range default = 32 partitions for 16 clips), fixed by
  pinning audios_df's range to n_clips partitions. Mutation
  evaluated: reverting the pin reads 3.68s vs 2.3 in the probe
  (1.6× — under the trip factor on a quiet host BY DESIGN; the empty
  tasks only storm under host load, which a pytest floor must not
  key on). The floor guards the steady-state kernel: an expression
  regression in the frame fan-out/feature math or a worker-reuse
  break lands directly on its 3× wall, where pre-fix cold readings
  (7.0s) already sat.

Round 11 (VERDICT r10 tasks #2 and #7):

* The probe now WARMS the Python workers (one no-op mapInPandas over
  32 partitions, untimed) before the timing loop: m04's 7.5s trip line
  breached in BOTH of the judge's full-suite runs (7.62s/8.64s) while
  passing standalone at 2.3s — the breach was the session-first worker
  spawn storming under host load, a term the round-10 diagnosis says
  the floor must NOT key on. With the spawn paid untimed, m04 reads
  0.59-0.65s quiet and 0.98s on a deliberately loaded box (a full
  bench running concurrently) — ~8x headroom in exactly the regime
  that used to red. The floor/factor stay 2.5/3.0: it still guards the
  steady-state kernel (the 1.6x partition-pin revert now reads as pure
  kernel time), and every other floor only gains headroom (warm
  workers make nothing slower).
* g03 enters at floor 5.0/3.0 (probe readings 4.5-4.89 quiet, 5.74
  loaded). It shares g01/g02's kernel (graph.trustrank_micro), so
  g01's mutation analysis transfers verbatim; what its floor UNIQUELY
  executes is the weighted edge derivation — the groupBy-COUNT over
  the per-document link multiset plus the outw re-join
  (host_link_graph_weighted), which the distinct-edge path of g01/g02
  never runs — plus the plan-time overflow guard's two aggregates. An
  expression regression in either lands directly on its wall ×6
  iterations.
* f08 enters at floor 5.0/3.0 (probe readings 4.84-5.36 — first-use
  fixture-ensure + DataSource registration + cold scan; warm rescans
  read 0.9s). The floor guards the scan path's two load-bearing
  choices, both mutation-measured at sf0.1: scheduling one BLOCK per
  task instead of byte-targeted runs reads 6.6s vs 0.94s warm (7x,
  pure scheduler overhead — the avro_source docstring's 256-record
  measurement reproduced), and a per-row/per-value decode regression
  lands on the same wall (the codec is the task body). Single
  partition-per-shard reads 1.07s here — parallelism loss only bites
  at estate block counts, so the floor guards the decode/run-sizing
  class, not the split count.
* Round-11 full-suite validation red-flagged the NEXT zero-headroom
  floor: run 1 of the suite was fully green (377 passed — the m04 fix
  held), run 2 tripped the wire. Post-hoc the walls were
  unrecoverable (only pytest's one-line FAILED survived), so three
  changes landed together: (1) every probe now appends its walls +
  os.getloadavg() to /tmp/spark_graft_tripwire_probes.jsonl, making
  any future red adjudicable from the artifact; (2) the
  confirm-on-breach rerun COOLS DOWN 30s first — in a full-suite run
  the breach and an immediate rerun sit in the same transient storm
  (the prior session's shutdown/GC tail), so min-of-two never got an
  independent sample; (3) p08's factor is 4.5 (trip 15.75): it was
  the tightest floor in the loaded regime — measured 10.48s vs its
  old 10.5s trip line with a full bench running concurrently (quiet
  readings 3.4-4.1s; an eager 4-iteration driver loop multiplies
  host-load stalls into its wall like no declarative query does).
  The p08 persist-drop mutation reads 1.3x quiet, so the raised
  factor still trips the plan-depth/expression class it guards (the
  r9 swap-first class read 2.7-3x).
* Run 3 (with the cooldown + log in place) tripped AGAIN — and the
  log made it adjudicable at last: under one-minute loadavg 6.1 every
  floor inflated 2-7x SIMULTANEOUSLY (d03 38.2s, d08 46.5s, m04
  15.2s, p08 24.0s), the cooldown probe drained most of it, and d08
  landed 0.85s over its line (23.35 vs 22.5). A uniform inflation is
  definitionally NOT the class this wire guards — so breaches are now
  judged after dividing each wall by the probe's median wall/floor
  ratio (``_breaches``; clamped at ≥1 so quiet probes are
  unchanged). Single-query regressions still trip — they move their
  own ratio, not the median (the s06 N_PLANES collapse reads ratio
  ~2.5 against a ~0.8 median) — while whole-probe storms cancel
  exactly. Run 3's both probes re-judged under this rule: zero
  breaches (unit-pinned below with the recorded walls). Global
  many-query regressions remain the bench control's gate.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DOCS_X10 = "DOCS_X10"  # resolved to the manufactured 10× corpus dir


def _docs_x10_dir() -> str:
    """The 10×-sf0.1 documents fixture dir, manufactured once per
    source digest (atomic via ensure_fixture_dir; digest-keyed so a
    rewritten source corpus re-materializes instead of reusing stale
    rows, and stale siblings are pruned)."""
    from big_data_analytics_cse545_spark.sources.fixtures import (
        ensure_fixture_dir,
    )

    src = "/root/testdata/sf0.1/documents.parquet"
    st = os.stat(src)
    digest = hashlib.md5(
        f"{src}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]

    def write(tmp: str) -> None:
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "make_scale_documents.py"),
                "10",
                tmp,
            ],
            check=True,
            capture_output=True,
        )

    return ensure_fixture_dir(
        f"graft_docs_x10_{digest}",
        write,
        prune_prefix="graft_docs_x10_",
        prune_re=r"graft_docs_x10_[0-9a-f]{12}",
    )


# query -> (sf_dir, recorded floor seconds, trip factor)
FLOORS = {
    "d03_minhash_lsh_dedup": ("/root/testdata/sf0.01", 12.5, 3.0),
    "d08_dup_clusters": ("/root/testdata/sf0.01", 7.5, 3.0),
    "f08_avro_scan": ("/root/testdata/sf0.1", 5.0, 3.0),
    "g01_host_pagerank": ("/root/testdata/sf0.1", 7.0, 3.0),
    "g02_host_trustrank": ("/root/testdata/sf0.1", 4.5, 3.0),
    "g03_host_pagerank_weighted": ("/root/testdata/sf0.1", 5.0, 3.0),
    "m04_audio_feature_profile": ("/root/testdata/sf0.1", 2.5, 3.0),
    "p08_kmeans_trace": ("/root/testdata/sf0.1", 3.5, 4.5),
    "s06_ann_multitable_lsh": ("/root/testdata/sf0.1", 3.0, 2.4),
    "t13_repetition_filter": ("/root/testdata/sf0.1", 4.0, 3.0),
    "t24_bpe_train": (_DOCS_X10, 10.5, 2.4),
    # round-12 newcomer (the standing newcomer-floor rule): floor from
    # two quiet fresh-JVM calibration probes through the train-once
    # fixture cache — 1.8 s and 2.1 s at loadavg ~5-6 (probe log
    # /tmp/spark_graft_tripwire_probes.jsonl) — in the regime every
    # post-r12 invocation runs in (the
    # probe warms the fixture untimed below, so the floor guards the
    # ENCODE kernel, not the one-time train+save materialization).
    # Mutation analysis (r11's measured 20x regime class): flipping the
    # registry encode to mode="expr" read 34.5-36.1 s at sf0.1 (r11
    # finals) vs the ~3 s arrow wall — an 11x ratio against this trip
    # line, caught outright; removing the per-worker word memo is the
    # same class (encode cost becomes per-occurrence).
    "t25_bpe_encode": ("/root/testdata/sf0.1", 3.2, 3.0),
}

# Queries whose registry path materializes a train-once fixture on
# first use (t25's digest-keyed merge-table cache): the probe runs
# them once UNTIMED before the timing loop, the warm-worker precedent
# — their floors are recorded in (and guard) the warm-cache regime.
WARM_FIRST = {"t25_bpe_encode"}

_PROBE = """
import json, time
from big_data_analytics_cse545_spark.session import get_spark
import __spark_entry__ as E
spark = get_spark()
# Warm the Python workers with one no-op mapInPandas across all cores
# BEFORE timing anything (r10 VERDICT #2): the session's FIRST
# mapInPandas pays the worker spawn, which storms under host load (the
# exact regime a full pytest suite creates) — it breached m04's floor
# twice in the judge's full-suite runs while passing standalone. The
# floors guard expression/plan regressions in the KERNELS, not the
# one-time spawn, so the spawn is paid here, untimed (~5 s).
spark.range(64, numPartitions=32).mapInPandas(lambda it: it, "id long").collect()
qs = E.all_queries()
# untimed fixture warm (WARM_FIRST): train-once caches materialize
# here so the timed loop measures the steady-state kernel
for name, sf_dir in %(warm)s:
    qs[name](spark, sf_dir).collect()
out = {}
for name, sf_dir in %(plan)s:
    t0 = time.time()
    qs[name](spark, sf_dir).collect()
    out[name] = time.time() - t0
print("TRIPWIRE " + json.dumps(out))
"""


def _run_probe(plan):
    warm = [(n, d) for n, d in plan if n in WARM_FIRST]
    probe = _PROBE % {"plan": json.dumps(plan), "warm": json.dumps(warm)}
    try:
        res = subprocess.run(
            [sys.executable, "-c", probe],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=300,
        )
    except subprocess.TimeoutExpired:
        # r11 run-5 red: under one-minute loadavg ~10 the probe JVM sat
        # at "(0 + 0) / 32" — NOT ONE task scheduled in 300s, pure
        # executor starvation against the suite's live local[32]
        # session, with walls never measured. One cooled-down retry
        # with a longer leash; a SECOND timeout fails the test (an
        # engine that genuinely hangs must still be caught).
        time.sleep(60)
        res = subprocess.run(
            [sys.executable, "-c", probe],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=420,
        )
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("TRIPWIRE ")]
    assert line, res.stdout[-2000:]
    walls = json.loads(line[-1].removeprefix("TRIPWIRE "))
    # append every probe's walls + the host load to a log so a red
    # full-suite run is adjudicable POST-HOC (the r11 run-2 failure
    # left only 'FAILED' in the captured tail — which floor breached,
    # and under what load, was unrecoverable)
    try:
        with open("/tmp/spark_graft_tripwire_probes.jsonl", "a") as fh:
            fh.write(json.dumps(
                {"loadavg": os.getloadavg(), "walls": walls}
            ) + "\n")
    except OSError:
        pass
    return walls


def _plan():
    dirs = {_DOCS_X10: _docs_x10_dir()}
    return [
        (name, dirs.get(FLOORS[name][0], FLOORS[name][0]))
        for name in sorted(FLOORS)
    ]


def _breaches(walls):
    """Queries over their trip line AFTER storm normalization. The
    tripwire guards SINGLE-QUERY expression/plan regressions — a code
    regression moves one query's wall/floor ratio while its peers'
    stay put, whereas a host storm inflates EVERY ratio at once
    (round-11 probe log: under one-minute loadavg 6.1, all eleven
    probes read 2-7x their floors simultaneously — d03 38.2s, d08
    46.5s, m04 15.2s — then drained together). Dividing each wall by
    the probe's MEDIAN wall/floor ratio (clamped at ≥1 so a fast quiet
    probe never tightens the lines) cancels the uniform term exactly
    and leaves the per-query term the floors were recorded to guard;
    the quiet-calibration medians read 0.55-0.9, so quiet-box behavior
    (and every mutation-check reading in this file's analyses) is
    unchanged. A regression hitting MANY queries at once would read as
    storm and pass here — that class is global, and the bench control
    (tools/bench_control.py) is its gate."""
    import statistics

    # judge only the floors PRESENT in this probe: recorded probes
    # from earlier rounds predate later-added floors (t25 entered
    # round 12), and faking readings into historical data would make
    # the regression tests of this rule meaningless
    present = {n: f for n, f in FLOORS.items() if n in walls}
    storm = max(
        1.0,
        statistics.median(
            walls[n] / floor for n, (_, floor, _) in present.items()
        ),
    )
    return {
        name: (round(walls[name], 2), round(storm, 2))
        for name, (_, floor, factor) in present.items()
        if walls[name] / storm > factor * floor
    }


def test_hot_queries_stay_within_factor_of_recorded_floor(spark):
    # quiesce the suite's live session-scoped local[32] JVM before
    # probing: drop its cached relations so the fresh probe JVM is not
    # competing with a hot block manager for the same 32 cores (later
    # tests re-persist on demand — swap_cached is reentrant)
    spark.catalog.clearCache()
    walls = _run_probe(_plan())
    first = _breaches(walls)
    if first:
        # confirm-on-breach (min of two independent probes): a one-off
        # GC/scheduling hiccup can land on any single reading — the r8
        # control saw an UNCHANGED query read 8.9x once and 1.1x on the
        # re-run — while a real expression/plan regression reproduces.
        # The rerun keeps the FULL sorted plan, not just the breached
        # queries: floors were recorded in this warmup shape, and a
        # breached query rerun alone would execute cold-first-in-session
        # (2.4-5.6x inflation on comparable queries, SCALE.md), biasing
        # the rerun toward re-confirming a spurious breach. COOL DOWN
        # first (r11 run-2 lesson): in a full-suite run the breach and
        # the immediate rerun sit in the SAME transient storm (the
        # prior session's shutdown/GC tail) — the pause lets it drain
        # so the confirm probe measures the code, not the storm.
        time.sleep(30)
        rerun = _run_probe(_plan())
        second = _breaches(rerun)
        breaches = {n: (first[n], second[n]) for n in first if n in second}
        assert not breaches, (
            f"perf tripwire: {breaches} ((wall, storm_factor) per probe) "
            f"exceeded their per-query trip factor over the recorded "
            f"floors {FLOORS} in BOTH of two independent storm-normalized "
            "probes — an expression/plan regression is reaching the "
            "bench; A/B it with tools/bench_control.py before shipping "
            "(per-probe walls + loadavg: "
            "/tmp/spark_graft_tripwire_probes.jsonl)"
        )


def test_storm_normalization_on_recorded_probes():
    """_breaches pinned against three RECORDED probes: the round-11
    run-3 storm pair (every floor inflated together; the old rule
    tripped on d08 and cost a full-suite red) must judge clean in both
    probes, and a synthetic single-query regression on an otherwise
    quiet probe must still trip exactly that query."""
    storm1 = {  # run-3 probe 1, loadavg 6.1
        "d03_minhash_lsh_dedup": 38.2, "d08_dup_clusters": 46.5,
        "f08_avro_scan": 13.0, "g01_host_pagerank": 13.4,
        "g02_host_trustrank": 7.1, "g03_host_pagerank_weighted": 12.9,
        "m04_audio_feature_profile": 15.2, "p08_kmeans_trace": 24.0,
        "s06_ann_multitable_lsh": 9.7, "t13_repetition_filter": 6.0,
        "t24_bpe_train": 10.1,
    }
    storm2 = {  # run-3 confirm probe after the cooldown, loadavg 7.2
        "d03_minhash_lsh_dedup": 33.2, "d08_dup_clusters": 23.4,
        "f08_avro_scan": 10.3, "g01_host_pagerank": 9.4,
        "g02_host_trustrank": 4.7, "g03_host_pagerank_weighted": 5.8,
        "m04_audio_feature_profile": 5.8, "p08_kmeans_trace": 12.6,
        "s06_ann_multitable_lsh": 3.6, "t13_repetition_filter": 3.3,
        "t24_bpe_train": 6.7,
    }
    quiet = {  # this round's quiet calibration probe, loadavg 3.9
        "d03_minhash_lsh_dedup": 7.1, "d08_dup_clusters": 5.4,
        "f08_avro_scan": 4.4, "g01_host_pagerank": 6.1,
        "g02_host_trustrank": 3.8, "g03_host_pagerank_weighted": 5.1,
        "m04_audio_feature_profile": 0.7, "p08_kmeans_trace": 4.0,
        "s06_ann_multitable_lsh": 2.9, "t13_repetition_filter": 2.3,
        "t24_bpe_train": 4.5,
    }
    assert _breaches(storm1) == {}
    assert _breaches(storm2) == {}
    assert _breaches(quiet) == {}
    # the r8 s06 mutation class on a quiet box: ~2.6x its floor while
    # the median stays sub-1 — must trip s06 and ONLY s06
    regressed = dict(quiet, s06_ann_multitable_lsh=7.8)
    assert set(_breaches(regressed)) == {"s06_ann_multitable_lsh"}
