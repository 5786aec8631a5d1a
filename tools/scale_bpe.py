"""BPE-trainer scaling probe: jobs/merge and wall-clock vs vocabulary
size (round-8 VERDICT task #3 — "answer the 30k-merge question").

t24's contract K=12 costs ~2 Spark jobs per merge (one pair-count
argmax collect materializes the previous round's fold); a production
tokenizer build runs 30k+ merges, where Θ(n_merges) jobs AND lineage
depth become the driver bottleneck. ``train_bpe(batch_m=M)`` is the
batched path (maximal symbol-disjoint prefix per round); this tool
measures both paths at a k×-scale documents corpus
(tools/make_scale_documents.py) and emits one JSON line per cell:

  {"corpus": dir, "n_merges": K, "batch_m": M, "sec": s,
   "merges": n, "rounds": r, "jobs": j, "jobs_per_merge": x}

``rounds``/``jobs`` come from grouping the run under a Spark job group
and asking the status tracker — public API, no listener plumbing.

Usage:
  python tools/scale_bpe.py <data_dir> <K:M> [<K:M> ...]
  e.g. python tools/scale_bpe.py /tmp/x10 12:1 12:64 256:1 256:64 1024:64

Same session settings as bench.py (local[32], 64 shuffle partitions).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    data_dir = sys.argv[1]
    cells = [tuple(int(v) for v in a.split(":")) for a in sys.argv[2:]]

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from big_data_analytics_cse545_spark.operators.text import train_bpe
    from big_data_analytics_cse545_spark.session import get_spark
    from big_data_analytics_cse545_spark.sources import load_table

    # the status tracker only remembers spark.ui.retainedJobs job ids
    # (default 1000) — a 30k-merge sequential cell is ~60k jobs, so the
    # default silently under-reports jobs_per_merge ~60× at exactly the
    # scale this tool exists to measure (round-9 review). Raise the
    # retention AND guard the readout below.
    retained_jobs = 500_000
    spark = get_spark(
        app_name="scale_bpe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
        ),
        extra_conf={
            "spark.ui.retainedJobs": str(retained_jobs),
            # bound the superseded-checkpoint float on very long loops
            # (train_bpe's state-discipline note)
            "spark.cleaner.periodicGC.interval": "1min",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    docs = load_table(spark, data_dir, "documents")
    # warmup: word-freq agg + one tiny train so codegen/classloading
    # costs don't land on the first timed cell
    train_bpe(docs, n_merges=2).count()

    for n_merges, batch_m in cells:
        group = f"bpe-{n_merges}-{batch_m}-{time.monotonic_ns()}"
        sc.setJobGroup(group, "scale_bpe cell")
        t0 = time.perf_counter()
        table = train_bpe(docs, n_merges=n_merges, batch_m=batch_m).collect()
        sec = round(time.perf_counter() - t0, 2)
        sc.setJobGroup("idle", "between cells")
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        steps = {r["step"] for r in table}
        out = {
            "corpus": data_dir,
            "n_merges": n_merges,
            "batch_m": batch_m,
            "sec": sec,
            "merges": len(table),
            "jobs": jobs,
            "jobs_per_merge": round(jobs / max(len(table), 1), 3),
        }
        if jobs >= retained_jobs * 0.8:
            # near the retention ceiling: the count is a floor, not a
            # measurement — say so in the artifact instead of letting a
            # silently-truncated number land in SCALE.md
            out["jobs_lower_bound_only"] = True
        assert steps == set(range(1, len(table) + 1)), "step numbering hole"
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
