"""Scaling bench: time a named query subset at one data directory.

Companion to tools/make_scale_documents.py — runs the five most
expensive registry queries (the SCALE.md scaling-table subjects) against
a given documents directory and emits one JSON line per run:

  {"dir": ..., "rows": N, "queries": {name: sec, ...}, "run": i}

Usage:
  python tools/scale_bench.py <data_dir> [n_repeats] [q1,q2,...]

Same session settings as bench.py (local[32], 64 shuffle partitions)
so numbers are directly comparable with bench_runs/*.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

QUERIES = [
    "d03_minhash_lsh_dedup",
    "d08_dup_clusters",
    "d10_incremental_dedup",
    "t13_repetition_filter",
    "x06_leakage_safe_split",
]


def main() -> None:
    data_dir = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else QUERIES

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from big_data_analytics_cse545_spark.session import get_spark

    spark = get_spark(
        app_name="scale_bench",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.all_queries()

    rows = spark.read.parquet(os.path.join(data_dir, "documents.parquet")).count()
    # warmup: run the cheapest subject once so codegen/classloading costs
    # don't land on the first timed query
    qs[names[0]](spark, data_dir).collect()

    for run in range(repeats):
        timings: dict[str, float] = {}
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, data_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        print(
            json.dumps(
                {"dir": data_dir, "rows": rows, "queries": timings, "run": run}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
