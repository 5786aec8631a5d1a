"""Per-query optimization probe (round-13 optimization pass, guide §1).

For each named query: build the DataFrame, dump `.explain("formatted")`
to plans/r13/<query>_<tag>.txt, then time R repeated `.collect()` runs
(the bench's timed action) and print min/median — the min is the
scheduling-noise-free estimate (the r3 "sum of minima" insight).

    python tools/profile_query.py <tag> <query> [query ...] [--runs N]

`<tag>` is `before` / `after` (the judge-facing plan artifacts) or any
scratch label. Eager-loop queries (p05/t24/...) are timed but their
explain is skipped per the plan_audit rationale (the returned DF is a
driver-built LocalTableScan; re-explaining would re-run training).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag, names = args[0], args[1:]

    import __spark_entry__ as em
    from big_data_analytics_cse545_spark.plans import explain_str
    from big_data_analytics_cse545_spark.session import get_spark

    spark = get_spark(
        app_name="profile-query",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.all_queries()
    os.makedirs(PLANS_DIR, exist_ok=True)

    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        walls = []
        for r in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.collect()
            walls.append(time.perf_counter() - t0)
            if r == 0 and not getattr(fn, "__eager_loop__", False):
                with open(
                    os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w"
                ) as fh:
                    fh.write(explain_str(df))
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: min {min(walls):.3f}s median {statistics.median(walls):.3f}s"
            f" runs {[round(w, 3) for w in walls]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
