"""Same-boot paired A/B of the streaming state-store provider
(round-13, r12 VERDICT item 3): HDFS-backed (Spark's default) vs
RocksDB for the stateful streaming rows — st06/st08 are the two most
expensive (stream-stream joins: 4 state stores × 8 partitions + the
chained agg; state-store commits dominate their per-batch breakdown).

    python tools/ab_statestore.py [--runs N] [query ...]

Runs each query ``N`` times per arm in ONE session, strictly
alternating arms (hdfs, rocksdb, hdfs, ...) so boot/GC drift hits both
arms equally; prints per-arm min/median (min is the scheduling-noise-
free estimate — the r3 "sum of minima" discipline). The provider conf
is read at stream-query START, so setting it between runs is the whole
switch; it is restored afterwards. Result-parity is asserted on every
run pair — a provider can change timings, never rows.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
ARMS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


def main() -> None:
    args = list(sys.argv[1:])
    runs = 4
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args or ["st06_stream_stream_join", "st08_stream_outer_join"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as em
    from big_data_analytics_cse545_spark.session import get_spark

    spark = get_spark(
        app_name="ab-statestore",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.all_queries()
    prev = spark.conf.get(PROVIDER_KEY, None)

    try:
        for name in names:
            fn = qs[name]
            walls: dict[str, list[float]] = {a: [] for a in ARMS}
            rows: dict[str, list] = {}
            # one untimed warmup per query (codegen/classload) on the
            # default arm, then strict ABAB alternation
            spark.conf.set(PROVIDER_KEY, ARMS["hdfs"])
            fn(spark, sf_dir).collect()
            for r in range(runs):
                for arm, provider in ARMS.items():
                    spark.conf.set(PROVIDER_KEY, provider)
                    spark.sparkContext.setJobDescription(
                        f"ab-statestore:{name}:{arm}:{r}"
                    )
                    t0 = time.perf_counter()
                    got = fn(spark, sf_dir).collect()
                    walls[arm].append(time.perf_counter() - t0)
                    rows.setdefault(arm, got)
                    assert got == rows[arm], f"{name}/{arm} rows drifted"
            assert rows["hdfs"] == rows["rocksdb"], f"{name}: arm rows differ"
            spark.sparkContext.setJobDescription(None)
            for arm in ARMS:
                w = walls[arm]
                print(
                    f"{name} [{arm}]: min {min(w):.3f}s median "
                    f"{statistics.median(w):.3f}s runs {[round(x, 3) for x in w]}",
                    flush=True,
                )
    finally:
        if prev is None:
            spark.conf.unset(PROVIDER_KEY)
        else:
            spark.conf.set(PROVIDER_KEY, prev)


if __name__ == "__main__":
    main()
