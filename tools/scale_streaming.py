"""Measured scaling for the stateful streaming family: st03 session
windows, st04 streaming dedup, st05 custom GroupState counts, st10
chained sliding distinct — wall time AND an exact correctness oracle
tracked together on replica-scaled event streams.

Corpus null model (the events twin of tools/scale_ann.py's rotated
mode): replica r shifts ``user_id`` by r·10⁶ and ``event_id`` by r·10⁹
and keeps ts/event_type/value/props byte-identical. Replicas therefore
add DISJOINT user populations with identical activity patterns in the
SAME time range — the honest stress for streaming state: every
watermark window gets k× the distinct keys (state size scales k×; the
time axis, and so the watermark/window structure, does not move).

That construction gives an exact scale oracle for free —
**k-equivariance**: because each replica's users are disjoint and
behave identically, every per-group count in these four queries at
scale k must equal EXACTLY k × its 1× value, over an identical key
set:

  * st03 — sessionization is per-user, so the session-size histogram's
    (n_sessions, n_users) both scale by k at every session_size;
  * st04 — (user, event_type) distinct pairs scale by k per event_type;
  * st05 — per-user running counts: k× the users at every n_events;
  * st10 — WAU per window scales by k over the same window set.

A bucketed/partial-agg shortcut that drops state on the floor, a
watermark that evicts live keys, or an update-mode row the reducer
miscounts all break equivariance — so this harness is a CORRECTNESS
gate at scales the DuckDB oracle never sees, not just a stopwatch.

Usage:
  python tools/scale_streaming.py [repeats] [scales] [queries]

Same session settings as bench.py (streaming queries pin their own
shuffle partitions internally). Output recorded at
bench_runs/r5_scale_streaming.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/events.parquet"
USER_OFFSET = 1_000_000
EVENT_OFFSET = 1_000_000_000
SCALES = (1, 3, 10)
ST_QUERIES = (
    "st03_session_window",
    "st04_streaming_dedup",
    "st05_stateful_user_counts",
    "st10_sliding_distinct_users",
)
# per query: (key columns, count columns that must scale exactly by k)
EQUIVARIANCE = {
    "st03_session_window": (("session_size",), ("n_sessions", "n_users")),
    "st04_streaming_dedup": (("event_type",), ("n_unique_users",)),
    "st05_stateful_user_counts": (("n_events",), ("n_users",)),
    "st10_sliding_distinct_users": (
        ("window_start", "window_end"),
        ("wau",),
    ),
}


def _corpus_dir(k: int) -> str:
    d = f"/tmp/scale_stream_{k}x"
    if os.path.isdir(d):
        return d
    t = pq.read_table(SRC)
    parts = []
    for r in range(k):
        parts.append(
            t.set_column(
                t.schema.get_field_index("event_id"),
                "event_id",
                pc.add(t.column("event_id"), r * EVENT_OFFSET),
            ).set_column(
                t.schema.get_field_index("user_id"),
                "user_id",
                pc.add(t.column("user_id"), r * USER_OFFSET),
            )
        )
    tmp = f"{d}.tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(pa.concat_tables(parts), os.path.join(tmp, "events.parquet"))
    os.replace(tmp, d)
    return d


def _keyed(rows, keys, counts):
    return {
        tuple(r[c] for c in keys): tuple(int(r[c]) for c in counts)
        for r in rows
    }


def _equivariance(name: str, base_rows, rows, k: int) -> str:
    keys, counts = EQUIVARIANCE[name]
    base, got = _keyed(base_rows, keys, counts), _keyed(rows, keys, counts)
    if set(base) != set(got):
        return (
            f"key-set mismatch: {len(base)} base vs {len(got)} at {k}x; "
            f"diff sample {sorted(set(base) ^ set(got))[:3]}"
        )
    bad = [
        (key, b, g)
        for key, b in base.items()
        for g in [got[key]]
        if tuple(v * k for v in b) != g
    ]
    if bad:
        key, b, g = bad[0]
        return f"{len(bad)} groups violate k-equivariance, e.g. {key}: {b}x{k} != {g}"
    return "exact"


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    scales = (
        [int(s) for s in sys.argv[2].split(",")] if len(sys.argv) > 2 else list(SCALES)
    )
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else list(ST_QUERIES)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from big_data_analytics_cse545_spark.session import get_spark

    spark = get_spark(
        app_name="scale_streaming",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.all_queries()

    base_rows: dict[str, list] = {}
    for k in scales:
        d = _corpus_dir(k)
        rows = pq.read_table(os.path.join(d, "events.parquet")).num_rows
        for name in names:
            secs, collected = [], None
            for _ in range(repeats):
                t0 = time.perf_counter()
                collected = qs[name](spark, d).collect()
                secs.append(round(time.perf_counter() - t0, 3))
            if k == min(scales) and min(scales) == 1:
                base_rows[name] = collected
            equiv = (
                _equivariance(name, base_rows[name], collected, k)
                if name in base_rows
                else "no 1x baseline in this invocation"
            )
            print(
                json.dumps(
                    {
                        "dir": d,
                        "scale": k,
                        "rows": rows,
                        "query": name,
                        "secs": secs,
                        "result_groups": len(collected),
                        "k_equivariance": equiv,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
