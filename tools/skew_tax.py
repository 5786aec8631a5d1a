"""Apples-to-apples skew-tax probe (round 11, VERDICT r10 task #5).

The r10 skew probe (bench_runs/r10_skew_probe.json) was confounded two
ways: its twin SHRANK the key universe (collapsing 90% of keys deletes
~90% of the hosts/users), and the uniform runs always went first/cold.
This probe removes both:

* the twin is the CARDINALITY-PRESERVED ``_skew_twin`` (every original
  distinct key keeps a row; the dominant key holds ~90% of rows), so
  graph/state sizes match the uniform table;
* per query the order INTERLEAVES — even-indexed queries run
  uniform-then-skew, odd-indexed skew-then-uniform — and each variant
  is timed twice with the min kept, so warm-ordering bias cannot
  masquerade as a skew effect in either direction.

The probed queries are the key-sensitive set (group/join/state keyed on
documents.source, events.user_id, or embeddings.label). Output: one
JSON blob (stdout + bench_runs/r11_skew_tax.json) with per-query
uniform/skew minima and the tax ratio; any ratio > 2 is a finding —
a reducer-skew surface AQE's skew-join handling did not absorb.

Usage:  python tools/skew_tax.py [sf_dir]     (default sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# group/join/state keys ride documents.source, events.user_id, or
# embeddings.label in these queries — the columns the twin skews
PROBED = [
    "t23_host_reputation",
    "g01_host_pagerank",
    "g03_host_pagerank_weighted",
    "x02_temperature_mix",
    "x05_stratified_sample",
    "q28_sessionize",
    "st05_stateful_user_counts",
    "s05_filtered_ann",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from tools.chaos_partitions import _skew_twin

    skew_dir = _skew_twin(sf_dir)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    qs = em.all_queries()
    # one untimed warm pass of the cheapest probe on BOTH datasets so
    # neither variant's first timed run pays session/scan cold-start
    for d in (sf_dir, skew_dir):
        qs["x05_stratified_sample"](spark, d).collect()

    def timed(name: str, d: str) -> float:
        best = float("inf")
        for _ in range(2):  # min-of-two per variant
            t0 = time.time()
            qs[name](spark, d).collect()
            best = min(best, time.time() - t0)
        return round(best, 2)

    out: dict[str, object] = {
        "probe": (
            "cardinality-preserved skew90 vs uniform, interleaved "
            f"order, min-of-two per variant, at {sf_dir}"
        ),
    }
    for i, name in enumerate(PROBED):
        order = ("uniform", "skew90") if i % 2 == 0 else ("skew90", "uniform")
        res: dict[str, float] = {}
        for variant in order:
            res[variant] = timed(name, sf_dir if variant == "uniform" else skew_dir)
        res["tax"] = round(res["skew90"] / max(res["uniform"], 1e-9), 2)
        res["order"] = "->".join(order)  # type: ignore[assignment]
        out[name] = res
        print(name, res, flush=True)
    taxed = [n for n in PROBED if out[n]["tax"] > 2.0]  # type: ignore[index]
    out["over_2x"] = taxed
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_runs",
        "r11_skew_tax.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({"over_2x": taxed, "wrote": path}))


if __name__ == "__main__":
    main()
