"""Measured scaling for d11 semantic dedup (SemDeDup-style).

d11's 100 TB argument (operators/dedup.py docstring) has two halves:
intra-cell pair work is O(N²/C) for C = 2^planes cells, and the
production knob is raising ``planes`` with log₂(corpus growth) so the
expected CELL SIZE — hence per-task pair work — stays constant. This
tool measures both halves on replica-scaled embeddings corpora:

  * k×: with planes FIXED, time should grow ~k² (the superlinear shape
    the docstring predicts — evidence the cost model is right);
  * k× with planes + ⌈log₂ k⌉: time should return to ~linear in k
    (evidence the documented mitigation works).

Corpus transform (the embeddings twin of tools/make_scale_documents.py's
null model): replica r applies a seeded ORTHOGONAL rotation Q_r to every
vector (Q_0 = I). Q_r a · Q_r b = a · b exactly, so each replica's
within-replica cosine structure is preserved to float precision, while
cross-replica pairs decorrelate to the random-direction baseline
(cos ~ N(0, 1/64): τ = 0.4 is ≈3.2σ, so a small chance-rate tail of
cross-replica hits is EXPECTED at these pair counts — each run reports
``cross_replica_drops`` so the rate is audited, not assumed). Note the
timing measurement does not depend on that rate at all: d11 evaluates
the cosine for EVERY intra-cell pair, so cost is pair count, which the
cell arithmetic fixes exactly. vec_ids shift by r·10⁹, keeping min-id
greedy retention order intact within replicas.

Usage:
  python tools/scale_semdedup.py [repeats]   # writes JSON lines to stdout

Same session settings as bench.py / tools/scale_bench.py.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/embeddings.parquet"
ID_OFFSET = 1_000_000_000


def _rotation(r: int, dim: int) -> np.ndarray:
    """Seeded orthogonal matrix for replica r (identity for r = 0)."""
    if r == 0:
        return np.eye(dim, dtype=np.float64)
    q, _ = np.linalg.qr(np.random.default_rng(r).standard_normal((dim, dim)))
    return q


def make_corpus(k: int, out_dir: str) -> int:
    """k orthogonally-rotated replicas of the sf0.1 embeddings table."""
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(SRC)
    ids = t.column("vec_id").to_numpy()
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    labels = t.column("label").to_numpy()
    parts = []
    for r in range(k):
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(ids + r * ID_OFFSET, pa.int64()),
                    "embedding": pa.array(
                        list(
                            (emb @ _rotation(r, emb.shape[1]).T).astype(
                                np.float32
                            )
                        ),
                        pa.list_(pa.float32()),
                    ),
                    "label": pa.array(labels, pa.int32()),
                }
            )
        )
    out = pa.concat_tables(parts)
    pq.write_table(out, os.path.join(out_dir, "embeddings.parquet"))
    return out.num_rows


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from big_data_analytics_cse545_spark.operators import dedup
    from big_data_analytics_cse545_spark.session import get_spark

    spark = get_spark(
        app_name="scale_semdedup",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")

    base_planes = dedup.SEMDEDUP_PLANES
    # (k, extra_planes, form): fixed-planes curve for the oracle form
    # (expected superlinear, ~k² in pair work) + the ⌈log₂ k⌉-mitigation
    # point at 10× (expected back to ~linear; 10× at FIXED planes is
    # ~100× pair work — the point of the curve is that you never run
    # that configuration), plus the BLAS api form (api.semantic_dedup)
    # at both 10× settings — including the 25 M-pair planes=4 point the
    # expression form cannot afford, which is the production-form
    # headline.
    configs = [
        (1, 0, "d11"),
        (2, 0, "d11"),
        (3, 0, "d11"),
        (5, 0, "d11"),
        (10, 4, "d11"),
        (10, 4, "api"),
        (10, 0, "api"),
    ]
    from big_data_analytics_cse545_spark import api

    dirs = {}
    for k, _, _ in configs:
        if k not in dirs:
            d = f"/tmp/scale_emb_{k}x"
            rows = make_corpus(k, d)
            dirs[k] = (d, rows)
    try:
        for run in range(repeats):
            for k, extra, form in configs:
                d, rows = dirs[k]
                dedup.SEMDEDUP_PLANES = base_planes + extra
                t0 = time.monotonic()
                if form == "api":
                    out = api.semantic_dedup(
                        spark.read.parquet(f"{d}/embeddings.parquet"),
                        "embedding",
                        "vec_id",
                        tau=dedup.SEMDEDUP_TAU,
                        planes=base_planes + extra,
                    )
                else:
                    out = dedup.d11_semantic_dedup(spark, d)
                # ONE action inside the timed window — separate
                # count()/where().count() calls would each re-execute
                # the whole job and the reported time would measure
                # multiple runs. cross-replica drops (dup_of and vec_id
                # in different replicas ⇒ the null model leaked a
                # candidate) ride the same pass.
                agg = out.selectExpr(
                    "count(*) AS total",
                    "sum(CAST(kept AS BIGINT)) AS kept",
                    f"sum(CAST(dup_of IS NOT NULL AND vec_id DIV {ID_OFFSET}"
                    f" <> dup_of DIV {ID_OFFSET} AS BIGINT)) AS n_cross",
                ).collect()[0]
                dt = time.monotonic() - t0
                total, kept, cross = agg["total"], agg["kept"], agg["n_cross"]
                print(
                    json.dumps(
                        {
                            "k": k,
                            "planes": base_planes + extra,
                            "form": form,
                            "rows": rows,
                            "sec": round(dt, 3),
                            "kept": kept,
                            "dropped": total - kept,
                            "cross_replica_drops": cross,
                            "run": run,
                        }
                    ),
                    flush=True,
                )
    finally:
        dedup.SEMDEDUP_PLANES = base_planes


if __name__ == "__main__":
    main()
