"""Measured scaling for the ANN family (VERDICT r4 task #5): s03 IVF,
s05 filtered ANN, p07 PQ — wall time AND recall tracked together on
replica-scaled embedding corpora.

Corpus null model (the embeddings twin of tools/scale_semdedup.py):
replica r applies a seeded ORTHOGONAL rotation Q_r to every vector
(Q_0 = I), so within-replica cosine/euclidean structure is preserved to
float precision while cross-replica pairs decorrelate to the
random-direction baseline. Two deliberate differences from the d11
corpora:

  * labels: replica r gets ``label + r*10`` — the corpus gains CELLS as
    it gains rows (fresh shards/categories), which is the honest IVF
    posture: s03's probe count stays fixed at 2 while the cell count
    grows 10×, so the candidate FRACTION shrinks 10× and recall is
    genuinely at risk — exactly what this tool measures. (Reusing the
    0-9 labels would smear each IVF cell into 10 mutually-rotated
    sub-clusters and measure a corpus no one builds.)
  * vec_ids shift by r·10⁹, so the ``vec_id % 100 == 0`` query set
    scales with the corpus (s01-s05's documented scale-proportional
    query model).

TWO corpus modes, because recall is a property of data structure as
much as of the index:

  * ``rotated`` — replicas of the sf0.1 embeddings fixture, which is
    STRUCTURELESS (measured: mean same-label cosine 1.8e-5 vs
    cross-label 1.3e-5 — labels carry no geometry). This is the
    adversarial baseline: every bucketed ANN degrades toward its
    candidate fraction here, and the measured recalls quantify exactly
    that floor.
  * ``clustered`` — planted isotropic clusters in TWIN-LABEL pairs
    (unit-norm centers shared by labels 2j/2j+1, σ=0.05 per-dim noise →
    within- and twin-cluster cos ≈ 0.86), 10·k labels of 200 points at
    scale k: the corpus gains CELLS as it gains rows at constant
    per-cell density — the workload IVF/PQ are built for — and the
    twins keep s05's ``label != q_label`` predicate meaningful (its
    qualifying nearest neighbors are genuinely close twin-label points).
    The scale question is whether recall HOLDS as corpus and cell count
    grow 10× with the probe count fixed.

Ground truth is exact brute force in driver numpy (one BLAS matmul per
corpus — 200×20 000 at 10×, trivial), reproducing each operator's exact
ranking rule: round(cos, 6) desc + vec_id asc for s03/s05 (s05 adds the
label != q_label predicate BEFORE ranking), exact squared-euclidean asc
+ vec_id asc for p07. recall@k = |ANN top-k ∩ exact top-k| / k averaged
over queries.

Usage:
  python tools/scale_ann.py [repeats] [modes] [scales] [queries] [pq_rerank]
  # e.g. the p07 rerank sweep (explicit arg — the operator constant is
  # fixed; round-5 ADVICE removed the import-time env override):
  #   python tools/scale_ann.py 2 clustered 10 p07_pq_ann 512

Same session settings as bench.py so timings are comparable with
bench_runs/*.json. Output recorded at bench_runs/r5_scale_ann.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/embeddings.parquet"
ID_OFFSET = 1_000_000_000
LABEL_OFFSET = 10
QUERY_MOD = 100
K = 3
SCALES = (1, 3, 10)
ANN_QUERIES = (
    "s03_ann_ivf",
    "s05_filtered_ann",
    "p07_pq_ann",
    # round-5 addition: the single-table LSH and its OR-construction —
    # measured together so the 1 − (1 − r₁)^L recall-lift claim
    # (SCALE.md, s06) is a measurement, not a collision-model prediction.
    "s02_ann_hyperplane_lsh",
    "s06_ann_multitable_lsh",
)


def _rotation(r: int, dim: int) -> np.ndarray:
    """Seeded orthogonal matrix for replica r (identity for r = 0) —
    same construction as tools/scale_semdedup.py."""
    if r == 0:
        return np.eye(dim)
    rng = np.random.default_rng(777_000 + r)
    q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    return q


def _write_corpus(d: str, ids, labels, vecs) -> str:
    tmp = f"{d}.tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        os.path.join(tmp, "embeddings.parquet"),
    )
    os.replace(tmp, d)
    return d


def _corpus_dir(k: int, mode: str) -> str:
    d = f"/tmp/scale_ann_emb_{mode}_{k}x"
    if os.path.isdir(d):
        return d
    if mode == "rotated":
        t = pq.read_table(SRC)
        ids = t.column("vec_id").to_numpy()
        labels = t.column("label").to_numpy()
        x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        dim = x.shape[1]
        out_ids, out_labels, out_vecs = [], [], []
        for r in range(k):
            q = _rotation(r, dim)
            out_ids.append(ids + r * ID_OFFSET)
            out_labels.append(labels + r * LABEL_OFFSET)
            out_vecs.append((x @ q.T).astype(np.float32))
        return _write_corpus(
            d,
            np.concatenate(out_ids),
            np.concatenate(out_labels),
            np.concatenate(out_vecs),
        )
    # clustered: 10·k labels in TWIN PAIRS — labels 2j and 2j+1 share a
    # unit-norm center — 200 points per label, σ=0.05 per-dim noise
    # (within-cluster AND twin-cluster cosine ≈ 1/(1+64σ²) ≈ 0.86).
    # The twins make the label != q_label predicate meaningful: s05's
    # qualifying nearest neighbors are the GENUINELY CLOSE twin-label
    # points, not near-orthogonal strangers, so its recall measures the
    # LSH bucket's retrieval power instead of the data's lack of
    # structure. They also make s03's probe=2 load-bearing — the exact
    # top-3 straddles the twin cells, so both probes must hit.
    dim, per_cluster, sigma = 64, 200, 0.05
    n_clusters = 10 * k
    rng = np.random.default_rng(424_242)
    centers = rng.standard_normal(((n_clusters + 1) // 2, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    labels = np.repeat(np.arange(n_clusters, dtype=np.int64), per_cluster)
    pts = centers[labels // 2] + sigma * rng.standard_normal((len(labels), dim))
    ids = np.arange(len(labels), dtype=np.int64)
    return _write_corpus(d, ids, labels, pts.astype(np.float32))


def _ground_truth(data_dir: str):
    """Exact top-K per query under each operator's exact ranking rule.
    Returns {query_name: {q_id: [neighbor ids]}}."""
    t = pq.read_table(os.path.join(data_dir, "embeddings.parquet"))
    ids = t.column("vec_id").to_numpy()
    labels = t.column("label").to_numpy()
    # float32 storage → float64 math, matching load_table + cast chains
    x = np.array(t.column("embedding").to_pylist(), dtype=np.float32).astype(
        np.float64
    )
    qmask = ids % QUERY_MOD == 0
    qids, qx, qlab = ids[qmask], x[qmask], labels[qmask]
    norms = np.linalg.norm(x, axis=1)
    cos = np.round((qx / norms[qmask, None]) @ (x / norms[:, None]).T, 6)
    d2 = (
        (qx**2).sum(axis=1)[:, None]
        - 2.0 * qx @ x.T
        + (x**2).sum(axis=1)[None, :]
    )

    def topk(score, asc, extra_mask=None):
        out = {}
        for qi, qid in enumerate(qids):
            s = score[qi].copy()
            mask = ids == qid
            if extra_mask is not None:
                mask |= extra_mask[qi]
            s[mask] = np.inf if asc else -np.inf
            order = np.lexsort((ids, s if asc else -s))
            out[int(qid)] = [int(i) for i in ids[order[:K]]]
        return out

    same_label = labels[None, :] == qlab[:, None]
    unfiltered_cos = topk(cos, asc=False)
    return {
        "s03_ann_ivf": unfiltered_cos,
        "s05_filtered_ann": topk(cos, asc=False, extra_mask=same_label),
        "p07_pq_ann": topk(d2, asc=True),
        # s02/s06 share s03's exact ranking rule (round-6 cosine desc,
        # vec_id asc, unfiltered)
        "s02_ann_hyperplane_lsh": unfiltered_cos,
        "s06_ann_multitable_lsh": unfiltered_cos,
    }, len(qids)


def _recall(rows, gt: dict, qcol: str, ncol: str) -> float:
    got: dict[int, list[int]] = {}
    for r in rows:
        got.setdefault(int(r[qcol]), []).append(int(r[ncol]))
    hits = [
        len(set(got.get(q, [])) & set(exact)) / len(exact)
        for q, exact in gt.items()
    ]
    return round(float(np.mean(hits)), 4)


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    modes = sys.argv[2].split(",") if len(sys.argv) > 2 else ["clustered", "rotated"]
    scales = (
        [int(s) for s in sys.argv[3].split(",")] if len(sys.argv) > 3 else SCALES
    )
    names_arg = sys.argv[4].split(",") if len(sys.argv) > 4 else list(ANN_QUERIES)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from big_data_analytics_cse545_spark.operators import projection
    from big_data_analytics_cse545_spark.session import get_spark

    pq_rerank = int(sys.argv[5]) if len(sys.argv) > 5 else projection.PQ_RERANK

    spark = get_spark(
        app_name="scale_ann",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.all_queries()
    if pq_rerank != projection.PQ_RERANK:
        # sweep override rides the explicit keyword, never the module
        # constant, so driver-facing results can't inherit it
        qs["p07_pq_ann"] = lambda s, d: projection.p07_pq_ann(
            s, d, rerank=pq_rerank
        )

    for mode in modes:
        for k in scales:
            d = _corpus_dir(k, mode)
            gt, nq = _ground_truth(d)
            rows = pq.read_table(os.path.join(d, "embeddings.parquet")).num_rows
            qs[names_arg[0]](spark, d).collect()  # warm codegen/classload
            for name in names_arg:
                secs, collected = [], None
                for _ in range(repeats):
                    t0 = time.perf_counter()
                    collected = qs[name](spark, d).collect()
                    secs.append(round(time.perf_counter() - t0, 3))
                qcol, ncol = (
                    ("query_id", "neighbor_id")
                    if name == "p07_pq_ann"
                    else ("q_id", "neighbor_id")
                )
                print(
                    json.dumps(
                        {
                            "dir": d,
                            "mode": mode,
                            "scale": k,
                            "rows": rows,
                            "n_queries": nq,
                            "query": name,
                            "secs": secs,
                            "recall_at_k": _recall(
                                collected, gt[name], qcol, ncol
                            ),
                            "k": K,
                            **(
                                {"pq_rerank": pq_rerank}
                                if name == "p07_pq_ann"
                                else {}
                            ),
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
