"""Manufacture a ``documents`` table with a DEEP BPE merge horizon.

Round-10 VERDICT task #3: the batched-BPE jobs/merge budget (SCALE.md,
round 9) was measured only to 394 real merges — both 1024-merge cells
terminated at vocabulary exhaustion, because the sf0.1 synthetic text
(and its xr-suffixed k× replicas) carries too few DISTINCT words: BPE
stops when every distinct word has fused into one symbol, and the
merge horizon is bounded by the vocabulary's internal substring
structure, not by corpus mass. The 30k-merge budget was therefore an
extrapolation from jobs/merge at <=394 merges.

This tool generates a corpus whose merge horizon exceeds any K we
measure (>=2k): ``n_words`` distinct pseudo-random lowercase words
(lengths 6-14, seeded — fully deterministic), drawn Zipf-weighted into
``n_docs`` documents so pair counts are heavy-tailed and every round's
argmax is meaningful rather than a tie-break lottery. Random words
share little substring structure, so full exhaustion needs roughly
sum(len(w)-1) ~ 9*n_words merges — a 4000-word pool sustains ~30k+,
comfortably past any measured K. Schema matches the testdata
``documents`` table (doc_id, text, lang, source, n_chars) so
tools/scale_bpe.py reads it unchanged via load_table.

Usage: python tools/make_deepmerge_documents.py <out_dir> [n_words n_docs]
Output: <out_dir>/documents.parquet
"""

from __future__ import annotations

import os
import string
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WORDS_PER_DOC = 100
SEED = 545


def make_pool(rng: np.random.Generator, n_words: int) -> list[str]:
    letters = np.array(list(string.ascii_lowercase))
    pool: set[str] = set()
    while len(pool) < n_words:
        length = int(rng.integers(6, 15))
        pool.add("".join(rng.choice(letters, size=length)))
    return sorted(pool)  # sorted → order independent of set iteration


def main() -> None:
    out_dir = sys.argv[1]
    n_words = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 5000
    rng = np.random.default_rng(SEED)
    pool = np.array(make_pool(rng, n_words))
    # Zipf-ish weights over a RANDOM permutation of the pool (rank must
    # not correlate with lexicographic order, which the argmax tie-break
    # uses) — heavy-tailed pair counts, every word still reachable
    ranks = rng.permutation(n_words) + 1
    w = 1.0 / ranks
    w /= w.sum()
    idx = rng.choice(n_words, size=(n_docs, WORDS_PER_DOC), p=w)
    texts = [" ".join(pool[row]) for row in idx]
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["xx"] * n_docs, pa.string()),
            "source": pa.array(["deepmerge"] * n_docs, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "documents.parquet")
    pq.write_table(table, out)
    print(f"wrote {out}: {n_docs} docs, {n_words} distinct words")


if __name__ == "__main__":
    main()
