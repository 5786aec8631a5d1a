"""Derive a k×-scale ``documents`` table from the sf0.1 parquet.

The driver ships testdata only up to sf0.1 (TESTDATA.md), but the 100 TB
arguments in SCALE.md need at least one measured point beyond it. This
tool manufactures sf0.33 / sf1-equivalent ``documents`` tables (the only
input of the five most expensive queries: d03, d08, d10, t13, x06) by
replicating sf0.1 k times with a replica transform chosen so the
workload's STATISTICS scale linearly instead of degenerating:

- ``doc_id`` is offset by ``replica * ID_STRIDE`` → ids stay unique and
  ``doc_id % m`` batch selectors (d10) keep their selectivity.
- every ALPHANUMERIC RUN in ``text`` gets an ``xr{replica}`` suffix for
  replica > 0 → within-replica duplicate/near-duplicate structure is
  byte-preserved (the transform is a bijection on token streams), while
  across replicas every shingle, SimHash feature and MinHash signature
  differs, so NO cross-replica candidate pairs appear. A k× corpus thus
  carries exactly k× the duplicate pairs and k× the clusters — the null
  model for "same crawl, k× the data".

  The suffix MUST fuse into the token: a first version appended
  ``_r{replica}`` to whitespace runs, and because the engine tokenizes
  on ``[^a-z0-9]+`` the trailing punctuation split the tag off as a
  standalone ``r{replica}`` token occurring once PER WORD — a corpus
  where half of all tokens are one boilerplate token. That mega-token
  dominated every SimHash vote, collapsed each replica into a single
  16-bit band bucket (occupancy 4,999 of 5,000; 191k → 100M candidate
  pairs at 3×), and made d04/d08/x06 look quadratic. Instructive as an
  adversarial-boilerplate case (see SCALE.md), but wrong as a scaling
  null model.
- ``n_chars`` is recomputed from the transformed text.

Rows land shuffled across replicas (ORDER BY a hash of the new doc_id)
so parquet row groups interleave replicas — otherwise each scan task
would see one replica only, which is both unrealistic and suspiciously
cache-friendly.

Usage: python tools/make_scale_documents.py <k> <out_dir>
Output: <out_dir>/documents.parquet (plus nothing else — the five target
queries read only ``documents``).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1/documents.parquet"
ID_STRIDE = 10_000_000


def main() -> None:
    k = int(sys.argv[1])
    out_dir = sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "documents.parquet")
    con = duckdb.connect()
    # regexp_replace with the \S+ token pattern appends the replica tag to
    # every token; replica 0 is the untouched original.
    con.execute(
        f"""
        COPY (
          SELECT
            doc_id + r.replica * {ID_STRIDE} AS doc_id,
            CASE WHEN r.replica = 0 THEN text
                 ELSE regexp_replace(text, '([a-zA-Z0-9]+)', '\\1xr' || r.replica, 'g')
            END AS text,
            lang,
            source,
            CASE WHEN r.replica = 0 THEN n_chars
                 ELSE length(regexp_replace(text, '([a-zA-Z0-9]+)', '\\1xr' || r.replica, 'g'))
            END AS n_chars
          FROM read_parquet('{SRC}')
          CROSS JOIN (SELECT unnest(range({k})) AS replica) r
          ORDER BY hash(doc_id + r.replica * {ID_STRIDE})
        ) TO '{out}' (FORMAT parquet)
        """
    )
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"wrote {out}: {n} rows (k={k})")


if __name__ == "__main__":
    main()
