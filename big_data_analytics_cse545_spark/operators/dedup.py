"""L3 deduplication — exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

North-star LLM-pipeline operators (BASELINE.json) generalizing the
reference's LSH funnel (``Assignment 2/a2_ahuja.py:99-170``): md5 chunk
signatures (I9) → banding (I10) → bucket-join candidates (I11) → exact
check on the survivors. Same funnel here, applied to text shingles:
cheap sketch first, exact verification only on candidates — the only
shape that works at 100 TB (the all-pairs join d02 exists as the
correctness baseline; d03 is the scale path).

Determinism: every hash is md5-of-string, identical in Spark and DuckDB,
so even the LSH stages have exact SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_cse545_spark.functions.text import TOKEN_SPLIT_RE
from big_data_analytics_cse545_spark.sources import load_table

_SQL_TOKENS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
)

# MinHash parameters: 32 hashes in 8 bands of 4 rows → catches jaccard
# ≳0.7 with high probability while keeping false candidates rare.
N_HASHES = 32
BAND_ROWS = 4
N_BANDS = N_HASHES // BAND_ROWS
JACCARD_THRESHOLD = 0.8


def _tokens_col():
    return F.filter(
        F.split(F.lower(F.col("text")), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def _shingles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) — distinct 3-gram word shingles per document."""
    d = load_table(spark, sf_dir, "documents")
    shingles = F.expr(
        "CASE WHEN size(ts) >= 3 THEN array_distinct(transform("
        "sequence(1, size(ts) - 2), "
        "i -> concat_ws('_', element_at(ts, i), element_at(ts, i + 1), element_at(ts, i + 2))"
        ")) ELSE array() END"
    )
    return (
        d.select("doc_id", _tokens_col().alias("ts"))
        .select("doc_id", F.explode(shingles).alias("shingle"))
    )


_SQL_SHINGLES = f"""
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(ts) - 1),
                i -> ts[i] || '_' || ts[i + 1] || '_' || ts[i + 2]))) AS shingle
  FROM (SELECT doc_id, {_SQL_TOKENS} AS ts FROM documents)
"""


# ---------------------------------------------------------------------------
# d01 — exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------

def d01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + prefix-fingerprint dedup statistics per source.

    Hash-groupBy dedup: full-text md5 (byte-exact dups) and first-8-token
    prefix md5 (header dups). One pass, two distinct-counts — at scale
    this is one shuffle on a 16-byte key, never on the text itself.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens_col()
    return (
        d.select(
            "source",
            F.md5(F.lower(F.col("text"))).alias("h_full"),
            F.md5(F.array_join(F.slice(toks, 1, 8), " ")).alias("h_prefix"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("h_full").alias("n_unique_full"),
            F.countDistinct("h_prefix").alias("n_unique_prefix"),
        )
        .orderBy("source")
    )


_D01_SQL = f"""
WITH h AS (
  SELECT source,
         md5(lower(text)) AS h_full,
         md5(array_to_string(list_slice({_SQL_TOKENS}, 1, 8), ' ')) AS h_prefix
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT h_full) AS n_unique_full,
       COUNT(DISTINCT h_prefix) AS n_unique_prefix
FROM h GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# d02 — all-pairs n-gram Jaccard (correctness baseline for d03)
# ---------------------------------------------------------------------------

def d02_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs with 3-gram-shingle Jaccard ≥ 0.8.

    Inverted-index self-join: explode shingles → equi-join on shingle →
    per-pair intersection counts → |A∪B| = |A|+|B|−|A∩B|. Exact but
    quadratic in the worst case — the correctness oracle for the LSH
    path (d03), kept for small/verification scales.
    """
    sh = _shingles_df(spark, sf_dir)
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    c1 = cnt.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    c2 = cnt.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    return (
        inter.join(c1, "d1")
        .join(c2, "d2")
        .select("d1", "d2", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("d1", "d2")
    )


_D02_SQL = f"""
WITH sh AS ({_SQL_SHINGLES}),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2,
       ROUND(inter / CAST(c1.n + c2.n - inter AS DOUBLE), 6) AS jaccard
FROM inter
JOIN cnt c1 ON d1 = c1.doc_id
JOIN cnt c2 ON d2 = c2.doc_id
WHERE inter / CAST(c1.n + c2.n - inter AS DOUBLE) >= {JACCARD_THRESHOLD}
ORDER BY d1, d2
"""


# ---------------------------------------------------------------------------
# d03 — MinHash + LSH banding (the scale path)
# ---------------------------------------------------------------------------

def d03_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + LSH(8 bands × 4 rows) near-dup pairs, exact-verified.

    The reference's funnel, re-keyed for text: signature = per-seed min
    of md5(seed|shingle) (≙ md5 chunk signature, ``a2_ahuja.py:99-120``),
    banding (≙ ``computeBuckets2``, ``a2_ahuja.py:140-149``), bucket
    equi-join for candidates (≙ ``computeSimilarCandidates``,
    ``a2_ahuja.py:164-170``), exact Jaccard only on candidates. Cost at
    scale: shuffles on 16-byte band keys; the all-pairs join never runs.
    """
    sh = _shingles_df(spark, sf_dir)
    # One aggregation pass computes all 32 minhashes as separate agg
    # columns — a single shuffle keyed by doc_id instead of a 32×
    # shingle-row explode (the naive seeds-cross-join shuffles N_HASHES×
    # the shingle table; at 100 TB that explode is the bottleneck).
    minh = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat_ws("|", F.lit(s), F.col("shingle")))).alias(f"mh{s}")
            for s in range(N_HASHES)
        ]
    )
    # band key = md5 of the band's minhashes, seed-ordered (matches the
    # oracle's string_agg(mh, '|' ORDER BY seed))
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh{s}") for s in range(b * BAND_ROWS, (b + 1) * BAND_ROWS)]
            )
        ).alias(f"bk{b}")
        for b in range(N_BANDS)
    ]
    bands = minh.select("doc_id", *band_cols).select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"bk{b}") for b in range(N_BANDS)])).alias(
            "band", "band_key"
        ),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    # exact verification on candidates only
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a_sh = sh.select(F.col("doc_id").alias("d1"), F.col("shingle").alias("s1"))
    b_sh = sh.select(F.col("doc_id").alias("bd2"), F.col("shingle").alias("s2"))
    inter = (
        cand.join(a_sh, "d1")
        .join(b_sh, (F.col("d2") == F.col("bd2")) & (F.col("s1") == F.col("s2")))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    c1 = cnt.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    c2 = cnt.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    return (
        inter.join(c1, "d1")
        .join(c2, "d2")
        .select("d1", "d2", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.7)
        .orderBy("d1", "d2")
    )


_D03_SQL = f"""
WITH sh AS ({_SQL_SHINGLES}),
seeds AS (SELECT unnest(range(0, {N_HASHES})) AS seed),
minh AS (
  SELECT doc_id, seed, MIN(md5(seed || '|' || shingle)) AS mh
  FROM sh CROSS JOIN seeds
  GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, seed // {BAND_ROWS} AS band,
         md5(string_agg(mh, '|' ORDER BY seed)) AS band_key
  FROM minh GROUP BY doc_id, seed // {BAND_ROWS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT d1, d2, COUNT(*) AS inter
  FROM cand
  JOIN sh s1 ON s1.doc_id = d1
  JOIN sh s2 ON s2.doc_id = d2 AND s2.shingle = s1.shingle
  GROUP BY d1, d2
)
SELECT d1, d2,
       ROUND(inter / CAST(c1.n + c2.n - inter AS DOUBLE), 6) AS jaccard
FROM inter
JOIN cnt c1 ON d1 = c1.doc_id
JOIN cnt c2 ON d2 = c2.doc_id
WHERE inter / CAST(c1.n + c2.n - inter AS DOUBLE) >= 0.7
ORDER BY d1, d2
"""


# ---------------------------------------------------------------------------
# d04 — SimHash clustering (16-bit, md5-nibble bits)
# ---------------------------------------------------------------------------

def _simhash_bits_spark():
    """16 per-token bit expressions from the first 4 md5 hex nibbles."""
    exprs = []
    for j in range(16):
        nib = j // 4 + 1  # hex char position 1..4
        shift = 3 - (j % 4)
        exprs.append(
            f"CAST(floor((locate(substr(md5(tok), {nib}, 1), '0123456789abcdef') - 1) "
            f"/ {2 ** shift}) AS INT) % 2"
        )
    return exprs


def _simhash_bits_duck():
    exprs = []
    for j in range(16):
        nib = j // 4 + 1
        shift = 3 - (j % 4)
        exprs.append(
            f"CAST(floor((strpos('0123456789abcdef', substr(md5(tok), {nib}, 1)) - 1) "
            f"/ {2 ** shift}) AS INT) % 2"
        )
    return exprs


def d04_simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(16) near-dup clusters: groups of documents sharing a
    fingerprint.

    Per token, 16 bits from the md5 hex prefix; per document, each bit
    is the sign of Σ(±1) over tokens; identical fingerprints cluster.
    All JVM-side expressions — the classic simhash without a single UDF.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_tokens_col()).alias("tok"))
    bit_exprs = _simhash_bits_spark()
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.expr(f"2 * ({e}) - 1")).alias(f"v{j}")
            for j, e in enumerate(bit_exprs)
        ]
    )
    simhash = sum(
        (F.when(F.col(f"v{j}") > 0, 2 ** j).otherwise(0) for j in range(16)),
        F.lit(0),
    )
    fps = votes.select("doc_id", simhash.cast("bigint").alias("simhash"))
    return (
        fps.groupBy("simhash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("simhash")
    )


def _d04_sql() -> str:
    bit_exprs = _simhash_bits_duck()
    votes = ",\n    ".join(
        f"SUM(2 * ({e}) - 1) AS v{j}" for j, e in enumerate(bit_exprs)
    )
    bits = " + ".join(f"CASE WHEN v{j} > 0 THEN {2 ** j} ELSE 0 END" for j in range(16))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents
),
votes AS (
  SELECT doc_id,
    {votes}
  FROM toks GROUP BY doc_id
),
fps AS (SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM votes)
SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM fps GROUP BY simhash HAVING COUNT(*) > 1 ORDER BY simhash
"""


# ---------------------------------------------------------------------------
# d05 — embedding-cosine near-dup pairs
# ---------------------------------------------------------------------------

def d05_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding pairs with cosine similarity ≥ 0.4 (blocked brute-force).

    Vectorized blocked matmul: the corpus matrix (row-normalized float64)
    ships to executors once (a broadcast, ``a2_ahuja.py:255`` pattern);
    each Arrow batch computes batch×corpusᵀ with BLAS and emits only
    above-threshold pairs. This replaces a 4M-row theta-join of
    interpreted higher-order expressions (~30× slower). At 100 TB the
    same kernel runs per block against an LSH/IVF-pruned candidate set
    (operators.similarity) instead of the full corpus.
    """
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    xn = x / np.sqrt((x * x).sum(axis=1, keepdims=True))
    # The corpus matrix ships inside the UDF closure (1 MB at sf0.1) —
    # works on classic and Connect sessions alike; on a real cluster with
    # a large corpus, switch to sc.broadcast (same kernel, explicit
    # broadcast handle) or pre-prune candidates with s02/s03 first.

    def block_pairs(batches):
        for batch in batches:
            b_ids = batch["vec_id"].to_numpy()
            b = np.array([list(v) for v in batch["embedding"]], dtype=np.float64)
            bn = b / np.sqrt((b * b).sum(axis=1, keepdims=True))
            sims = np.round(bn @ xn.T, 6)
            mask = (sims >= 0.4) & (b_ids[:, None] < ids[None, :])
            i, j = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "v1": b_ids[i],
                    "v2": ids[j],
                    "cos_sim": sims[i, j],
                }
            )

    return (
        e.select("vec_id", "embedding")
        .mapInPandas(block_pairs, schema="v1 long, v2 long, cos_sim double")
        .orderBy("v1", "v2")
    )


_D05_SQL = """
WITH pairs AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2,
         list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
         (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
          sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS c
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT v1, v2, ROUND(c, 6) AS cos_sim
FROM pairs WHERE ROUND(c, 6) >= 0.4
ORDER BY v1, v2
"""


QUERIES = {
    "d01_exact_dedup": d01_exact_dedup,
    "d02_ngram_jaccard_pairs": d02_ngram_jaccard_pairs,
    "d03_minhash_lsh_dedup": d03_minhash_lsh_dedup,
    "d04_simhash_clusters": d04_simhash_clusters,
    "d05_embedding_near_dup": d05_embedding_near_dup,
}

ORACLE = {
    "d01_exact_dedup": _D01_SQL,
    "d02_ngram_jaccard_pairs": _D02_SQL,
    "d03_minhash_lsh_dedup": _D03_SQL,
    "d04_simhash_clusters": _d04_sql(),
    "d05_embedding_near_dup": _D05_SQL,
}
