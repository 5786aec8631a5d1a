"""Dataset splitting & mixing — the reproducibility layer of an LLM
training-data pipeline: deterministic hash-based train/val/test splits
and temperature-weighted source balancing.

No single reference counterpart; this generalizes the reference's
hash-partition discipline (``pyspark_hash_partitioning/
simple_mapreduce_spark.py:24-31`` routes records by
``ComputeHashOfString % DOP``) from *placement* to *membership*: the
same hash-mod idea, applied to md5 so the assignment is engine-portable
and stable across reruns/cluster sizes.

Determinism: every decision is a pure function of ``md5(tag || doc_id)``
— identical in Spark, DuckDB, and hashlib (the repo-wide anchor, see
operators/dedup.py module docstring). No ``rand()``: Spark's rand is
seed-*and-partitioning* dependent, so a repartition would silently
change the split — unacceptable for a training corpus.

Scale design: both operators are one narrow projection over the corpus
(the hash is computed where the row lives; no shuffle to decide
membership) plus, for x02, a broadcast join against a per-source rate
table that is result-sized (one row per source). Nothing here moves
the text column across the network.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_cse545_spark.sources import load_table

# 2^32 — the hash domain: first 8 md5 hex chars parsed as an integer.
HASH_DOMAIN = 4294967296.0

# x01 split percentages (bucket = md5 mod 100).
TRAIN_PCT, VAL_PCT = 98, 1

# x02 temperature: keep-rate r_s = (min_n / n_s)^(1-alpha); alpha=0.5
# is the common "square-root temperature" that upweights rare sources.
MIX_ALPHA = 0.5


def hash_bucket(key: Column, tag: str, mod: int | None = None) -> Column:
    """Deterministic uniform hash of ``key`` (any column; cast to
    string) in [0, 2^32), optionally reduced mod ``mod``. JVM-side
    only: md5 → first 8 hex chars → conv(16, 10)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(tag), key.cast("string"))), 1, 8), 16, 10
    ).cast("long")
    return (h % mod) if mod else h


# DuckDB twin of hash_bucket (no conv(): hex-literal CAST).
def _sql_hash(key_sql: str, tag: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5('{tag}' || CAST({key_sql} AS VARCHAR)), 1, 8))"
        " AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# x01 — deterministic train/val/test split
# ---------------------------------------------------------------------------

def x01_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to train/val/test (98/1/1) by
    ``md5('split|' || doc_id) mod 100`` — the standard reproducible-split
    recipe: stable under reruns, repartitioning, cluster resizing, and
    incremental corpus growth (old docs never change split when new docs
    arrive — a random split can't promise any of that).

    Shape at scale: a narrow per-row projection — no shuffle, no state;
    the split column costs one md5 per row and pushes down with the scan.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"), "split|", mod=100)
    split = (
        F.when(bucket < TRAIN_PCT, F.lit("train"))
        .when(bucket < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return d.select(
        "doc_id",
        "source",
        bucket.alias("bucket"),
        split.alias("split"),
    ).orderBy("doc_id")


_X01_SQL = f"""
SELECT doc_id, source, bucket,
       CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
            WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, source,
         {_sql_hash('doc_id', 'split|')} % 100 AS bucket
  FROM documents
)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# x02 — temperature-weighted source balancing
# ---------------------------------------------------------------------------

def x02_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample over-represented sources toward a temperature-balanced
    mixture: keep-rate r_s = sqrt(min_n / n_s) per source (alpha=0.5
    multinomial temperature, realized as a deterministic per-doc
    Bernoulli: keep iff hash < floor(r_s * 2^32)). The smallest source
    keeps everything; a source 4x larger keeps half. Output is the
    per-source mixing report (totals, kept, rate).

    Float-parity: min_n/n_s (exact int-to-double), sqrt (IEEE correctly
    rounded), *2^32 (power-of-two scaling), floor — every step is
    bit-identical in Spark and DuckDB, so the integer threshold and
    therefore the kept set are engine-exact.

    Shape at scale: per-source counts are a map-side-combined agg whose
    result is one row per source; rates broadcast back; membership is
    again a narrow per-row hash compare. One small shuffle (the count),
    zero wide ones.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    min_n = counts.agg(F.min("n_total").alias("min_n"))
    rates = (
        counts.crossJoin(F.broadcast(min_n))
        .withColumn(
            "keep_rate",
            F.sqrt(F.col("min_n").cast("double") / F.col("n_total").cast("double")),
        )
        .withColumn(
            "threshold", F.floor(F.col("keep_rate") * F.lit(HASH_DOMAIN)).cast("long")
        )
    )
    kept = (
        d.join(F.broadcast(rates), "source")
        .withColumn(
            "keep", hash_bucket(F.col("doc_id"), "mix|") < F.col("threshold")
        )
    )
    return (
        kept.groupBy("source")
        .agg(
            F.max("n_total").alias("n_total"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.max("keep_rate").alias("keep_rate"),
        )
        .orderBy("source")
    )


_X02_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source
),
rates AS (
  SELECT source, n_total,
         sqrt(CAST((SELECT MIN(n_total) FROM counts) AS DOUBLE)
              / CAST(n_total AS DOUBLE)) AS keep_rate
  FROM counts
),
flagged AS (
  SELECT d.source, r.n_total, r.keep_rate,
         CASE WHEN {_sql_hash('d.doc_id', 'mix|')}
                   < CAST(floor(r.keep_rate * {HASH_DOMAIN}) AS BIGINT)
              THEN 1 ELSE 0 END AS keep
  FROM documents d JOIN rates r USING (source)
)
SELECT source,
       MAX(n_total) AS n_total,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       MAX(keep_rate) AS keep_rate
FROM flagged
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# x03 — end-to-end training-data pipeline (quality → dedup → split → stats)
# ---------------------------------------------------------------------------

MIN_TOKENS = 20  # quality gate: drop docs shorter than this


def x03_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data prep pipeline in one declarative plan:
    quality gate (≥ MIN_TOKENS tokens) → exact dedup (keep the lowest
    doc_id per md5-of-lowercased-text, d01 semantics) → deterministic
    split (x01 semantics) → per (split, source) corpus stats. This is
    the end-to-end shape a corpus build runs nightly; expressing it as
    ONE DataFrame lets Catalyst fuse the gate into the scan and plan
    dedup + stats with two total shuffles (hash key, then group key).

    Shape at scale: the only data-sized shuffle is the dedup window on
    the 16-byte content hash (same key discipline as d01 — never the
    text); split assignment adds zero movement; the stats agg shuffles
    result-sized rows.
    """
    from pyspark.sql.window import Window

    from big_data_analytics_cse545_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    gated = d.select(
        "doc_id",
        "source",
        F.md5(F.lower(F.col("text"))).alias("h"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
    ).filter(F.col("n_tok") >= MIN_TOKENS)
    w = Window.partitionBy("h").orderBy("doc_id")
    kept = gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    bucket = hash_bucket(F.col("doc_id"), "split|", mod=100)
    split = (
        F.when(bucket < TRAIN_PCT, F.lit("train"))
        .when(bucket < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        kept.withColumn("split", split)
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("split", "source")
    )


_X03_SQL = f"""
WITH raw AS (
  SELECT doc_id, source, md5(lower(text)) AS h,
         CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              t -> t <> '')) AS BIGINT) AS n_tok
  FROM documents
),
gated AS (SELECT * FROM raw WHERE n_tok >= {MIN_TOKENS}),
kept AS (
  SELECT doc_id, source, n_tok
  FROM gated
  QUALIFY ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) = 1
),
labeled AS (
  SELECT doc_id, source, n_tok,
         {_sql_hash('doc_id', 'split|')} % 100 AS bucket
  FROM kept
)
SELECT CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
            WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc
FROM labeled
GROUP BY 1, 2
ORDER BY split, source
"""


QUERIES = {
    "x01_hash_split": x01_hash_split,
    "x02_temperature_mix": x02_temperature_mix,
    "x03_pipeline_stats": x03_pipeline_stats,
}

ORACLE = {
    "x01_hash_split": _X01_SQL,
    "x02_temperature_mix": _X02_SQL,
    "x03_pipeline_stats": _X03_SQL,
}
