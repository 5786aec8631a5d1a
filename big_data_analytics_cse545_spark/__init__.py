"""big_data_analytics_cse545_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / Spark SQL / Catalyst /
Structured Streaming) engine with the query and data-processing
capabilities of the reference repo ``droidfringe/Big-Data-Analytics-CSE545``
(surveyed in ``SURVEY.md``), extended with the operators a large-scale
LLM-training-data pipeline needs (dedup, similarity search, multimodal
columns, text analysis), designed for 100 TB scale.

Layers (SURVEY.md §7):
  L1 relational core   — thin, tested DataFrame combinators (operators.relational)
  L2 text analytics    — a1p2b semantics, Spark-first (operators.text)
  L3 similarity/dedup/multimodal — a2 semantics generalized (operators.dedup,
                         operators.similarity, operators.images, operators.projection)
  streaming            — Structured Streaming extension (streaming.ops)
"""

from big_data_analytics_cse545_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
