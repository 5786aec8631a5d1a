"""Vector column expressions — dot products, norms, cosine — as JVM
higher-order functions (zip_with/aggregate), no Python UDFs.

The reference does all vector math in per-row numpy inside RDD lambdas
(``Assignment 2/a2_ahuja.py:48-49, 257, 299``); these expressions keep the
same semantics inside whole-stage codegen. Elements are cast to double
before multiplying so an oracle engine reproduces the arithmetic exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(x: Column) -> Column:
    return F.sqrt(dot(x, x))


def cosine(x: Column, y: Column) -> Column:
    return dot(x, y) / (norm(x) * norm(y))


def euclidean(x: Column, y: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                x, y, lambda a, b: (a.cast("double") - b.cast("double")) ** 2
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
