"""Vector math over ``array<float>`` embedding columns — built-in
higher-order functions only (zip_with + aggregate), evaluated JVM-side.

Elements are cast to double before any arithmetic so Spark and the
DuckDB oracle (list_dot_product on double lists) accumulate identically
in index order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either norm is 0."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(None).cast("double")).otherwise(dot(a, b) / denom)
