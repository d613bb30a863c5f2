"""Vector/embedding column helpers — JVM-side higher-order functions.

Cosine similarity over ``array<float>`` embeddings is expressed with
``zip_with`` + ``aggregate`` (whole-stage-codegen'd, no Python), cast to
double *before* accumulating so Spark and the DuckDB oracle sum in the
same precision and order (both sequential left-to-right).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = a·b / (‖a‖‖b‖); NULL when either norm is 0."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def sign_bucket(col: Column | str, bits: int = 4, offset: int = 0) -> Column:
    """Deterministic LSH-style bucket id from the sign of ``bits``
    dimensions starting at ``offset`` — the cheap partitioner for
    bucketed ANN (identical arithmetic is reproducible in SQL oracles).
    Different offsets give independent hash tables for OR-amplified
    multi-table LSH.
    """
    c = as_double(col)
    b = F.lit(0)
    for i in range(bits):
        b = b + F.when(
            F.element_at(c, offset + i + 1) > 0, F.lit(2 ** i)
        ).otherwise(F.lit(0))
    return b.cast("int")
