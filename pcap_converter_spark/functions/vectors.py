"""Embedding vector math over ``array<float>`` columns.

Built from higher-order functions (``zip_with``/``aggregate``) so the dot
products run inside whole-stage codegen — no Python boundary, no UDF. This
is the hot inner loop of similarity search: at 100 TB it must stay JVM-side.

All arithmetic is in DOUBLE regardless of the stored element type: float32
accumulation is order-sensitive enough to break cross-engine comparisons,
and Spark's aggregate() folds left-to-right deterministically in double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, left-to-right (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm in double."""
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))


def literal_vector(values: list[float]) -> Column:
    """A query vector as an array literal — broadcast by value inside the
    plan itself: every executor evaluates it locally, no join, no shuffle."""
    return F.array(*[F.lit(float(v)) for v in values])
