"""Vector math over array<float|double> columns, built entirely from
JVM higher-order functions (zip_with / aggregate) so similarity scans
stay inside whole-stage codegen — no Python, no UDF serialization.

Arrays are cast to double before arithmetic: float accumulation
diverges between engines, double left-fold is deterministic and matches
an ANSI-SQL oracle bit-for-bit (after rounding display columns).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-fold sum of elementwise products (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
