"""Vector math over ``array<float|double>`` columns — pure Column
expressions (``F.zip_with`` / ``F.aggregate``), so they stay JVM-side
inside whole-stage codegen. No Python UDFs in this hot path: at 100 TB
a per-row Python round trip on the similarity inner loop would dominate
the job.

All math is done in float64 regardless of the stored element type so
results are reproducible against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-to-right dot product (same accumulation order as the
    DuckDB oracle's list_dot_product-free unnest formulation)."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    v = _as_double(a)
    sq = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(sq)


def normalize(a: Column | str) -> Column:
    v = _as_double(a)
    n = l2_norm(v)
    return F.transform(v, lambda x: x / n)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
