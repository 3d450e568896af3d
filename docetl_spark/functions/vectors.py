"""Vector math over ``array<float/double>`` columns — pure Column
expressions (``zip_with`` / ``aggregate`` run inside codegen; no Python).
Used by similarity search, embedding blocking, outlier sampling."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def lit_vec(v: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b) + F.lit(1e-12))


def cosine_sim_col(embedding_col: str, query_vec: Sequence[float]) -> Column:
    """Cosine similarity of every row's embedding to a constant query."""
    return cosine(F.col(embedding_col), lit_vec(query_vec))


def l2_normalize(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    n = norm(a) + F.lit(1e-12)
    return F.transform(a, lambda x: x / n)
