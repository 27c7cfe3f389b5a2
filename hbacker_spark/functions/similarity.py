"""Vector-similarity column builders (built-in higher-order functions).

Dot/norm are expressed as a *left fold* (``aggregate`` over ``zip_with``)
in double precision — the same fold the DuckDB oracle runs — so cosine
values are bit-identical across engines. All JVM-side; no Python in the
hot path. At 100 TB the brute-force form below is the per-bucket kernel;
the scale path (IVF/LSH bucketing to prune candidates) lives in
``hbacker_spark.operators.similarity``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sql_dot(a: str, b: str) -> str:
    """DuckDB left-fold dot product matching :func:`dot` exactly."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"
