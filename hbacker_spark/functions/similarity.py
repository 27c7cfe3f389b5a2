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


def brute_force_pair_cosines(spark, df, id_col: str = "vec_id", vec_col: str = "embedding", threshold: float = 0.4, round_to: int = 6):
    """All-pairs cosine >= threshold as a pure Spark plan: broadcast
    nested-loop self-join on ``id_a < id_b`` with the fold-exact
    :func:`cosine` kernel.

    The broadcast side is built BY THE EXECUTORS/JVM (``F.broadcast``),
    never collected through the driver — no ``toPandas``/``sc.broadcast``
    anywhere on this path, so the driver heap is never a bottleneck. At
    100 TB the caller buckets first (LSH/IVF, ``operators.similarity``)
    so the broadcast side stays bounded; this kernel then runs per
    bucket. ``spark`` is accepted for API compatibility and unused.

    Returns (vec_a, vec_b, cos_sim) with vec_a < vec_b.
    """
    a = df.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_emb_a"))
    b = df.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_emb_b"))
    cos = F.round(cosine("_emb_a", "_emb_b"), round_to)
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def sql_dot(a: str, b: str) -> str:
    """DuckDB left-fold dot product matching :func:`dot` exactly."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"
