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
    """All-pairs cosine >= threshold via Arrow-batched numpy (mapInPandas).

    The O(n^2 * d) kernel is a BLAS matmul per partition block against a
    broadcast matrix of the full (small) side — the idiomatic Spark shape
    for brute-force similarity: Python sees Arrow batches, never rows.
    At 100 TB the caller buckets first (LSH/IVF) so each broadcast side
    stays bounded; this kernel then runs per bucket.

    Returns (vec_a, vec_b, cos_sim) with vec_a < vec_b.
    """
    import numpy as np
    import pandas as pd

    side = df.select(id_col, vec_col).toPandas()
    ids_all = side[id_col].to_numpy()
    m_all = np.stack(side[vec_col].to_numpy()).astype("float64")
    norms_all = np.sqrt((m_all * m_all).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids_all, m_all, norms_all))

    def block(batches):
        ids_b, m_b, n_b = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            ida = pdf[id_col].to_numpy()
            na = np.sqrt((a * a).sum(axis=1))
            cos = np.round((a @ m_b.T) / np.outer(na, n_b), round_to)
            ai, bj = np.where(cos >= threshold)
            keep = ida[ai] < ids_b[bj]
            yield pd.DataFrame(
                {
                    "vec_a": ida[ai][keep],
                    "vec_b": ids_b[bj][keep],
                    "cos_sim": cos[ai, bj][keep],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(block, schema="vec_a long, vec_b long, cos_sim double")


def sql_dot(a: str, b: str) -> str:
    """DuckDB left-fold dot product matching :func:`dot` exactly."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"
