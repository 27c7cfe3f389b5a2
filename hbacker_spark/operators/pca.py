"""Distributed PCA over an embedding column (training-data dim reduction).

The scale shape: covariance estimation is ONE Arrow-batched pass
emitting per-partition partial sums of x and x·xᵀ as FIXED-POINT int64
components — exact, so the cross-partition reduction is order-
independent and the learned components are bit-identical run to run
(the same determinism contract as the k-means IVF trainer and the
decimal PageRank; float partials would drift with shuffle arrival
order). The reduced matrix is d(d+1)/2 + d + 1 tiny rows; only that
reaches the driver, where the (d×d) eigenproblem is solved by seeded
power iteration with deflation — O(d²·iters) driver work, independent
of corpus size. Projection back onto the corpus is a JVM fold
expression against literal component vectors (codegen, no Python).

At 100 TB: one corpus scan for covariance, one for projection; nothing
driver-side grows with n. Overflow bound: with FP_BITS=12 and |x|≤32,
per-element products are < 2^34, so int64 partials are exact up to
~2^29 (~5·10⁸) rows per task-group; shrink FP_BITS before that at
larger corpora.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FP_BITS = 12
PCA_SEED = 42
POWER_ITERS = 600


def covariance_sums(df: DataFrame, dim: int, vec_col: str = "embedding"):
    """Exact fixed-point sufficient statistics in one pass.

    Returns (S1, S2, n): S1[i] = Σ round(x_i·2^b), S2[i,j] = Σ
    round(x_i·2^b)·round(x_j·2^b) (full symmetric matrix), n = row
    count — all int64-exact, so independent of partitioning.
    """
    import pandas as pd

    scale = float(1 << FP_BITS)

    def partials(it):
        for pdf in it:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            fp = np.rint(m * scale).astype("int64")
            s1 = fp.sum(axis=0)
            s2 = fp.T @ fp  # int64 matmul, exact
            iu, ju = np.triu_indices(m.shape[1])
            out_i = np.concatenate([iu, np.arange(m.shape[1]), [-1]])
            out_j = np.concatenate([ju, np.full(m.shape[1], -1), [-1]])
            out_s = np.concatenate([s2[iu, ju], s1, [len(m)]])
            yield pd.DataFrame({"i": out_i.astype("int32"), "j": out_j.astype("int32"), "s": out_s})

    agg = (
        df.select(F.col(vec_col).alias(vec_col))
        .mapInPandas(partials, "i int, j int, s long")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    s1 = np.zeros(dim, dtype="int64")
    s2 = np.zeros((dim, dim), dtype="int64")
    n = 0
    for r in agg:
        if r["i"] == -1:
            n = int(r["s"])
        elif r["j"] == -1:
            s1[r["i"]] = r["s"]
        else:
            s2[r["i"], r["j"]] = r["s"]
            s2[r["j"], r["i"]] = r["s"]
    return s1, s2, n


def top_components(
    df: DataFrame,
    dim: int,
    k: int = 2,
    vec_col: str = "embedding",
    seed: int = PCA_SEED,
    iters: int = POWER_ITERS,
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k principal components via power iteration with deflation.

    Deterministic: exact integer sufficient statistics + fixed seed +
    fixed iteration count; sign canonicalized so the largest-magnitude
    component of each vector is positive. 600 iterations because random
    near-isotropic corpora have ~1% eigengaps: convergence is
    (lam2/lam1)^iters, and (0.9875)^600 ~ 5e-4 — still O(d^2 * iters)
    driver flops, microseconds at d=64. Returns (components (k,d),
    eigenvalues (k,))."""
    s1, s2, n = covariance_sums(df, dim, vec_col)
    scale = float(1 << FP_BITS)
    mu = s1 / (n * scale)
    cov = s2 / (n * scale * scale) - np.outer(mu, mu)
    rng = np.random.RandomState(seed)
    comps, eigs = [], []
    c = cov.copy()
    for _ in range(k):
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        for _ in range(iters):
            v = c @ v
            v /= np.linalg.norm(v)
        lam = float(v @ c @ v)
        # canonical sign: largest-|component| positive
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        comps.append(v)
        eigs.append(lam)
        c = c - lam * np.outer(v, v)
    return np.stack(comps), np.asarray(eigs)


def project(
    df: DataFrame,
    components: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Project each vector onto the given components with the exact
    left-fold dot (JVM codegen against literal component arrays — the
    same IEEE addition order as functions.similarity.dot, so results
    are engine-reproducible)."""
    cols = [F.col(id_col)]
    for ci, comp in enumerate(components):
        lit = ", ".join(f"CAST({x!r} AS DOUBLE)" for x in comp.tolist())
        cols.append(
            F.round(
                F.expr(
                    f"aggregate(zip_with({vec_col}, array({lit}), "
                    f"(x, y) -> CAST(x AS DOUBLE) * y), "
                    f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
                ),
                round_to,
            ).alias(f"pc{ci + 1}")
        )
    return df.select(*cols)
