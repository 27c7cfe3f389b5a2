"""Distributed PCA: determinism, numpy parity, exact projection fold."""

from __future__ import annotations

import numpy as np
import pytest

from hbacker_spark.operators.pca import (
    FP_BITS,
    covariance_sums,
    project,
    top_components,
)
from hbacker_spark.sources.tables import load_table

DIM = 64


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, "/root/testdata/sf0.01", "embeddings")


def test_components_deterministic_across_runs(spark, embeddings):
    """Exact int64 partials + fixed seed/iters => bit-identical
    components regardless of shuffle arrival order."""
    c1, e1 = top_components(embeddings, DIM, k=2)
    c2, e2 = top_components(embeddings, DIM, k=2)
    assert (c1 == c2).all() and (e1 == e2).all()
    # repartitioned input: different partial grouping, same exact sums
    c3, _ = top_components(embeddings.repartition(7), DIM, k=2)
    assert (c1 == c3).all()


def test_covariance_matches_numpy_to_fixed_point(spark, embeddings):
    """The distributed sufficient statistics must equal a single-node
    computation of the SAME fixed-point algorithm exactly, and the
    resulting covariance must match float64 numpy to the quantization
    error bound."""
    rows = embeddings.select("embedding").collect()
    m = np.stack([np.asarray(r["embedding"], dtype="float64") for r in rows])
    scale = float(1 << FP_BITS)
    fp = np.rint(m * scale).astype("int64")
    s1, s2, n = covariance_sums(embeddings, DIM)
    assert n == len(m)
    assert (s1 == fp.sum(axis=0)).all()
    assert (s2 == fp.T @ fp).all()
    cov_fp = s2 / (n * scale * scale) - np.outer(s1 / (n * scale), s1 / (n * scale))
    cov_np = np.cov(m, rowvar=False, bias=True)
    # quantization error per element is O(2^-FP_BITS * |x|)
    assert np.abs(cov_fp - cov_np).max() < 1e-2


def test_top_components_span_numpy_eigenspace(spark, embeddings):
    """Power-iteration components must align with numpy's exact
    eigendecomposition of the same covariance (|cos| ~ 1), with
    eigenvalues in descending order."""
    comps, eigs = top_components(embeddings, DIM, k=2)
    s1, s2, n = covariance_sums(embeddings, DIM)
    scale = float(1 << FP_BITS)
    mu = s1 / (n * scale)
    cov = s2 / (n * scale * scale) - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)
    assert eigs[0] >= eigs[1] > 0
    assert abs(float(comps[0] @ v[:, -1])) > 0.999
    assert abs(float(comps[1] @ v[:, -2])) > 0.999
    assert abs(eigs[0] - w[-1]) < 1e-6 * max(1.0, w[-1])


def test_projection_is_exact_left_fold(spark, embeddings):
    """The JVM projection fold must reproduce the ascending-index
    left-fold dot bit-for-bit (same contract as the cosine kernel)."""
    comps, _ = top_components(embeddings, DIM, k=2)
    got = {r["vec_id"]: (r["pc1"], r["pc2"]) for r in project(embeddings, comps).collect()}
    rows = embeddings.select("vec_id", "embedding").limit(50).collect()
    for r in rows:
        x = np.asarray(r["embedding"], dtype="float64")
        want = []
        for comp in comps:
            acc = 0.0
            for a, b in zip(x, comp):
                acc = acc + float(a) * float(b)
            # mimic java HALF_UP on the magnitude
            import decimal

            want.append(
                float(
                    decimal.Decimal(acc).quantize(
                        decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
                    )
                )
            )
        assert got[r["vec_id"]] == tuple(want), r["vec_id"]
