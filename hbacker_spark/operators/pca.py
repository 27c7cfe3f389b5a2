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

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FP_BITS = 12
PCA_SEED = 42
POWER_ITERS = 600

# --- integer power iteration (r7) -----------------------------------
# The float power method above needs ~600 iterations (1% eigengaps) and
# float renormalization, which no SQL engine reproduces bit-for-bit —
# that kept embedding_pca_projection rows-only for six rounds. The
# integer-Lloyd playbook (operators/similarity.py:209) removes the
# impossibility by REDESIGN: redefine the published artifact as the
# SEEDED k-ITERATION INTEGER SUBSPACE — floor-quantized covariance
# sufficient statistics, md5-seeded integer iterate, exact integer
# matvec, a power-of-two floor rescale in place of float normalization,
# and exact integer Gram-Schmidt deflation. Every step is
# integer-exact, so DuckDB unrolls the identical iterations as
# materialized CTEs (sql_int_pca_projection) and the projection
# hash-matches cell-for-cell. Alignment with the true numpy eigenbasis
# is a measured receipt (tests/test_pca.py), not part of the contract —
# exactly like integer Lloyd's 3-iteration centroids.
QP_BITS = 12  # input quantization: fp = floor(x * 2^12)
VBITS = 20  # iterate budget: |v| < 2^20 after each rescale
INT_PCA_ITERS = 8


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


def int_cov_stats(
    df: DataFrame, dim: int, vec_col: str = "embedding"
) -> tuple[list[int], list[list[int]], int]:
    """Exact floor-quantized sufficient statistics in one pass.

    Same one-scan shape as :func:`covariance_sums`, but with the LSH
    family's floor quantization (fp = floor(x·2^b), IEEE-identical in
    numpy and SQL — np.rint is round-half-even, which DuckDB has no
    exact mirror for) and Python-int returns so downstream arithmetic
    is arbitrary-precision (mirroring DuckDB HUGEINT exactly).
    Returns (S1 as list, S2 full symmetric as list-of-lists, n).
    """
    import pandas as pd

    scale = float(1 << QP_BITS)

    def partials(it):
        for pdf in it:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            fp = np.floor(m * scale).astype("int64")
            s1 = fp.sum(axis=0)
            s2 = fp.T @ fp  # int64 matmul, exact (|fp| <= 2^12)
            iu, ju = np.triu_indices(m.shape[1])
            out_i = np.concatenate([iu, np.arange(m.shape[1]), [-1]])
            out_j = np.concatenate([ju, np.full(m.shape[1], -1), [-1]])
            out_s = np.concatenate([s2[iu, ju], s1, [len(m)]])
            yield pd.DataFrame(
                {"i": out_i.astype("int32"), "j": out_j.astype("int32"), "s": out_s}
            )

    agg = (
        df.select(F.col(vec_col).alias(vec_col))
        .mapInPandas(partials, "i int, j int, s long")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    s1 = [0] * dim
    s2 = [[0] * dim for _ in range(dim)]
    n = 0
    for r in agg:
        if r["i"] == -1:
            n = int(r["s"])
        elif r["j"] == -1:
            s1[r["i"]] = int(r["s"])
        else:
            s2[r["i"]][r["j"]] = int(r["s"])
            s2[r["j"]][r["i"]] = int(r["s"])
    return s1, s2, n


def _floordiv(a: int, m: int) -> int:
    """Exact floor division via the divisible-first trick: make the
    numerator exactly divisible, then divide. ((a % m) + m) % m is the
    non-negative remainder under BOTH Python's floor-mod and
    DuckDB/Java's dividend-sign %, so the three engines agree."""
    r = ((a % m) + m) % m
    return (a - r) // m


def _pca_seed_vec(dim: int, comp: int, seed: int) -> list[int]:
    """md5-seeded integer iterate, uniform in [-2^19, 2^19) — pure
    function of (seed, comp, k); DuckDB rebuilds it cell-for-cell."""
    half = 1 << (VBITS - 1)
    return [
        int(hashlib.md5(f"{seed}:pca:{comp}:{k}".encode()).hexdigest()[:8], 16)
        % (2 * half)
        - half
        for k in range(dim)
    ]


def int_power_components(
    s1: list[int],
    s2: list[list[int]],
    n: int,
    dim: int,
    k: int = 2,
    seed: int = PCA_SEED,
    iters: int = INT_PCA_ITERS,
) -> list[list[int]]:
    """Top-k seeded integer power iteration with exact deflation.

    C = n·S2 − S1·S1ᵀ (the covariance scaled by n²·2^(2b) — scaling
    does not change eigenvectors). Each iteration: exact integer
    matvec w = C·v, then a power-of-two floor rescale back into the
    ±2^VBITS budget (shift = bitlen(max|w|) − VBITS — the integer
    stand-in for float normalization; power iteration is
    self-correcting so the dropped low bits don't accumulate), then
    for later components an exact integer Gram-Schmidt step against
    each finished component. All driver-side Python-int arithmetic on
    a d×d matrix — O(d²·iters), independent of corpus size — and every
    op mirrors a DuckDB HUGEINT op exactly (sql_int_pca_projection).
    """
    cov = [[n * s2[i][j] - s1[i] * s1[j] for j in range(dim)] for i in range(dim)]
    comps: list[list[int]] = []
    for c in range(1, k + 1):
        v = _pca_seed_vec(dim, c, seed)
        for _ in range(iters):
            w = [sum(cov[i][j] * v[j] for j in range(dim)) for i in range(dim)]
            mx = max(abs(x) for x in w)
            # Oracle-envelope fuse (ADVICE r7): Python ints are
            # unbounded, but the DuckDB mirror's bitlen pre-shift is
            # exact only while mx // 2^32 fits BIGINT (bitlen(mx) <=
            # 95; |w| ~ n^2 * 2^50, so n up to ~4M rows). Past that the
            # oracle would SILENTLY diverge — fail loudly instead. At
            # such corpus sizes use the float top_components path,
            # which has no integer envelope.
            if mx.bit_length() > 95:
                raise ValueError(
                    f"int_power_components iterate magnitude 2^{mx.bit_length()} "
                    f"exceeds the DuckDB oracle's exact-bitlen envelope (2^95; "
                    f"corpus ~> 4M rows). Use top_components (float path) — "
                    f"the integer contract is an oracle-portability device, "
                    f"not the production PCA."
                )
            m = 1 << max(mx.bit_length() - VBITS, 0)
            v = [_floordiv(x, m) for x in w]
            for p in comps:
                vd = sum(v[j] * p[j] for j in range(dim))
                pp = sum(x * x for x in p)
                v = [v[j] - _floordiv(vd * p[j], pp) for j in range(dim)]
        comps.append(v)
    return comps


def int_project(
    df: DataFrame,
    components: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact integer projection: pc_c = Σ_k floor(x_k·2^b)·v_c[k], a
    JVM codegen fold against literal int components — int64-exact, so
    the corpus pass is bit-portable across engines (|fp|·|v|·d ≤
    2^12·2^28·2^6 < 2^63)."""
    cols = [F.col(id_col)]
    for ci, comp in enumerate(components):
        lit = ", ".join(f"{int(x)}L" for x in comp)
        cols.append(
            F.expr(
                f"aggregate(zip_with({vec_col}, array({lit}), "
                f"(x, y) -> CAST(floor(CAST(x AS DOUBLE) * {1 << QP_BITS}) AS BIGINT) * y), "
                f"CAST(0 AS BIGINT), (acc, t) -> acc + t)"
            ).alias(f"pc{ci + 1}")
        )
    return df.select(*cols)


def sql_int_pca_projection(
    vec_rel: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = PCA_SEED,
    iters: int = INT_PCA_ITERS,
) -> str:
    """(vec_id, pc1, pc2) — DuckDB mirror of the integer PCA, TRAINING
    included: the seeded power iterations are unrolled as materialized
    CTEs (the integer-Lloyd / sql_ivf_topk playbook). Sufficient
    statistics from a self-join of the floor-quantized unnest, HUGEINT
    covariance, md5 seed iterate, exact matvec, the bitlen-based
    power-of-two rescale (bitlen computed exactly on HUGEINT via a
    2^32 pre-shift so bin() only ever sees BIGINT), divisible-first
    floor division everywhere (DuckDB // truncates, Python floors),
    and exact integer deflation for pc2."""
    q = 1 << QP_BITS
    half = 1 << (VBITS - 1)
    parts = [
        f"""WITH _x AS MATERIALIZED (
      SELECT {id_col} AS vec_id, k.k AS k,
             CAST(floor(CAST({vec_col}[k.k + 1] AS DOUBLE) * {q}) AS BIGINT) AS x
      FROM {vec_rel}, generate_series(0, {dim - 1}) k(k)
    ),
    _nn AS (SELECT COUNT(*) AS n FROM {vec_rel}),
    _s1 AS (SELECT k, SUM(x) AS s1 FROM _x GROUP BY k),
    _cov AS MATERIALIZED (
      SELECT s2.i, s2.j,
             CAST(nn.n AS HUGEINT) * s2.s2 - CAST(p.s1 AS HUGEINT) * q.s1 AS c
      FROM (SELECT a.k AS i, b.k AS j, SUM(a.x * b.x) AS s2
            FROM _x a JOIN _x b ON a.vec_id = b.vec_id
            GROUP BY a.k, b.k) s2
      JOIN _s1 p ON p.k = s2.i
      JOIN _s1 q ON q.k = s2.j
      CROSS JOIN _nn nn
    )"""
    ]

    def seed_cte(c: int) -> str:
        return f"""_v{c}_0 AS (
      SELECT k.k AS k,
             CAST(('0x' || substr(md5('{seed}:pca:{c}:' || k.k), 1, 8)) AS BIGINT)
               % {2 * half} - {half} AS v
      FROM generate_series(0, {dim - 1}) k(k)
    )"""

    def iter_ctes(c: int, t: int, deflate_against: str | None) -> list[str]:
        out = [
            f"""_w{c}_{t} AS (
      SELECT cc.i AS k, SUM(cc.c * v.v) AS w
      FROM _cov cc JOIN _v{c}_{t} v ON v.k = cc.j
      GROUP BY cc.i
    )""",
            # modulus 2^max(bitlen(max|w|) - VBITS, 0), built from <=30-bit
            # BIGINT shifts so no signed shift overflows
            f"""_p{c}_{t} AS (
      SELECT CAST(1 AS HUGEINT)
             * (CAST(1 AS BIGINT) << least(s, 30))
             * (CAST(1 AS BIGINT) << least(greatest(s - 30, 0), 30))
             * (CAST(1 AS BIGINT) << greatest(s - 60, 0)) AS m
      FROM (SELECT greatest(
              CASE WHEN mx // 4294967296 > 0
                   THEN length(bin(CAST(mx // 4294967296 AS BIGINT))) + 32
                   ELSE length(bin(CAST(mx AS BIGINT))) END - {VBITS}, 0) AS s
            FROM (SELECT MAX(abs(w)) AS mx FROM _w{c}_{t}))
    )""",
        ]
        # Oracle validity envelope (ADVICE r7): the bitlen-via-2^32
        # pre-shift above is exact only while mx // 2^32 fits BIGINT,
        # i.e. max|w| < 2^95, and the three-shift modulus caps the
        # rescale shift at 90 (bitlen(max|w|) <= VBITS + 90 = 110). The
        # binding constraint is the pre-shift: |w| <= dim * max|C| *
        # 2^VBITS with |C| <= n^2 * 2^(2*QP_BITS+4) for unit-ish inputs,
        # so |w| ~ n^2 * 2^50 and the oracle is exact for corpora up to
        # n ~ 2^22 (~4M embedding rows) — far above any oracle SF
        # (DuckDB runs at sf<=1, n<=60k). The ENGINE side (int_pca_
        # projection) uses unbounded Python ints and has no such bound;
        # only the DuckDB mirror has this envelope, and int_pca_
        # projection raises if n exceeds it so a divergence can never
        # be silent.
        rescaled = f"""(
      SELECT w.k, CAST((w.w - (((w.w % p.m) + p.m) % p.m)) // p.m AS BIGINT) AS v
      FROM _w{c}_{t} w CROSS JOIN _p{c}_{t} p
    )"""
        if deflate_against is None:
            out.append(f"_v{c}_{t + 1} AS MATERIALIZED {rescaled}")
        else:
            f1 = deflate_against
            out.append(f"_r{c}_{t} AS MATERIALIZED {rescaled}")
            out.append(f"""_d{c}_{t} AS (
      SELECT SUM(CAST(r.v AS HUGEINT) * f.v) AS vd
      FROM _r{c}_{t} r JOIN {f1} f ON f.k = r.k
    )""")
            out.append(f"""_v{c}_{t + 1} AS MATERIALIZED (
      SELECT r.k,
             CAST(r.v - ((d.vd * f.v) - ((((d.vd * f.v) % g.pp) + g.pp) % g.pp)) // g.pp
                  AS BIGINT) AS v
      FROM _r{c}_{t} r JOIN {f1} f ON f.k = r.k
      CROSS JOIN _d{c}_{t} d CROSS JOIN _g g
    )""")
        return out

    parts.append(seed_cte(1))
    for t in range(iters):
        parts.extend(iter_ctes(1, t, None))
    parts.append(
        f"_g AS (SELECT SUM(CAST(v AS HUGEINT) * v) AS pp FROM _v1_{iters})"
    )
    parts.append(seed_cte(2))
    for t in range(iters):
        parts.extend(iter_ctes(2, t, f"_v1_{iters}"))
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT x.vec_id,
           CAST(SUM(x.x * a.v) AS BIGINT) AS pc1,
           CAST(SUM(x.x * b.v) AS BIGINT) AS pc2
    FROM _x x JOIN _v1_{iters} a ON a.k = x.k JOIN _v2_{iters} b ON b.k = x.k
    GROUP BY x.vec_id
    """
    )
