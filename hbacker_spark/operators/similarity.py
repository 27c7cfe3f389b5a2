"""Approximate nearest-neighbor search: the 100 TB scale path.

Brute-force cosine (functions/similarity.py) is exact but O(n·d) per
query / O(n²·d) for pairs. This module adds random-hyperplane LSH
(SimHash-for-cosine) bucketing so only a bucket's worth of candidates is
ever scored exactly:

  signatures (one numpy pass, Arrow-batched) → bucket join / bucket
  filter → exact rerank of candidates only.

Determinism AND portability (r6): hyperplane components are md5-derived
INTEGERS (``md5int(seed:t:p:k) − 2³¹``, uniform in [−2³¹, 2³¹)) and the
sign test runs on floor-quantized vector components
(``floor(v·2²⁰)`` — exact: float32→float64 is lossless and 2²⁰ is a
power of two), so every signature is pure INT64 arithmetic — no float
summation order anywhere. That makes bucket assignments not just
run-stable but ENGINE-portable: DuckDB rebuilds the identical bucket
table from the same md5 construction, which is what moved the whole
LSH candidate family from rows-only to fully oracled (same playbook as
the cms_heavy_hitters md5 grid). LSH quality is unaffected — random
hyperplanes need only a symmetric direction distribution, and the
2⁻²⁰ quantization error is orders below the data scale (recall floors
re-measured in ann_recall_smoke.py). numpy int64 matmul keeps the
signature pass vectorized.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbacker_spark.sources.tables import driver_local_df

DEFAULT_PLANES = 6  # bits per table
DEFAULT_TABLES = 8
SEED = 42
QUANT = 1 << 20  # vector quantization scale (exact power of two)


def recommended_planes(
    n_rows: int, target_bucket: int = 256, lo: int = 4, hi: int = 24
) -> int:
    """Size the LSH bucket count with the corpus: the smallest
    ``n_planes`` whose expected bucket occupancy n_rows/2^planes is at
    or under ``target_bucket``. The registered queries PIN n_planes=6
    for oracle determinism at test SFs; production calls pass
    ``n_planes=recommended_planes(df.count())`` so buckets never
    saturate the hot-bucket cap as the corpus grows — the measured x100
    lever (X100_RECEIPT.json: at 200k vectors, planes 6→12 cuts
    candidate pairs 255M→58M and candidate-gen wall 113s→26s; with the
    pinned geometry 100x over capacity every bucket hits the cap and
    the pair aggregation spills 44.5GB — bounded, but avoidable).
    target_bucket=256 keeps per-bucket expansion ≤ ~32k pairs while
    leaving density for recall; clamp [4, 24] guards degenerate inputs.
    """
    if n_rows <= 0:
        return lo
    planes = lo
    while planes < hi and (n_rows >> planes) > target_bucket:
        planes += 1
    return planes


def recommended_centroids(n_rows: int, lo: int = 16, hi: int = 4096) -> int:
    """Size the IVF centroid count with the corpus (VERDICT r8 #2):
    the classic ``~sqrt(n)`` rule, clamped. At the pinned test geometry
    (16 centroids) recall@10 diluted from 0.637 at x10 to 0.562 at x100
    (X100_RECEIPT.json) — the lists get coarser as the corpus grows, so
    the same nprobe scans a less-targeted candidate set. sqrt(n) keeps
    expected list occupancy at ~sqrt(n) rows, the balance point between
    probe cost (nprobe lists scanned exactly) and assignment cost
    (n_centroids distances per vector). The registered
    ``ann_ivf_cosine_topk`` query PINS n_centroids=16 for oracle
    determinism; production calls leave ``n_centroids=None`` and get
    this sizing for free (ivf_assign/ivf_topk auto-wire it)."""
    import math

    if n_rows <= 0:
        return lo
    return max(lo, min(hi, int(math.isqrt(n_rows))))


def recommended_multiprobe(n_planes: int, lo: int = 2, hi: int = 64) -> int:
    """Probe count for :func:`ann_topk`'s 2-bit perturbation sequence
    at a given plane count: ``2^(n_planes - DEFAULT_PLANES + 1)``,
    clamped — i.e. hold ~2x the PINNED geometry's per-table candidate
    mass as buckets get 2x thinner per extra plane. Measured against
    exact top-10 (ann_recall_smoke / SCALE_NOTES r9): at x10 auto
    (7 planes → m=4..8) recall 0.85-0.938 vs pinned mp2's 0.838; at
    x100 auto (10 planes → m=32) recall **0.925**, above the pinned
    0.838, at <3% of the corpus scanned per table. Pass the result as
    ``ann_topk(..., multiprobe=recommended_multiprobe(p),
    multiprobe_bits=2)``; the knob needs no reindexing, so it can be
    raised per query."""
    if n_planes <= DEFAULT_PLANES:
        return lo
    return max(lo, min(hi, 1 << (n_planes - DEFAULT_PLANES + 1)))


def recommended_nprobe(n_centroids: int, scan_fraction: float = 0.25) -> int:
    """Probe-list count holding the expected scanned-corpus fraction at
    the pinned test geometry's (nprobe=4 of 16 = 25%): finer lists at
    the same scan budget are strictly more targeted, which is how the
    auto geometry recovers the x100 recall dilution without paying more
    rerank work per query. Floor of 4 keeps tiny corpora multi-list."""
    return max(4, int(round(n_centroids * scan_fraction)))


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = SEED) -> np.ndarray:
    """(n_tables, n_planes, dim) INT64 hyperplanes from md5 — the
    portable construction DuckDB mirrors cell-for-cell (sql_lsh_sig).
    Overflow headroom: |component| < 2³¹, |quantized v| ≲ 2²⁴, dim 64
    → |dot| < 2⁶¹ — safely inside int64."""
    flat = np.empty(n_tables * n_planes * dim, dtype=np.int64)
    i = 0
    for t in range(n_tables):
        for p in range(n_planes):
            for k in range(dim):
                hx = hashlib.md5(f"{seed}:{t}:{p}:{k}".encode()).hexdigest()
                flat[i] = int(hx[:8], 16) - 2147483648
                i += 1
    return flat.reshape(n_tables, n_planes, dim)


def _quantize(m: np.ndarray) -> np.ndarray:
    """floor(v · 2²⁰) as int64 — bit-identical to the SQL mirror
    ``CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)``."""
    return np.floor(m.astype("float64") * QUANT).astype(np.int64)


def lsh_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = DEFAULT_PLANES,
    n_tables: int = DEFAULT_TABLES,
    seed: int = SEED,
) -> DataFrame:
    """(id, table_idx, bucket) rows: per hash table, the sign-pattern of
    the vector against that table's hyperplanes packed into an int.
    One Arrow-batched numpy pass; fan-out = n_tables rows per vector.
    The id column keeps its incoming type (ADVICE r3: a hardcoded long
    schema silently corrupted non-long ids).
    """
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def batches(it):
        planes = None
        for pdf in it:
            if not len(pdf):
                continue
            m = _quantize(np.stack(pdf[vec_col].to_numpy()))
            if planes is None:
                planes = _hyperplanes(m.shape[1], n_planes, n_tables, seed)
            ids = pdf[id_col].to_numpy()
            weights = 1 << np.arange(n_planes)
            for t in range(n_tables):
                signs = (m @ planes[t].T) > 0  # (n, n_planes), exact int64 dots
                buckets = (signs * weights).sum(axis=1)
                yield pd.DataFrame({"vec_id": ids, "table_idx": t, "bucket": buckets})

    return df.select(F.col(id_col).alias("vec_id"), F.col(vec_col)).mapInPandas(
        batches, schema=f"vec_id {id_type}, table_idx int, bucket long"
    )


def query_probe_buckets(
    query_vec: list[float],
    n_planes: int = DEFAULT_PLANES,
    n_tables: int = DEFAULT_TABLES,
    seed: int = SEED,
    multiprobe: int = 0,
    multiprobe_bits: int = 1,
) -> dict[int, list[int]]:
    """Per-table probe buckets for a query vector.

    ``multiprobe=0`` is classic single-probe (the query's own bucket per
    table). ``multiprobe=m`` adds the m nearest perturbations of the
    query's signature — Lv et al.'s multi-probe LSH: perturbation sets
    ranked ascending by the SUM of the flipped planes' |int64 margins|
    (the least-confident bits are the likeliest to be on the wrong
    side), ties to fewer flipped bits then plane order.
    ``multiprobe_bits=1`` (default) restricts to Hamming-1 flips —
    byte-identical ordering to the pre-r9 implementation, which the
    registered ``ann_multiprobe_cosine_topk`` and its SQL mirror
    (:func:`sql_lsh_query_probes`) pin. ``multiprobe_bits=2`` adds
    2-bit perturbations to the candidate sequence — the recall knob the
    AUTO geometry needs at scale: sparse auto buckets exhaust the
    n_planes 1-bit flips quickly, while the 2-bit sequence gives
    m up to n_planes·(n_planes+1)/2 probes per table with the same
    no-reindex property (first min(m, per-size counts) entries of the
    generalized sequence with bits=2 still begin with the 1-bit flips
    whose single margins are smallest, so widening bits only APPENDS
    probes for m beyond what 1-bit can express — superset, never a
    reordering of the 1-bit prefix... precisely: any 2-bit set's score
    ≥ its larger member's 1-bit score, and ties break to fewer bits).
    All arithmetic is the same exact int64 as the signatures, so the
    probe set stays a deterministic pure function of the query."""
    q = _quantize(np.asarray(query_vec, dtype="float64"))
    planes = _hyperplanes(len(q), n_planes, n_tables, seed)
    weights = 1 << np.arange(n_planes)
    probes: dict[int, list[int]] = {}
    for t in range(n_tables):
        dots = planes[t] @ q  # (n_planes,) exact int64 margins
        base = int((((dots > 0) * weights)).sum())
        buckets = [base]
        if multiprobe > 0:
            margins = np.abs(dots)
            # perturbation candidates: (score, n_bits, plane tuple) —
            # sorted ascending; bits=1 reduces exactly to the legacy
            # lexsort((plane_idx), |margin|) ordering
            cands: list[tuple[int, int, tuple[int, ...], int]] = [
                (int(margins[p]), 1, (p,), 1 << p) for p in range(n_planes)
            ]
            if multiprobe_bits >= 2:
                cands += [
                    (int(margins[p] + margins[r]), 2, (p, r), (1 << p) | (1 << r))
                    for p in range(n_planes)
                    for r in range(p + 1, n_planes)
                ]
            cands.sort(key=lambda c: (c[0], c[1], c[2]))
            buckets += [base ^ mask for _, _, _, mask in cands[:multiprobe]]
        probes[t] = buckets
    return probes


def ann_topk(
    spark: SparkSession,
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = DEFAULT_TABLES,
    seed: int = SEED,
    multiprobe: int = 0,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Top-k by cosine to ``query_vec``, LSH-pruned. ``n_planes=None``
    auto-sizes with the corpus (:func:`recommended_planes`, one count
    job) — pass the pinned geometry explicitly when querying an index
    whose signatures were built with it.

    Recall guidance (measured, X100_RECEIPT.json / ann_recall_smoke):
    the auto geometry keeps candidate cost bounded as the corpus
    grows, which TRADES single-probe recall (sparser buckets: 0.263 at
    x100 vs 0.625 at the saturated pinned geometry). ``multiprobe`` is
    this function's recall knob (no reindexing) — and with
    ``multiprobe_bits=2`` the full perturbation sequence recovers it
    outright (x10 auto: 0.412 single → 0.938 at multiprobe=8/bits=2,
    above even the pinned-geometry 0.838; registered and oracled as
    ``ann_multiprobe2bit_cosine_topk``). :func:`ivf_topk`'s auto
    geometry (0.85 recall@10 at x100) is the other serving-grade
    option — LSH buckets are the PAIRWISE dedup structure, where auto
    sizing strictly wins (zero spill + 1.9x more true near-dups found
    at x100).

    Candidate set = vectors sharing any table's probe bucket with the
    query (``multiprobe`` widens each table's probe set to the m
    least-confident Hamming-1 neighbors — see :func:`query_probe_buckets`).
    The bucket match is evaluated INSIDE the one Arrow signature pass
    (the query's buckets are a tiny closure constant): a vector's
    signatures never leave the executor unless it is a candidate, so
    the pass emits O(candidates) rows instead of materializing the full
    n·n_tables signature index and filtering it afterwards. Only
    candidates get the exact cosine (fold expression, JVM-side).
    Returns (vec_id, cos_sim, rnk) — rnk over the candidate set. Top-k
    via orderBy().limit(k) → TakeOrderedAndProject (distributed partial
    top-k per partition + k-row merge, no single-reducer global window);
    rnk is re-derived over just the k surviving rows.
    """
    import pandas as pd
    from pyspark.sql import Window

    from hbacker_spark.functions.similarity import cosine

    if n_planes is None:
        n_planes = recommended_planes(df.count())
    weights = 1 << np.arange(n_planes)
    q_probes = query_probe_buckets(query_vec, n_planes, n_tables, seed, multiprobe, multiprobe_bits)

    def candidate_batches(it):
        local_planes = None
        for pdf in it:
            if not len(pdf):
                continue
            m = _quantize(np.stack(pdf[vec_col].to_numpy()))
            if local_planes is None:
                local_planes = _hyperplanes(m.shape[1], n_planes, n_tables, seed)
            ids = pdf["vec_id"].to_numpy()
            hit = np.zeros(len(ids), dtype=bool)
            for t, pset in q_probes.items():
                signs = (m @ local_planes[t].T) > 0
                buckets = (signs * weights).sum(axis=1)
                hit |= np.isin(buckets, pset)
            if hit.any():
                yield pd.DataFrame({"vec_id": ids[hit]})

    # no distinct needed: each input vector emits at most one row (the
    # per-table matches are OR-folded before emit), saving a shuffle.
    # Schema follows the incoming id type (ADVICE r3).
    id_type = df.schema[id_col].dataType.simpleString()
    candidate_ids = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col)).mapInPandas(
        candidate_batches, schema=f"vec_id {id_type}"
    )

    candidates = df.join(candidate_ids, df[id_col] == candidate_ids.vec_id, "left_semi")
    q_df = driver_local_df(spark, [(query_vec,)], "q_emb array<float>")
    scored = candidates.crossJoin(F.broadcast(q_df)).select(
        F.col(id_col),
        F.round(cosine(vec_col, "q_emb"), 6).alias("cos_sim"),
    )
    top = scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("cos_sim").desc(), F.col(id_col))  # over k rows only
    return top.withColumn("rnk", F.row_number().over(w))


# Integer Lloyd (r6): vectors are floor-quantized at 2²⁰ (same QUANT as
# the LSH family), centroids LIVE as int64 fixed-point at the same
# scale, assignment is exact integer L2 argmin (first-index = smallest
# centroid id on ties), and the centroid update is an exact integer
# floor-division of the per-cluster component sums — NO float appears
# anywhere in training or assignment, so the whole index build is not
# just run-deterministic but ENGINE-PORTABLE (sql_ivf_topk unrolls the
# identical iterations in DuckDB, the same playbook that oracled the
# decimal PageRank and the md5-hyperplane LSH family). Overflow audit:
# |x| <= 2²⁰ (unit-norm inputs), |c| <= 2²⁰, per-pair distance
# Σ₆₄(x−c)² <= 2⁴⁸, partial component sums <= n·2²⁰ — int64-safe to
# ~2⁴³ vectors per cluster.
TRAIN_ITERS = 3
_IVF_SEED_HALF = 1 << 17  # seed-centroid component range: [-2^17, 2^17)


def _seed_centroids(dim: int, n_centroids: int, seed: int) -> np.ndarray:
    """(n_centroids, dim) INT64 seed centroids from md5 — uniform in
    [-2¹⁷, 2¹⁷) at the 2²⁰ fixed-point scale (≈ ±0.125, the component
    scale of a 64-dim unit vector). Pure function of (seed, dim, n):
    zero jobs, and DuckDB rebuilds it cell-for-cell (sql_ivf_topk)."""
    flat = np.empty(n_centroids * dim, dtype=np.int64)
    i = 0
    for j in range(n_centroids):
        for k in range(dim):
            hx = hashlib.md5(f"{seed}:ivf:{j}:{k}".encode()).hexdigest()
            flat[i] = int(hx[:8], 16) % (2 * _IVF_SEED_HALF) - _IVF_SEED_HALF
            i += 1
    return flat.reshape(n_centroids, dim)


def _int_assign(m_q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Exact integer L2 argmin of quantized rows against int centroids.
    numpy argmin takes the FIRST minimum, i.e. ties break to the
    smallest centroid id — mirrored in SQL by the dist·n+j min-key."""
    d = (
        (m_q * m_q).sum(axis=1, keepdims=True)
        - 2 * (m_q @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )
    return d.argmin(axis=1)


def train_ivf_centroids(
    df: DataFrame,
    dim: int,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    seed: int = SEED,
    n_iter: int = TRAIN_ITERS,
) -> np.ndarray:
    """Seeded mini k-means (integer Lloyd) for IVF centroids.

    Each iteration is ONE distributed pass: an Arrow-batched task
    floor-quantizes its vectors (exact), assigns them to the nearest
    current int64 centroid (exact integer L2 argmin), and emits
    per-centroid int64 component partial sums — exact and
    order-independent, so trained centroids are identical regardless
    of partitioning/shuffle arrival order. The grouped sum is
    n_centroids·dim tiny rows; the driver collects just that,
    floor-divides (exact), and broadcasts the next round's centroids
    in the task closure. Fixed md5 seeds + fixed iteration count +
    exact integer arithmetic = bit-identical centroids every run AND
    every engine: DuckDB unrolls the same iterations in sql_ivf_topk,
    which is what moved ann_ivf_cosine_topk from rows-only to fully
    oracled. Empty clusters keep their previous centroid (LEFT JOIN +
    COALESCE on the SQL side). Returns int64 centroids at the 2²⁰
    fixed-point scale.
    """
    import pandas as pd

    cents = _seed_centroids(dim, n_centroids, seed)
    vecs = df.select(F.col(vec_col).alias("_v"))
    for _ in range(n_iter):
        frozen = cents.copy()

        def partials(it, _c=frozen):
            for pdf in it:
                if not len(pdf):
                    continue
                m_q = _quantize(np.stack(pdf["_v"].to_numpy()))
                a = _int_assign(m_q, _c)
                out_c, out_i, out_s, out_n = [], [], [], []
                for cid in np.unique(a):
                    rows = m_q[a == cid]
                    s = rows.sum(axis=0)  # int64, exact
                    out_c.extend([int(cid)] * len(s))
                    out_i.extend(range(len(s)))
                    out_s.extend(int(x) for x in s)
                    out_n.extend([len(rows)] * len(s))
                yield pd.DataFrame(
                    {"cid": out_c, "idx": out_i, "s": out_s, "n": out_n}
                )

        agg = (
            vecs.mapInPandas(partials, "cid int, idx int, s long, n long")
            .groupBy("cid", "idx")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        new = frozen.copy()
        for r in agg:
            # exact floor division (numpy // floors; the SQL mirror
            # makes the numerator exactly divisible first because
            # DuckDB's // truncates toward zero)
            new[r["cid"], r["idx"]] = np.int64(r["s"]) // np.int64(r["n"])
        cents = new
    return cents


def ivf_assign(
    df: DataFrame,
    n_centroids: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
    dim: int | None = None,
    train_iters: int = 0,
) -> tuple[DataFrame, np.ndarray]:
    """IVF (inverted-file) partitioning: assign every vector to its
    nearest of ``n_centroids`` centroids (exact integer L2 over the
    2²⁰-quantized components). ``n_centroids=None`` auto-sizes with
    the corpus (:func:`recommended_centroids`, sqrt(n) clamped — one
    count job); the registered oracle query pins 16 explicitly.
    Returns ((id, centroid_id) rows, int64
    centroid matrix). One Arrow-batched numpy pass; at scale this is
    the list-building step done once at ingest, and queries probe a
    few lists instead of the corpus.

    ``train_iters=0`` uses the md5-seeded integer centroids (pure
    function of (seed, dim, n_centroids) — zero jobs). ``train_iters>0``
    runs that many deterministic integer Lloyd iterations
    (:func:`train_ivf_centroids`, one bounded pass each) — real IVF
    quality with the same bit-stable, engine-portable contract.
    """
    import pandas as pd

    # The centroid matrix must be derivable driver-side for query
    # probing WITHOUT a driver job over the corpus (a .first() probe is
    # a full scan stage at 100 TB). Require dim explicitly; array
    # columns carry no length in the schema.
    if dim is None:
        raise ValueError(
            "ivf_assign requires dim= (embedding dimensionality): the "
            "probe-side centroid matrix is derived driver-side and "
            "inferring dim would cost a driver job over the corpus"
        )
    if n_centroids is None:
        n_centroids = recommended_centroids(df.count())
    if train_iters > 0:
        cents = train_ivf_centroids(
            df, dim, n_centroids, vec_col, seed, n_iter=train_iters
        )
    else:
        cents = _seed_centroids(dim, n_centroids, seed)

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            m_q = _quantize(np.stack(pdf[vec_col].to_numpy()))
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "centroid_id": _int_assign(m_q, cents),
                }
            )

    # id keeps its incoming type (same ADVICE-r3 class as lsh_signatures:
    # a hardcoded long schema silently corrupts non-long ids)
    id_type = df.schema[id_col].dataType.simpleString()
    assigned = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col)).mapInPandas(
        batches, schema=f"vec_id {id_type}, centroid_id int"
    )
    return assigned, cents


def ivf_topk(
    spark: SparkSession,
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int | None = None,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
    train_iters: int = TRAIN_ITERS,
) -> DataFrame:
    """IVF search: score the query against the centroids, probe the
    ``nprobe`` nearest lists (exact integer L2, centroid-id tiebreak),
    exact-rerank only those lists' vectors by cosine. Expected
    candidate fraction ≈ nprobe/n_centroids of the corpus. Centroids
    are k-means-trained by default (deterministic integer Lloyd,
    :func:`train_ivf_centroids`); pass ``train_iters=0`` for the
    md5-seeded untrained form.

    Auto geometry (VERDICT r8 #2, the DEFAULT): ``n_centroids=None``
    applies :func:`recommended_centroids` (sqrt(n), one count job) and
    ``nprobe=None`` applies :func:`recommended_nprobe` — the same
    scanned-corpus fraction as the pinned 4-of-16 test geometry over
    finer, better-targeted lists, which is what recovers the recall
    the fixed 16-centroid index loses as the corpus grows
    (X100_RECEIPT.json: 0.637 at x10 → 0.562 at x100 pinned). The
    registered ``ann_ivf_cosine_topk`` pins 16/4 for oracle
    determinism.
    """
    if n_centroids is None:
        n_centroids = recommended_centroids(df.count())
    assigned, cents = ivf_assign(
        df, n_centroids, id_col, vec_col, seed, dim=len(query_vec), train_iters=train_iters
    )
    return ivf_topk_indexed(
        spark, df, assigned, cents, query_vec, k=k, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col,
    )


def rank_probe_lists(cents: np.ndarray, query_vec: list[float], nprobe: int) -> list[int]:
    """The ``nprobe`` nearest centroid ids for a query — exact integer
    L2 over the quantized query with centroid-id tiebreak (= the SQL
    mirror's ORDER BY (dist, j) LIMIT nprobe). Driver-side numpy over
    the tiny centroid matrix; shared by the in-memory and stored
    serving forms so their probe sets are identical by construction.

    Tiebreak via lexsort, NOT a ``d*n+j`` composite key (ADVICE r9):
    d is bounded by dim·(2·QUANT)² ≈ dim·2^42, so the composite
    product silently wraps int64 for dim > ~512 at the 4096-centroid
    cap — numpy wraps without raising, corrupting the probe ranking.
    lexsort's last key is primary: sort by d, then centroid id."""
    n_centroids = cents.shape[0]
    q_q = _quantize(np.asarray(query_vec, dtype="float64")[None, :])
    d = (
        (q_q * q_q).sum(axis=1, keepdims=True)
        - 2 * (q_q @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )[0]
    return np.lexsort((np.arange(n_centroids), d))[:nprobe].tolist()


def ivf_topk_indexed(
    spark: SparkSession,
    df: DataFrame,
    assigned: DataFrame,
    cents: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF query against a PREBUILT index — the serving form.

    :func:`ivf_topk` retrains + reassigns per call, which is right for
    one-shot analytics but wrong for query serving: the index build
    (integer Lloyd over the corpus) is the expensive, once-at-ingest
    step. Build it once with :func:`ivf_assign` (persist ``assigned``
    partitioned by centroid_id so each probe prunes to its lists), then
    answer every query with this function: probe ranking is a
    driver-side k×dim numpy op on the tiny centroid matrix, candidate
    selection is a semi-join against the stored assignment, and only
    the probed lists get the exact cosine. Identical results to the
    retraining form by construction (pinned in tests). ``nprobe=None``
    sizes from the index's own centroid count (25% scan fraction)."""
    from pyspark.sql import Window

    from hbacker_spark.functions.similarity import cosine

    if nprobe is None:
        nprobe = recommended_nprobe(cents.shape[0])
    probe = rank_probe_lists(cents, query_vec, nprobe)

    candidate_ids = assigned.filter(F.col("centroid_id").isin(probe)).select("vec_id")
    candidates = df.join(candidate_ids, df[id_col] == candidate_ids.vec_id, "left_semi")
    q_df = driver_local_df(spark, [(query_vec,)], "q_emb array<float>")
    scored = candidates.crossJoin(F.broadcast(q_df)).select(
        F.col(id_col), F.round(cosine(vec_col, "q_emb"), 6).alias("cos_sim")
    )
    top = scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("cos_sim").desc(), F.col(id_col))  # over k rows only
    return top.withColumn("rnk", F.row_number().over(w))


def ann_topk_indexed(
    spark: SparkSession,
    df: DataFrame,
    sigs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = DEFAULT_PLANES,
    n_tables: int = DEFAULT_TABLES,
    seed: int = SEED,
    multiprobe: int = 0,
    multiprobe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH top-k against a PREBUILT signature index — the serving form.

    :func:`ann_topk` re-hashes the corpus per query (right for one-shot
    analytics; the signature pass is the expensive step). For query
    serving, build the index once with :func:`lsh_signatures` (persist
    it partitioned/bucketed by (table_idx, bucket) so a probe prunes to
    its buckets), then answer each query here: the probe set is a
    driver-side pure function of the query vector
    (:func:`query_probe_buckets` — tiny, no job), candidates come from
    one broadcast join of the ~(1+multiprobe)·n_tables probe rows
    against the stored signatures, and only candidates get the exact
    cosine. ``n_planes``/``n_tables``/``seed`` MUST be the geometry the
    index was built with (no auto here — the index pins it; same
    contract as the incremental postings state). Identical results to
    the re-hashing form by construction (pinned in tests)."""
    from pyspark.sql import Window

    from hbacker_spark.functions.similarity import cosine

    probes = query_probe_buckets(query_vec, n_planes, n_tables, seed, multiprobe, multiprobe_bits)
    probe_rows = [(t, int(b)) for t, bs in probes.items() for b in bs]
    probe_df = driver_local_df(spark, probe_rows, "table_idx int, bucket long")
    candidate_ids = (
        sigs.join(F.broadcast(probe_df), ["table_idx", "bucket"], "left_semi")
        .select("vec_id")
        .distinct()  # a vector can match in several tables
    )
    candidates = df.join(candidate_ids, df[id_col] == candidate_ids.vec_id, "left_semi")
    q_df = driver_local_df(spark, [(query_vec,)], "q_emb array<float>")
    scored = candidates.crossJoin(F.broadcast(q_df)).select(
        F.col(id_col), F.round(cosine(vec_col, "q_emb"), 6).alias("cos_sim")
    )
    top = scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("cos_sim").desc(), F.col(id_col))  # over k rows only
    return top.withColumn("rnk", F.row_number().over(w))


def capped_members(ds_col: str, n_col, max_bucket: int, seed: int):
    """Deterministic hot-bucket sample: keep the ``max_bucket`` members
    with the smallest md5(seed:id) rank, re-sorted by id so pair
    explodes keep vec_a < vec_b — a pseudo-random but run-stable draw,
    md5-based since r6 so the SQL oracle draws the identical sample.
    Shared by the batch builder (ann_candidate_pairs) and the
    incremental ingest's per-batch cap so both cap identically."""
    rank = (
        f"CAST(conv(substring(md5(CAST(concat('{int(seed)}:', CAST(x AS STRING)) "
        f"AS BINARY)), 1, 8), 16, 10) AS BIGINT)"
    )
    return F.when(n_col <= max_bucket, F.col(ds_col)).otherwise(
        F.expr(
            f"array_sort(transform(slice(array_sort("
            f"transform({ds_col}, x -> struct({rank} AS h, x AS v))"
            f"), 1, {int(max_bucket)}), s -> s.v))"
        )
    )


def ann_candidate_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = DEFAULT_TABLES,
    seed: int = SEED,
    max_bucket: int = 1024,
    explode_partitions: int | None = None,
) -> DataFrame:
    """All-pairs candidate generation via per-(table, bucket) posting
    lists (the pairwise analog of ann_topk; same shape as MinHash-LSH
    banding and ngram_jaccard's inverted index). Returns
    (vec_a, vec_b, n_shared_buckets), vec_a < vec_b.

    Hot-bucket bound: a bucket with more than ``max_bucket`` members is
    SAMPLED down to ``max_bucket`` members before pair expansion
    (deterministic: members ranked by xxhash64(id, seed), so the kept
    subset is a pseudo-random but run-stable draw). Without a cap one
    dense region (or an adversarial all-identical corpus) makes the
    expansion quadratic in that bucket's population; with sampling
    (ADVICE r3 — the previous outright DROP silently lost every
    candidate in a region dense enough to be hot across all n_tables)
    per-bucket fan-out stays <= max_bucket²/2 pairs while dense
    near-dup regions still emit candidates. Residual recall loss from
    capping is bounded by the n_tables independent chances each pair
    gets; :func:`ann_bucket_stats` reports how many buckets were
    capped (no silent caps). One shuffle builds the postings; pairs
    explode JVM-side from the sorted lists (no self-join, no second
    scan of the signatures).

    Sizing at scale (VERDICT r8 #1 — auto by DEFAULT): ``n_planes=None``
    counts the input once (one metadata-cheap job; at 100 TB, one scan
    the build amortizes over its whole chain) and applies
    :func:`recommended_planes` so buckets track corpus density instead
    of saturating the cap — the pinned n_planes=6 run 100x over
    capacity is the one measured spill in X100_RECEIPT.json (44.5GB;
    auto geometry removes it, and planes 6 → 12 cuts candidate pairs
    255M → 58M and wall 4.3x at 200k vectors). The registered oracle
    queries pass the pinned ``n_planes=DEFAULT_PLANES`` explicitly for
    engine-portable determinism at test SFs.

    Explode-amplification vs AQE (r9, measured): the posting-list
    relation is TINY (n·n_tables signature rows collapse to
    n_tables·2^planes lists, ~50MB of shuffle at 200k vectors), so
    AQE's size-based coalescing folds it into one or two reduce
    partitions — and the pair explode then amplifies ~100x INSIDE
    those few tasks, whose partial-aggregation state spills tens of GB
    no matter what spark.sql.shuffle.partitions says (measured: the
    x100 auto run still spilled 40.7GB at a 250-partition conf). AQE
    sizes by pre-explode bytes; it cannot see the amplification. The
    auto path therefore inserts an EXPLICIT corpus-scaled
    ``repartition(explode_partitions, table_idx, bucket)`` before the
    explode — user-specified repartitions are exempt from AQE
    coalescing, the extra exchange moves only the posting rows
    (kilobytes), and per-task pair volume lands at the measured
    no-spill density (~n_rows/800 partitions ≈ 800 vectors ≈ <1M pairs
    per task). Pinned-geometry callers (the registered oracle queries)
    keep their exact previous plan unless they pass
    ``explode_partitions`` themselves.
    """
    n_rows = None
    if n_planes is None:
        n_rows = df.count()
        n_planes = recommended_planes(n_rows)
    sigs = lsh_signatures(df, id_col, vec_col, n_planes, n_tables, seed)
    posts = (
        sigs.groupBy("table_idx", "bucket")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sort_array(F.collect_list("vec_id")).alias("ds"),
        )
        .filter(F.col("_n") >= 2)
        .withColumn("ds", capped_members("ds", F.col("_n"), max_bucket, seed))
    )
    if explode_partitions is None and n_rows is not None:
        explode_partitions = max(
            int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")),
            n_rows // 800,
        )
    if explode_partitions:
        # ROUND-ROBIN on purpose, not hash-by-(table_idx, bucket): a
        # hash repartition on the grouping keys is plan-time identical
        # to the groupBy's own exchange whenever explode_partitions ==
        # spark.sql.shuffle.partitions, so Catalyst elides it as
        # redundant and AQE then coalesces the surviving agg exchange
        # by its tiny pre-explode bytes — the measured 11-task/8GB-spill
        # re-exposure of the exact blind spot this repartition exists to
        # close. Round-robin never satisfies a hash requirement (always
        # kept, always AQE-exempt), and the explode needs no
        # co-location — any even spread of posting rows bounds per-task
        # pair volume, with better balance than bucket-hash under
        # capped hot buckets.
        posts = posts.repartition(explode_partitions)
    pairs = posts.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) -> "
                "transform(slice(ds, i + 2, size(ds) - i - 1), "
                "y -> struct(x AS vec_a, y AS vec_b))))"
            )
        ).alias("p")
    ).select(F.col("p.vec_a").alias("vec_a"), F.col("p.vec_b").alias("vec_b"))
    if explode_partitions:
        # same AQE blind spot on the REDUCE side of the pair count:
        # the final agg's exchange is coalesced by its ~2GB compressed
        # write, but 208M mostly-unique pair keys inflate ~10x in the
        # reduce tasks' hash state (measured 19.7GB spill at x100 with
        # only the posting repartition). An explicit pair-keyed
        # repartition satisfies the grouping distribution, so the agg
        # plans over it with AQE-exempt width — per-task state back at
        # the no-spill density.
        pairs = pairs.repartition(explode_partitions, "vec_a", "vec_b")
    return (
        pairs.groupBy("vec_a", "vec_b")
        .agg(F.count(F.lit(1)).alias("n_shared_buckets"))
    )


def ann_bucket_stats(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = DEFAULT_TABLES,
    seed: int = SEED,
    max_bucket: int = 1024,
) -> DataFrame:
    """Per-table posting-list accounting for :func:`ann_candidate_pairs`
    — the 'no silent caps' companion (ADVICE r3). One row per hash
    table: bucket count, max/mean bucket size, and how many buckets
    exceeded ``max_bucket`` (i.e. were hash-sampled down before pair
    expansion). Run it alongside a production dedup job to see whether
    the cap is actually biting at the current corpus density.
    ``n_planes=None`` auto-sizes exactly like :func:`ann_candidate_pairs`
    so the accounting always describes the geometry the build used."""
    if n_planes is None:
        n_planes = recommended_planes(df.count())
    sigs = lsh_signatures(df, id_col, vec_col, n_planes, n_tables, seed)
    sizes = sigs.groupBy("table_idx", "bucket").agg(F.count(F.lit(1)).alias("_n"))
    return (
        sizes.groupBy("table_idx")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("_n").alias("max_bucket_size"),
            F.round(F.avg("_n"), 2).alias("mean_bucket_size"),
            F.sum(F.when(F.col("_n") > max_bucket, 1).otherwise(0))
            .cast("bigint")
            .alias("n_capped_buckets"),
        )
        .orderBy("table_idx")
    )


# ---------------------------------------------------------------------------
# DuckDB mirrors (r6): the md5-integer hyperplane construction makes
# every LSH artifact SQL-expressible — these builders rebuild the
# signature table, the (capped) candidate pairs, and the bucket
# accounting cell-for-cell, which is what lets the ann_* queries carry
# full value oracles instead of rows-only checks.
# ---------------------------------------------------------------------------


def sql_lsh_sig(
    vec_rel: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = DEFAULT_PLANES,
    n_tables: int = DEFAULT_TABLES,
    seed: int = SEED,
) -> str:
    """(vec_id, table_idx, bucket) — DuckDB mirror of lsh_signatures.
    Pure integer arithmetic end-to-end: md5-int hyperplanes, floor-
    quantized components, int64 dots — bit-identical to the engine."""
    return f"""
    WITH _h AS (
      SELECT t.t AS t, p.p AS p, k.k AS k,
             CAST(('0x' || substr(md5({seed} || ':' || t.t || ':' || p.p || ':' || k.k), 1, 8)) AS BIGINT)
               - 2147483648 AS w
      FROM generate_series(0, {n_tables - 1}) t(t),
           generate_series(0, {n_planes - 1}) p(p),
           generate_series(0, {dim - 1}) k(k)
    ),
    _q AS (
      SELECT {id_col} AS vec_id, k.k AS k,
             CAST(floor(CAST({vec_col}[k.k + 1] AS DOUBLE) * {QUANT}) AS BIGINT) AS qv
      FROM {vec_rel}, generate_series(0, {dim - 1}) k(k)
    ),
    _bits AS (
      SELECT _q.vec_id, _h.t, _h.p,
             CASE WHEN SUM(_q.qv * _h.w) > 0 THEN 1 ELSE 0 END AS bit
      FROM _q JOIN _h ON _h.k = _q.k
      GROUP BY _q.vec_id, _h.t, _h.p
    )
    SELECT vec_id, CAST(t AS INT) AS table_idx,
           CAST(SUM(bit << p) AS BIGINT) AS bucket
    FROM _bits GROUP BY vec_id, t
    """


def sql_lsh_query_probes(
    vec_rel: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: int = 0,
    dim: int = 64,
    n_planes: int = DEFAULT_PLANES,
    n_tables: int = DEFAULT_TABLES,
    seed: int = SEED,
    multiprobe: int = 0,
    multiprobe_bits: int = 1,
) -> str:
    """(table_idx, bucket) probe set for the query row ``query_id`` —
    DuckDB mirror of :func:`query_probe_buckets`. The base bucket plus
    the top-``multiprobe`` entries of the perturbation sequence:
    candidate sets ranked by the sum of the flipped planes' |int64
    margins|, ties to fewer bits then plane order — identical ordering
    key to the engine's (score, n_bits, plane tuple), all in the same
    exact int64 arithmetic, so the probe set matches bit-for-bit.
    ``multiprobe_bits=1`` is the legacy Hamming-1 mirror;
    ``multiprobe_bits=2`` adds the 2-bit perturbations (the
    auto-geometry recall knob, registered as
    ``ann_multiprobe2bit_cosine_topk``)."""
    two_bit = ""
    if multiprobe_bits >= 2:
        two_bit = """
      UNION ALL
      SELECT a.t, a.p AS p1, b.p AS p2,
             abs(a.dot) + abs(b.dot) AS score, 2 AS nbits,
             CAST((1 << a.p) | (1 << b.p) AS BIGINT) AS mask
      FROM _dots a JOIN _dots b ON a.t = b.t AND a.p < b.p"""
    return f"""
    WITH _h AS (
      SELECT t.t AS t, p.p AS p, k.k AS k,
             CAST(('0x' || substr(md5({seed} || ':' || t.t || ':' || p.p || ':' || k.k), 1, 8)) AS BIGINT)
               - 2147483648 AS w
      FROM generate_series(0, {n_tables - 1}) t(t),
           generate_series(0, {n_planes - 1}) p(p),
           generate_series(0, {dim - 1}) k(k)
    ),
    _q AS (
      SELECT k.k AS k,
             CAST(floor(CAST({vec_col}[k.k + 1] AS DOUBLE) * {QUANT}) AS BIGINT) AS qv
      FROM {vec_rel}, generate_series(0, {dim - 1}) k(k)
      WHERE {id_col} = {int(query_id)}
    ),
    _dots AS (
      SELECT _h.t, _h.p, SUM(_q.qv * _h.w) AS dot
      FROM _q JOIN _h ON _h.k = _q.k
      GROUP BY _h.t, _h.p
    ),
    _base AS (
      SELECT t, CAST(SUM(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
      FROM _dots GROUP BY t
    ),
    _cands AS (
      SELECT t, p AS p1, NULL AS p2, abs(dot) AS score, 1 AS nbits,
             CAST(1 << p AS BIGINT) AS mask
      FROM _dots{two_bit}
    ),
    _flips AS (
      SELECT t, mask FROM (
        SELECT t, mask,
               row_number() OVER (PARTITION BY t
                                  ORDER BY score, nbits, p1, p2 NULLS FIRST) AS r
        FROM _cands
      ) WHERE r <= {int(multiprobe)}
    )
    SELECT CAST(t AS INT) AS table_idx, bucket FROM _base
    UNION
    SELECT CAST(b.t AS INT) AS table_idx,
           xor(b.bucket, f.mask) AS bucket
    FROM _base b JOIN _flips f ON f.t = b.t
    """


def sql_ann_candidate_pairs(
    vec_rel: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = DEFAULT_PLANES,
    n_tables: int = DEFAULT_TABLES,
    seed: int = SEED,
    max_bucket: int | None = 1024,
) -> str:
    """(vec_a, vec_b, n_shared_buckets) — DuckDB mirror of
    ann_candidate_pairs incl. the md5-ranked hot-bucket cap
    (``max_bucket=None`` = the uncapped form the incremental fold
    maintains)."""
    cap = "" if max_bucket is None else f"AND rk <= {int(max_bucket)}"
    return f"""
    WITH _sig AS ({sql_lsh_sig(vec_rel, id_col, vec_col, dim, n_planes, n_tables, seed)}),
    _mem AS (
      SELECT table_idx, bucket, vec_id,
             row_number() OVER (
               PARTITION BY table_idx, bucket
               ORDER BY CAST(('0x' || substr(md5({seed} || ':' || CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT),
                        vec_id) AS rk,
             COUNT(*) OVER (PARTITION BY table_idx, bucket) AS n
      FROM _sig
    ),
    _kept AS (
      SELECT table_idx, bucket, vec_id FROM _mem
      WHERE n >= 2 {cap}
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           COUNT(*) AS n_shared_buckets
    FROM _kept a JOIN _kept b
      ON a.table_idx = b.table_idx AND a.bucket = b.bucket
     AND a.vec_id < b.vec_id
    GROUP BY 1, 2
    """


def _sql_ivf_train_parts(
    vec_rel: str,
    id_col: str,
    vec_col: str,
    dim: int,
    n_centroids: int,
    seed: int,
    n_iter: int,
) -> list[str]:
    """Shared WITH-body parts for the integer-Lloyd IVF oracles: the
    quantized unnest, md5 seed centroids, and the unrolled training
    iterations ending at the final assignment ``_a{n_iter}``. Used by
    :func:`sql_ivf_topk` and :func:`sql_ivf_balanced_sample` so the two
    oracles replay the IDENTICAL training."""
    nc = n_centroids
    parts = [
        f"""WITH _x AS MATERIALIZED (
      SELECT {id_col} AS vec_id, k.k AS k,
             CAST(floor(CAST({vec_col}[k.k + 1] AS DOUBLE) * {QUANT}) AS BIGINT) AS x
      FROM {vec_rel}, generate_series(0, {dim - 1}) k(k)
    ),
    _c0 AS MATERIALIZED (
      SELECT j.j AS j, k.k AS k,
             CAST(('0x' || substr(md5({seed} || ':ivf:' || j.j || ':' || k.k), 1, 8)) AS BIGINT)
               % {2 * _IVF_SEED_HALF} - {_IVF_SEED_HALF} AS c
      FROM generate_series(0, {nc - 1}) j(j), generate_series(0, {dim - 1}) k(k)
    )"""
    ]
    for i in range(n_iter + 1):
        parts.append(f"""_a{i} AS MATERIALIZED (
      SELECT vec_id, CAST(MIN(key) % {nc} AS INT) AS cid FROM (
        SELECT x.vec_id,
               SUM((x.x - c.c) * (x.x - c.c)) * {nc} + c.j AS key
        FROM _x x JOIN _c{i} c ON c.k = x.k
        GROUP BY x.vec_id, c.j)
      GROUP BY vec_id
    )""")
        if i == n_iter:
            break
        parts.append(f"""_s{i} AS (
      SELECT a.cid AS j, x.k AS k, SUM(x.x) AS s, COUNT(*) AS n
      FROM _a{i} a JOIN _x x ON x.vec_id = a.vec_id
      GROUP BY a.cid, x.k
    )""")
        parts.append(f"""_c{i + 1} AS MATERIALIZED (
      SELECT c.j, c.k,
             CASE WHEN s.n IS NULL THEN c.c
                  ELSE CAST((s.s - (((s.s % s.n) + s.n) % s.n)) // s.n AS BIGINT)
             END AS c
      FROM _c{i} c LEFT JOIN _s{i} s ON s.j = c.j AND s.k = c.k
    )""")
    return parts


def sql_ivf_balanced_sample(
    vec_rel: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_centroids: int = 16,
    seed: int = SEED,
    n_iter: int = TRAIN_ITERS,
    k: int = 8,
) -> str:
    """(cluster_id, vec_id, rnk) — DuckDB mirror of the cluster-balanced
    subsample: the same unrolled integer-Lloyd training/assignment as
    :func:`sql_ivf_topk`, then the md5-smallest ``k`` members per
    cluster (deterministic pseudo-random order, engine-portable)."""
    parts = _sql_ivf_train_parts(vec_rel, id_col, vec_col, dim, n_centroids, seed, n_iter)
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT cluster_id, vec_id, CAST(rnk AS INT) AS rnk FROM (
      SELECT a.cid AS cluster_id, a.vec_id,
             ROW_NUMBER() OVER (PARTITION BY a.cid
                                ORDER BY md5('bal:' || a.vec_id), a.vec_id) AS rnk
      FROM _a{n_iter} a)
    WHERE rnk <= {k}
    """
    )


def sql_ivf_topk(
    vec_rel: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 10,
    seed: int = SEED,
    n_iter: int = TRAIN_ITERS,
    query_id: int = 0,
) -> str:
    """(vec_id, cos_sim, rnk) — DuckDB mirror of :func:`ivf_topk`,
    including the TRAINING: the integer Lloyd iterations are unrolled
    as materialized CTEs (the PageRank/k-core playbook). Every step is
    exact integer arithmetic — md5 seed centroids, 2²⁰-quantized
    components, L2 distances, the dist·n+j min-key (distance argmin
    with centroid-id tiebreak, = numpy argmin's first-minimum), and a
    floor-division centroid update (numerator made exactly divisible
    first because DuckDB's ``//`` truncates toward zero while numpy's
    floors) — so assignments, probe lists and the candidate set match
    the engine cell-for-cell; only the final rerank touches floats
    (the same round-6 cosine both engines already agree on)."""
    from hbacker_spark.functions.similarity import sql_cosine

    nc = n_centroids
    parts = _sql_ivf_train_parts(vec_rel, id_col, vec_col, dim, nc, seed, n_iter)
    parts.append(f"""_probe AS (
      SELECT j FROM (
        SELECT c.j AS j,
               SUM((x.x - c.c) * (x.x - c.c)) * {nc} + c.j AS key
        FROM _x x JOIN _c{n_iter} c ON c.k = x.k
        WHERE x.vec_id = {query_id}
        GROUP BY c.j)
      ORDER BY key LIMIT {nprobe}
    )""")
    parts.append(f"""_cand AS (
      SELECT a.vec_id FROM _a{n_iter} a JOIN _probe p ON a.cid = p.j
    )""")
    parts.append(f"""_qv AS (
      SELECT {vec_col} AS q_emb FROM {vec_rel} WHERE {id_col} = {query_id}
    )""")
    parts.append(f"""_scored AS (
      SELECT e.{id_col} AS vec_id,
             round({sql_cosine(f'e.{vec_col}', 'q.q_emb')}, 6) AS cos_sim
      FROM {vec_rel} e JOIN _cand c ON c.vec_id = e.{id_col}
      CROSS JOIN _qv q
    )""")
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT vec_id, cos_sim, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rnk
          FROM _scored)
    WHERE rnk <= {k}
    """
    )
