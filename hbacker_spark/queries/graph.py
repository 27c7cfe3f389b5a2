"""Graph analytics over relational data (SURVEY.md §2.C widening).

Co-purchase graph: parts are nodes; an undirected edge (u, v) exists
when both parts appear in the same order at least ``SUPPORT`` times.
Frequent-pair mining, degree profiling, and triangle counting are the
canonical "graph on a relational engine" workloads (cf. the CC-based
dedup clustering in operators/clustering.py, which is the iterative
sibling of these one-shot queries).

Scale notes (100 TB discipline):
- the edge builder is a self-equi-join on l_orderkey — a single shuffle
  on the order key; per-order fan-out is bounded by lines-per-order
  (TPC-H ~4, here ~4), so no quadratic blowup. The support filter
  (HAVING count >= N) then cuts the edge set before anything graphy.
- triangle counting uses the *oriented wedge* algorithm: every edge is
  directed from its lower-degree endpoint (ties by id), wedges are
  enumerated only at each triangle's minimum-degree vertex, and closed
  against the canonical edge list. Wedge count is sum(outdeg^2) with
  outdeg bounded by ~sqrt(|E|) — the standard way triangle counting
  stays subquadratic on power-law graphs (same trick as GraphFrames /
  Spark's own triangleCount).
- everything is equi-joins + aggregates: shuffles on node/edge keys,
  no driver-side state, AQE free to re-plan skewed degrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbacker_spark.registry import register
from hbacker_spark.sources.tables import driver_local_df, load_table

SUPPORT = 2

# r13 (optimization): edge-row ceiling for the driver-local iterative
# fast paths below — the same size-gated pattern as
# operators.clustering.connected_components. The co-purchase graph is a
# SUPPORT-thresholded part-pair graph: its edge count tracks the part
# catalog's co-occurrence density, not the fact-table row count
# (measured 3445 edges at sf0.01 vs 3573 at sf0.1), so at every test
# scale the iterative loops' cost is pure scheduler overhead
# (~15-25 jobs/query) over a relation that fits in one task. Below the
# gate the fixed-iteration loops run driver-side with EXACT integer /
# scaled-decimal arithmetic (bit-identical fixpoints, pinned by
# tests/test_graph_iterative.py local-vs-distributed equivalence);
# above it the distributed checkpointed loops run unchanged.
_GRAPH_LOCAL_EDGES = 200_000


def _graph_local_gate() -> int:
    import os

    return int(os.environ.get("SPARK_GRAFT_GRAPH_LOCAL_EDGES", _GRAPH_LOCAL_EDGES))

_SQL_PAIRS = f"""
      SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS support
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= {SUPPORT}
"""


def _hub_seed(edges: DataFrame) -> DataFrame:
    """1-row (node) DataFrame: the max-degree node, ties by id — the
    deterministic data-dependent seed for the frontier walks. Stays
    in-plan (top-1 over a tiny degree aggregate compiles to
    TakeOrderedAndProject); checkpointed so each walk round doesn't
    re-derive it."""
    return (
        edges.groupBy("u")
        .agg(F.count(F.lit(1)).alias("_d"))
        .orderBy(F.desc("_d"), "u")
        .limit(1)
        .select(F.col("u").alias("node"))
        .localCheckpoint(eager=True)
    )


def _copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (u < v) co-purchase edges with their support counts.

    Posting-list form (r6, VERDICT r5 #6): ONE shuffle on l_orderkey
    builds each order's sorted distinct basket (collect_set dedups for
    free — no pre-distinct shuffle), then pairs explode JVM-side from
    the sorted list (slice/transform, the same expression shape as the
    jaccard inverted index) and aggregate on (u, v). The previous
    orderkey self-join + groupBy was 2 shuffles + a join; this is the
    identical pair set (verified row-for-row at sf0.1) measured
    2.52 s → 1.30 s steady-state — and since every graph query derives
    its edges here, the whole family inherits the cut. Per-order
    explode is |basket|²/2, bounded by basket size (~7 items TPC-H) —
    at 100 TB the basket-size bound, not the corpus size, caps the
    fan-out per key.

    r13 (optimization, guide §2.2/§2.6): the basket-build + pair-explode
    stage is CPU-heavy per shuffled byte (the |basket|²/2 fan-out), and
    AQE's byte-floor coalescing (minPartitionSize 1 MB) squeezed the
    ~5 MB orderkey shuffle to 4 tasks — 3.4 s of measured stage CPU
    serialized over 4 cores while 28 idle, a tax every graph query in
    this family pays. The explicit keyed repartition below pins that
    exchange's width from the INPUT size (one partition per ~32 MB of
    lineitem bytes, floored at the session's parallelism, capped at the
    configured shuffle width) — AQE never coalesces a user-specified
    repartition, and because it hash-partitions on the same key the
    aggregate's distribution requirement is already satisfied: the plan
    carries the SAME single exchange, just at a pinned width.
    Scale-adaptive, not a local[32] constant: on a production table the
    bytes-derived count saturates the configured shuffle width and the
    plan is what AQE would have produced anyway; on a non-file scheme
    (no cheap size probe) the repartition is skipped entirely. Measured
    same-session A/B at sf0.1 (degree_distribution, min-of-3, two
    interleaved rounds): 1.95/2.25 s -> 1.60/1.16 s, pair set verified
    identical row-for-row."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    try:
        # r14 (VERDICT r13 #2): table_bytes sums real data files, so a
        # directory-backed lineitem derives its true width instead of
        # the dirent size silently pinning the exchange to the floor.
        from hbacker_spark.sources.tables import table_bytes

        _bytes = table_bytes(sf_dir, "lineitem")
        _dp = spark.sparkContext.defaultParallelism
        _cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
        li = li.repartition(
            max(_dp, min(max(_cur, _dp), _bytes // (32 << 20) + 1)), "l_orderkey"
        )
    except OSError:
        pass  # non-local scheme: leave the exchange to the planner
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    pr = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "transform(slice(ps, i + 2, size(ps) - i - 1), "
                "y -> struct(x AS u, y AS v))))"
            )
        ).alias("p")
    ).select("p.u", "p.v")
    return (
        pr.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= SUPPORT)
    )


@register(
    "copurchase_frequent_pairs",
    oracle=f"""
    SELECT u, v, support FROM ({_SQL_PAIRS})
    ORDER BY support DESC, u, v
    LIMIT 25
    """,
    tags=("graph", "join", "topk"),
    doc="Frequent-itemset pairs: top-25 co-purchased part pairs by "
    "support. Edge build is one shuffle on the order key with bounded "
    "per-order fan-out; top-k compiles to TakeOrderedAndProject.",
)
def copurchase_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _copurchase_pairs(spark, sf_dir)
        .orderBy(F.col("support").desc(), "u", "v")
        .limit(25)
    )


@register(
    "copurchase_degree_distribution",
    oracle=f"""
    WITH pairs AS ({_SQL_PAIRS}),
    deg AS (
      SELECT node, COUNT(*) AS degree
      FROM (SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs) t
      GROUP BY node)
    SELECT degree, COUNT(*) AS n_parts
    FROM deg GROUP BY degree
    """,
    tags=("graph", "aggregation"),
    doc="Degree distribution of the co-purchase graph — the skew probe "
    "you run BEFORE joining on a graph at 100 TB (a heavy-tail degree "
    "here predicts hot keys there).",
)
def copurchase_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _copurchase_pairs(spark, sf_dir)
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_parts"))


@register(
    "copurchase_triangle_count",
    oracle=f"""
    WITH pairs AS ({_SQL_PAIRS}),
    deg AS (
      SELECT node, COUNT(*) AS d
      FROM (SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs) t
      GROUP BY node),
    ori AS (
      SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND p.u < p.v) THEN p.u ELSE p.v END AS s,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND p.u < p.v) THEN p.v ELSE p.u END AS t
      FROM pairs p
        JOIN deg du ON p.u = du.node
        JOIN deg dv ON p.v = dv.node),
    wedge AS (
      SELECT e1.t AS a, e2.t AS b
      FROM ori e1 JOIN ori e2 ON e1.s = e2.s AND e1.t < e2.t)
    SELECT COUNT(*) AS n_triangles
    FROM wedge w JOIN pairs p ON w.a = p.u AND w.b = p.v
    """,
    tags=("graph", "join", "aggregation"),
    doc="Oriented-wedge triangle count: edges point low-degree -> "
    "high-degree (ties by id), wedges are enumerated only at each "
    "triangle's min-degree vertex, then closed against the canonical "
    "(u < v) edge list. Wedge work is sum(outdeg^2), outdeg ~ "
    "sqrt(|E|)-bounded — the subquadratic form GraphX/GraphFrames use. "
    "r7 (VERDICT r6 #6): the edge list and the oriented list are each "
    "consumed by multiple joins (deg x2, wedge self-join x2, closure), "
    "and ReuseExchange only caught part of the repetition — both are "
    "now materialized once via the managed tracked checkpoint (freed "
    "at the query boundary by the release_rank_blocks hook): measured "
    "2.04 s -> 0.12 s steady-state at sf0.1, oracle unchanged.",
)
def copurchase_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.rank import tracked_checkpoint

    pairs = tracked_checkpoint(_copurchase_pairs(spark, sf_dir))
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    p = pairs.alias("p")
    du = deg.alias("du")
    dv = deg.alias("dv")
    low_first = (F.col("du.d") < F.col("dv.d")) | (
        (F.col("du.d") == F.col("dv.d")) & (F.col("p.u") < F.col("p.v"))
    )
    ori = tracked_checkpoint(
        p.join(du, F.col("p.u") == F.col("du.node"))
        .join(dv, F.col("p.v") == F.col("dv.node"))
        .select(
            F.when(low_first, F.col("p.u")).otherwise(F.col("p.v")).alias("s"),
            F.when(low_first, F.col("p.v")).otherwise(F.col("p.u")).alias("t"),
        )
    )
    e1 = ori.alias("e1")
    e2 = ori.alias("e2")
    wedge = e1.join(
        e2,
        (F.col("e1.s") == F.col("e2.s")) & (F.col("e1.t") < F.col("e2.t")),
    ).select(F.col("e1.t").alias("a"), F.col("e2.t").alias("b"))
    closed = wedge.join(
        pairs.select("u", "v"),
        (F.col("a") == F.col("u")) & (F.col("b") == F.col("v")),
        "left_semi",
    )
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


BFS_DEPTH = 3

# Seed = the highest-degree hub (ties by id), picked IN-PLAN on both
# engines. A fixed part id goes isolated as SF grows (the support>=2
# graph gets relatively sparser: part 0 has degree 29 at sf0.001, 3 at
# sf0.01, zero at sf0.1) — a data-dependent deterministic seed keeps
# the frontier loop exercising real work at every scale.
_SQL_BFS_SEED = """
      SELECT u AS node FROM (
        SELECT u, COUNT(*) AS d FROM edges GROUP BY u
      ) ORDER BY d DESC, node LIMIT 1
"""


@register(
    "copurchase_bfs_reachable",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_SQL_PAIRS}),
    edges AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
    walk(node, hops) AS (
      SELECT node, 0 AS hops FROM ({_SQL_BFS_SEED})
      UNION
      SELECT e.v AS node, w.hops + 1 AS hops
      FROM walk w JOIN edges e ON e.u = w.node
      WHERE w.hops < {BFS_DEPTH})
    SELECT node, CAST(MIN(hops) AS INT) AS hops
    FROM walk GROUP BY node
    """,
    tags=("graph", "iterative"),
    doc=f"BFS reachability: parts within {BFS_DEPTH} co-purchase hops of "
    "the max-degree hub (deterministic in-plan seed pick, ties by id), "
    "with minimum hop count. The oracle is DuckDB's "
    "recursive CTE (UNION-distinct recursion, so the working set is "
    "(node,hops) pairs, not paths); Spark has no recursive SQL, so the "
    "engine form is the frontier loop every distributed BFS uses — "
    "join frontier to edges, anti-join out visited nodes, union into "
    "visited. Each round is one equi-join shuffle over the FRONTIER "
    "(not the full graph). The edge set materializes ONCE "
    "(localCheckpoint, symmetrized by a single explode so the pair "
    "build runs exactly once) and every round's frontier is "
    "checkpointed too (VERDICT r3 #2) — without that the statically "
    "unrolled plan nests the lineitem self-join ~2^depth times and "
    "leans on AQE exchange reuse to dedup it at runtime; with it each "
    "round joins two small materialized relations, the same bounded "
    "per-iteration shape as copurchase_pagerank.",
)
def copurchase_bfs_reachable(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _copurchase_pairs(spark, sf_dir).select("u", "v")
    # Single-explode symmetrization: a pairs.unionAll(pairs.swapped)
    # would execute the upstream self-join twice at checkpoint time.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("u"), F.col("v").alias("v")),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v")
        .localCheckpoint(eager=True)
    )
    # r13 driver-local fast path (see _GRAPH_LOCAL_EDGES): the same
    # frontier walk over numpy index arrays — set semantics, integer
    # hops, identical (node, min-hops) relation.
    if edges.count() <= _graph_local_gate():
        import numpy as np

        pdf = edges.toPandas()
        if not len(pdf):
            return spark.createDataFrame([], "node long, hops int")
        nodes, inv = np.unique(
            np.concatenate([pdf["u"].to_numpy(), pdf["v"].to_numpy()]),
            return_inverse=True,
        )
        ui, vi = inv[: len(pdf)], inv[len(pdf) :]
        degc = np.bincount(ui, minlength=len(nodes))
        hub = np.lexsort((np.arange(len(nodes)), -degc))[0]
        hops = np.full(len(nodes), -1, dtype="int64")
        hops[hub] = 0
        frontier = np.array([hub])
        for depth in range(1, BFS_DEPTH + 1):
            on_frontier = np.zeros(len(nodes), dtype=bool)
            on_frontier[frontier] = True
            nxt = np.unique(vi[on_frontier[ui]])
            nxt = nxt[hops[nxt] < 0]
            if not len(nxt):
                break
            hops[nxt] = depth
            frontier = nxt
        seen = hops >= 0
        rows = [
            (int(n), int(h)) for n, h in zip(nodes[seen], hops[seen])
        ]
        return driver_local_df(spark, rows, "node long, hops int")

    seed = _hub_seed(edges).select(
        "node", F.lit(0).cast("int").alias("hops")
    )
    visited = seed
    frontier = seed
    for depth in range(1, BFS_DEPTH + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.u)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(depth).cast("int"))
            .localCheckpoint(eager=True)
        )
        visited = visited.unionAll(nxt)
        frontier = nxt
    return visited


PR_ITER = 8
# The 2-step-batched loops below run range(N // 2) — an odd constant
# would silently drop an iteration and diverge the engine from the
# (fully-unrolled) oracles. Guard it at import time.
assert PR_ITER % 2 == 0, "PR_ITER must be even (2-step batched loop)"
PR_SCALE = "decimal(20,10)"


def _pagerank_oracle() -> str:
    """Fully-oracled PageRank (r5): the fixed-iteration power method
    unrolls like the k-core peeling — and the decimal arithmetic is
    emulated BIT-EXACTLY in DuckDB HUGEINT integer math. Spark's types,
    probed directly: decimal(20,10)/bigint divides at scale 28 with
    HALF_UP, the cast back to scale 10 rounds HALF_UP again (double
    rounding preserved!); 0.85::decimal(3,2) x sum::decimal(30,10) is
    EXACT at scale 12, then one HALF_UP cast to scale 10. With scores
    as scale-10 integers, round_half_up(a/b) = (2a+b) div (2b) on
    positives, so each step is

        v28 = (2*(s10*10^18) + deg) // (2*deg)          -- /deg @28
        c10 = (2*v28 + 10^18) // (2*10^18)              -- cast @10
        s'  = 15*10^8 + (2*(SUM(c10)*85) + 100) // 200  -- 0.15+0.85x

    all inside HUGEINT range (s10*10^18 <= ~1e32 < 1.7e38). The final
    decimal->double cast and HUGEINT/1e10 division both produce the
    correctly-rounded double of the same rational, so even the emitted
    floats agree bit-for-bit."""
    e18 = "1000000000000000000"
    ctes = [
        f"pairs AS MATERIALIZED ({_SQL_PAIRS})",
        "sym AS MATERIALIZED (SELECT u AS src, v AS dst FROM pairs "
        "UNION ALL SELECT v AS src, u AS dst FROM pairs)",
        "deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS HUGEINT) AS deg "
        "FROM sym GROUP BY src)",
        "edges AS MATERIALIZED (SELECT s.src, s.dst, d.deg FROM sym s JOIN deg d USING (src))",
        "s0 AS MATERIALIZED (SELECT DISTINCT src AS node, "
        "CAST(10000000000 AS HUGEINT) AS s10 FROM sym)",
    ]
    for t in range(PR_ITER):
        ctes.append(
            f"c{t} AS MATERIALIZED (SELECT e.dst AS node, "
            f"(2*((2*(st.s10*{e18}) + e.deg) // (2*e.deg)) + {e18}) // (2*{e18}) AS c10 "
            f"FROM edges e JOIN s{t} st ON e.src = st.node)"
        )
        ctes.append(
            f"s{t + 1} AS MATERIALIZED (SELECT node, "
            f"CAST(1500000000 AS HUGEINT) + (2*(SUM(c10)*85) + 100) // 200 AS s10 "
            f"FROM c{t} GROUP BY node)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node, CAST(s10 AS DOUBLE)/1e10 AS pagerank "
        f"FROM s{PR_ITER} ORDER BY pagerank DESC, node LIMIT 50"
    )


@register(
    "copurchase_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative"),
    doc="PageRank (damping 0.85, 8 power iterations) over the symmetric "
    "co-purchase graph, top-50 by rank. Fully DETERMINISTIC despite "
    "running on shuffled partials: scores and per-edge contributions "
    "are fixed-scale DECIMALs, so every per-node sum is exact and "
    "order-independent — float PageRank differs in final ulps from run "
    "to run, decimal PageRank cannot. That same exactness is what "
    "makes it FULLY ORACLED (r5): the 8 iterations unroll as "
    "materialized CTEs whose HUGEINT arithmetic reproduces Spark's "
    "decimal rounding bit-for-bit (see _pagerank_oracle). "
    "Edges+degrees materialize once (localCheckpoint) so the upstream "
    "pair build doesn't re-execute per iteration; each iteration is "
    "one join + one shuffle agg on node, the same bounded shape as "
    "connected components.",
)
def copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _copurchase_pairs(spark, sf_dir).select("u", "v")
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("src"), F.col("v").alias("dst")),
                F.struct(F.col("v").alias("src"), F.col("u").alias("dst")),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges = sym.join(deg, "src").localCheckpoint(eager=True)
    # r13 driver-local fast path (see _GRAPH_LOCAL_EDGES): the SAME
    # scaled-integer arithmetic the decimal plan and the HUGEINT oracle
    # perform — s10 is score*10^10 as an exact int; each step is the
    # documented HALF_UP pair (/deg at scale 28, cast to 10, then
    # 0.15 + 0.85*sum with one HALF_UP cast) in Python bigints, so the
    # fixpoint is bit-identical to the distributed decimal loop.
    if edges.count() <= _graph_local_gate():
        pdf = edges.toPandas()
        if len(pdf):
            e18 = 10**18
            srcs = pdf["src"].tolist()
            dsts = pdf["dst"].tolist()
            degs = dict(zip(srcs, pdf["deg"].tolist()))
            s10 = {n: 10**10 for n in degs}
            for _ in range(PR_ITER):
                c10 = {}
                for n, s in s10.items():
                    d = degs[n]
                    v28 = (2 * (s * e18) + d) // (2 * d)
                    c10[n] = (2 * v28 + e18) // (2 * e18)
                acc = dict.fromkeys(degs, 0)
                for u_, v_ in zip(srcs, dsts):
                    acc[v_] += c10[u_]
                s10 = {
                    n: 15 * 10**8 + (2 * (a * 85) + 100) // 200
                    for n, a in acc.items()
                }
            rows = sorted(
                ((n, s / 10**10) for n, s in s10.items()),
                key=lambda r: (-r[1], r[0]),
            )[:50]
        else:
            rows = []
        return driver_local_df(spark, rows, "node long, pagerank double")
    nodes = edges.select(F.col("src").alias("node")).distinct()
    state = nodes.withColumn("score", F.lit(1).cast(PR_SCALE)).localCheckpoint(eager=True)

    def step(st):
        contrib = edges.join(st, edges.src == st.node).select(
            F.col("dst").alias("node"),
            (F.col("score") / F.col("deg")).cast(PR_SCALE).alias("c"),
        )
        return (
            contrib.groupBy("node")
            .agg(F.sum("c").alias("_in"))
            .select(
                "node",
                (
                    F.lit(0.15).cast(PR_SCALE)
                    + (F.lit(0.85).cast("decimal(3,2)") * F.col("_in")).cast(PR_SCALE)
                ).alias("score"),
            )
        )

    # Two power iterations per materialization cycle (the CC 2-step
    # batching trick, clustering.py): the un-checkpointed plan nests
    # only 2 join+agg rounds — bounded — while halving the number of
    # eager materializations, which at 8 fixed iterations is the
    # dominant per-round cost. Results are bit-identical to 1-step
    # checkpointing (decimal arithmetic is exact either way).
    for _ in range(PR_ITER // 2):
        state = step(step(state)).localCheckpoint(eager=True)
    return (
        state.select("node", F.col("score").cast("double").alias("pagerank"))
        .orderBy(F.col("pagerank").desc(), "node")
        .limit(50)
    )


KCORE_K = 2
KCORE_MAX_ROUNDS = 20


def _kcore_oracle() -> str:
    """Fixed-round peeling unrolled as MATERIALIZED CTEs (VERDICT r4
    #6): a recursive CTE can't hold the aggregate-inside-recursion that
    peeling needs, but the engine's loop is round-BOUNDED, so the exact
    semantics unroll — round t keeps nodes with degree >= K in e_t,
    then filters both endpoints. Peeling is monotone: once the edge set
    reaches fixpoint every later round is the identity, so unrolling
    the full KCORE_MAX_ROUNDS equals the engine's early-broken loop
    bit-for-bit. AS MATERIALIZED is load-bearing — DuckDB inlines plain
    CTEs, and 3 references/round would blow up 3^20."""
    ctes = [
        f"pairs AS MATERIALIZED ({_SQL_PAIRS})",
        "e0 AS MATERIALIZED (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs)",
    ]
    for t in range(KCORE_MAX_ROUNDS):
        ctes.append(
            f"k{t} AS MATERIALIZED (SELECT u FROM e{t} "
            f"GROUP BY u HAVING COUNT(*) >= {KCORE_K})"
        )
        ctes.append(
            f"e{t + 1} AS MATERIALIZED (SELECT u, v FROM e{t} "
            f"WHERE u IN (SELECT u FROM k{t}) AND v IN (SELECT u FROM k{t}))"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT u AS node, "
        f"CAST(COUNT(*) AS BIGINT) AS core_degree FROM e{KCORE_MAX_ROUNDS} GROUP BY u"
    )


@register(
    "copurchase_kcore",
    oracle=_kcore_oracle(),
    tags=("graph", "iterative"),
    doc=f"{KCORE_K}-core of the co-purchase graph: repeatedly peel nodes "
    f"with degree < {KCORE_K} until fixpoint; returns surviving nodes "
    "with their within-core degree. The peeling loop is the same "
    "checkpointed iterative shape as PageRank/CC: the symmetric edge "
    "set materializes once, each round is one degree aggregation + two "
    "semi-joins filtering both endpoints, re-checkpointed so no "
    "round's plan nests the previous round's joins. Convergence is a "
    "1-row count probe (surviving-node count is strictly decreasing "
    "until fixpoint). Rounds are bounded by the peeling depth, "
    "O(max-degree) worst case but small on power-law graphs. FULLY "
    "ORACLED (r4 #6): the round-bounded loop unrolls exactly as "
    "KCORE_MAX_ROUNDS materialized CTEs — monotone peeling makes "
    "post-fixpoint rounds the identity, so the unroll equals the "
    "early-broken engine loop bit-for-bit.",
)
def copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _copurchase_pairs(spark, sf_dir).select("u", "v")
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("u"), F.col("v").alias("v")),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v")
        .localCheckpoint(eager=True)
    )
    # r13 driver-local fast path (see _GRAPH_LOCAL_EDGES): integer
    # peeling in numpy — degrees via bincount, drop edges with either
    # endpoint under K, stop at the edge-count fixpoint (or the same
    # KCORE_MAX_ROUNDS bound). Monotone integer arithmetic: identical
    # surviving edge set to the distributed loop by construction.
    if edges.count() <= _graph_local_gate():
        import numpy as np

        pdf = edges.toPandas()
        if not len(pdf):
            return spark.createDataFrame([], "node long, core_degree long")
        nodes, inv = np.unique(
            np.concatenate([pdf["u"].to_numpy(), pdf["v"].to_numpy()]),
            return_inverse=True,
        )
        ui, vi = inv[: len(pdf)], inv[len(pdf) :]
        for _ in range(KCORE_MAX_ROUNDS):
            degc = np.bincount(ui, minlength=len(nodes))
            keep = degc >= KCORE_K
            mask = keep[ui] & keep[vi]
            if mask.all():
                break
            ui, vi = ui[mask], vi[mask]
        degc = np.bincount(ui, minlength=len(nodes))
        surv = degc > 0
        rows = list(
            zip(nodes[surv].tolist(), degc[surv].astype("int64").tolist())
        )
        return driver_local_df(spark, rows, "node long, core_degree long")

    # ONE job per peel round (r6): keep is left lazy (recomputed inside
    # both semi-joins of the same job — two aggregations over the
    # already-materialized edge set, cheaper than a second eager
    # checkpoint + count job per round), and the convergence probe —
    # the surviving edge count — rides the CHECKPOINT's own job as an
    # Observation instead of a separate count() job (same move as the
    # CC loop's label-sum probe). Edge-count fixpoint ⟺ node fixpoint:
    # every peeled node removes at least one edge.
    from pyspark.sql import Observation

    prev_edges = -1
    for _ in range(KCORE_MAX_ROUNDS):
        deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= KCORE_K).select("u")
        obs = Observation()
        edges = (
            edges.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_edges = obs.get["n"]
        if n_edges == prev_edges:
            break
        prev_edges = n_edges
    return (
        edges.groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .select(F.col("u").alias("node"), "core_degree")
    )


SSSP_HOPS = 4
assert SSSP_HOPS % 2 == 0, "SSSP_HOPS must be even (2-step batched loop)"
# Integer edge weight: strong co-purchase = short distance. support >= 2
# (the edge filter), so weights land in [1, 8] — integer, hence every
# path cost is exact and min() is engine-independent.
_SQL_W = "GREATEST(1, 10 - support)"


@register(
    "copurchase_sssp",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_SQL_PAIRS}),
    edges AS (
      SELECT u, v, {_SQL_W} AS w FROM pairs
      UNION ALL
      SELECT v AS u, u AS v, {_SQL_W} AS w FROM pairs),
    walk(node, dist, hops) AS (
      SELECT node, CAST(0 AS BIGINT) AS dist, 0 AS hops FROM ({_SQL_BFS_SEED})
      UNION
      SELECT e.v AS node, w.dist + e.w AS dist, w.hops + 1 AS hops
      FROM walk w JOIN edges e ON e.u = w.node
      WHERE w.hops < {SSSP_HOPS})
    SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
    FROM walk GROUP BY node
    """,
    tags=("graph", "iterative"),
    doc=f"Weighted single-source shortest paths (Bellman-Ford, "
    f"{SSSP_HOPS} relaxation rounds) from the max-degree hub "
    f"(deterministic in-plan seed, ties by id): edge cost "
    f"falls with co-purchase support (w = max(1, 10-support), integer "
    f"so path costs are exact on both engines), result = cheapest "
    f"path cost within {SSSP_HOPS} hops. The MIN-aggregation in the "
    f"loop makes this the semiring sibling of BFS (set union) and "
    f"PageRank (sum): each round joins the reached-set to the "
    f"checkpointed edge list and re-minimizes per node — one join + "
    f"one agg per round over the REACHED set, never the full graph; "
    f"state and edges are localCheckpointed so no round re-executes "
    f"the pair build (the r3 BFS lineage lesson). The oracle is the "
    f"hop-bounded recursive-CTE walk with the same min fold.",
)
def copurchase_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _copurchase_pairs(spark, sf_dir)
    w = F.greatest(F.lit(1), F.lit(10) - F.col("support")).cast("long")
    edges = (
        pairs.select("u", "v", w.alias("w"))
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("u"), F.col("v").alias("v"), F.col("w").alias("w")),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v"), F.col("w").alias("w")),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v", "_e.w")
        .localCheckpoint(eager=True)
    )
    # r13 driver-local fast path (see _GRAPH_LOCAL_EDGES): the same
    # SSSP_HOPS Bellman-Ford relaxations in numpy — integer weights, so
    # every path cost and min() is exact on either path. Each round
    # gathers from the PREVIOUS round's distances (minimum.at gathers
    # before scattering), matching the loop's round-synchronous relax.
    if edges.count() <= _graph_local_gate():
        import numpy as np

        pdf = edges.toPandas()
        if not len(pdf):
            return spark.createDataFrame([], "node long, dist long")
        nodes, inv = np.unique(
            np.concatenate([pdf["u"].to_numpy(), pdf["v"].to_numpy()]),
            return_inverse=True,
        )
        ui, vi = inv[: len(pdf)], inv[len(pdf) :]
        wv = pdf["w"].to_numpy().astype("int64")
        degc = np.bincount(ui, minlength=len(nodes))
        hub = np.lexsort((np.arange(len(nodes)), -degc))[0]
        inf = np.int64(2**62)
        dist = np.full(len(nodes), inf, dtype="int64")
        dist[hub] = 0
        for _ in range(SSSP_HOPS):
            nd = dist.copy()
            np.minimum.at(nd, vi, dist[ui] + wv)
            dist = nd
        reached = dist < inf
        rows = list(
            zip(nodes[reached].tolist(), dist[reached].tolist())
        )
        return driver_local_df(spark, rows, "node long, dist long")

    state = _hub_seed(edges).select(
        "node", F.lit(0).cast("long").alias("dist")
    )

    def relax(st):
        relaxed = st.join(edges, st.node == edges.u).select(
            F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        return st.unionAll(relaxed).groupBy("node").agg(F.min("dist").alias("dist"))

    # Two relaxation rounds per materialization (same 2-step batching as
    # PageRank/CC): lineage stays 2 join+agg rounds deep, half the
    # eager checkpoints; min() is exact so results are identical.
    for _ in range(SSSP_HOPS // 2):
        state = relax(relax(state)).localCheckpoint(eager=True)
    return state
