"""Connected components over candidate-pair edges — dedup clustering.

Near-dup detection (Jaccard / MinHash-LSH / embedding cosine) emits
*pairs*; deduplication needs *clusters* (every doc mapped to a canonical
keeper). This is the iterative-algorithm class the oracle can't express:
large-star/small-star style label propagation on DataFrames.

Scale notes: each iteration is one join + one aggregation, both keyed on
node id (shuffle-partitioned consistently); convergence is checked with
a single count of changed labels. For power-law dedup graphs the
iteration count is O(log n); `max_iter` bounds runaway graphs.
`localCheckpoint` truncates the growing lineage each round (otherwise
plan depth explodes by iteration 10+).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# r13 (optimization): sym-row ceiling for the driver-local fast path.
# 4M sym rows ≈ 2M undirected edges ≈ 64 MB of two int64 numpy columns —
# squarely inside the guide-§5 "driver does metadata-sized work" budget
# (cf. the IVF centroid collect, the catalog descriptor reads). Above
# the gate the distributed loop runs unchanged, so 100 TB behavior is
# identical; the gate itself costs one count over already-materialized
# localCheckpoint blocks (~ms).
_LOCAL_SYM_ROWS = int(os.environ.get("SPARK_GRAFT_CC_LOCAL_SYM_ROWS", "4000000"))


def _persistent_ids(sc) -> set[int]:
    try:
        return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}
    except Exception:  # pragma: no cover - introspection only
        return set()


def _free_blocks(sc, ids: set[int]) -> None:
    """Drop the storage blocks of superseded localCheckpoint RDDs.

    Each loop round checkpoints a new label set; without this the dead
    rounds' blocks sit in the block manager for the session's lifetime —
    across a 70-query bench session that accumulated enough heap
    pressure to triple late iterative-query times. Best-effort: a py4j
    failure degrades to the old leak-until-GC behavior, never an error.
    """
    try:
        jmap = sc._jsc.getPersistentRDDs()
        for i in ids:
            jrdd = jmap.get(i)
            if jrdd is not None:
                jrdd.unpersist(False)
    except Exception:  # pragma: no cover
        pass


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    local_sym_rows: int | None = None,
) -> DataFrame:
    """(node, component) with component = min node id reachable.

    ``edges`` is undirected input (a<b by convention, either works).
    """
    sc = edges.sparkSession.sparkContext
    ckpt_ids: list[set[int]] = []  # block ids per checkpoint event, in order

    def ckpt(df: DataFrame) -> DataFrame:
        before = _persistent_ids(sc)
        out = df.localCheckpoint(eager=True)
        ckpt_ids.append(_persistent_ids(sc) - before)
        return out

    # Materialize the symmetric edge set ONCE: every iteration joins
    # against it, and without this the (possibly expensive) upstream
    # pair-generation plan re-executes per round — measured 40s → 9s at
    # sf0.1 when the edges come from the O(n²) cosine pair kernel.
    # Symmetrize via a per-row explode, NOT a self-union: a union reads
    # `edges` twice, which re-executes the upstream pair kernel twice
    # before the checkpoint exists (measured 1.64s → 0.86s at sf0.1) —
    # the explode keeps it to one pass.
    sym = ckpt(
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v")
        .distinct()
    )
    # r13 fast path (guide §8 "decide with small rows" + §5 driver
    # work): when the symmetrized edge relation is metadata-sized, the
    # distributed loop's cost is ~25 scheduler jobs of fixed overhead,
    # not data — measured 43 jobs / 4.2s wall vs 2.7s executor time for
    # ann_cluster_validity at sf0.1. Pull the (already-materialized)
    # edge list once over Arrow and run the SAME min-label
    # propagation + pointer doubling in numpy to the SAME fixpoint:
    # component = min reachable node id, exactly — integer arithmetic,
    # no float, so the result is bit-identical to the distributed loop
    # (pinned in tests/test_clustering equivalence test). This is not
    # result caching: every call recomputes from the input edges.
    if local_sym_rows is None:
        local_sym_rows = _LOCAL_SYM_ROWS
    n_sym = sym.count()  # over localCheckpoint blocks — no recompute
    if n_sym <= local_sym_rows:
        import numpy as np
        import pandas as pd

        node_type = sym.schema["u"].dataType.simpleString()
        pdf = sym.toPandas()
        _free_blocks(sc, set().union(*ckpt_ids) if ckpt_ids else set())
        if not len(pdf):
            return sym.sparkSession.createDataFrame(
                [], f"node {node_type}, component {node_type}"
            )
        u = pdf["u"].to_numpy()
        v = pdf["v"].to_numpy()
        nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        ui, vi = inv[: len(u)], inv[len(u) :]
        lab = np.arange(len(nodes))
        while True:
            prev = lab
            lab = lab.copy()
            # one propagation direction suffices: sym holds both (u,v)
            # and (v,u). minimum.at gathers lab[vi] before scattering,
            # which only slows convergence, never breaks monotonicity.
            np.minimum.at(lab, ui, lab[vi])
            lab = np.minimum(lab, lab[lab])  # pointer doubling
            if np.array_equal(lab, prev):
                break
        out = pd.DataFrame({"node": nodes, "component": nodes[lab]})
        return sym.sparkSession.createDataFrame(
            out, schema=f"node {node_type}, component {node_type}"
        )

    # Convergence probe: per-node labels only ever DECREASE, so the sum
    # of all labels is strictly monotonic until the fixpoint — one
    # scalar per round. The probe rides the CHECKPOINT's own job as an
    # Observation (CollectMetrics fills when the materializing job
    # completes), so each cycle is exactly ONE job — r6: previously a
    # separate 1-row agg job per cycle, i.e. 2 jobs/cycle.
    from pyspark.sql import Observation

    def ckpt_sum(df: DataFrame) -> tuple[DataFrame, int]:
        obs = Observation()
        out = ckpt(df.observe(obs, F.sum("component").alias("s")))
        return out, obs.get["s"]

    labels, prev_sum = ckpt_sum(
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    def step(lbl: DataFrame) -> DataFrame:
        # propagate: each node adopts the min component among itself and
        # its neighbors' current components
        neighbor_labels = (
            sym.join(lbl.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "component")
        )
        hop = (
            lbl.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # shortcut (pointer doubling): follow component -> its component,
        # turning per-hop propagation into O(log diameter) convergence.
        # hop recomputes twice inside the materializing job — two tiny
        # shuffles, cheaper than a separate checkpoint job for it.
        ptr = hop.select(F.col("node").alias("_mid"), F.col("component").alias("_c2"))
        return hop.join(ptr, hop.component == ptr._mid, "left").select(
            F.col("node"),
            F.least(F.col("component"), F.coalesce(F.col("_c2"), F.col("component"))).alias(
                "component"
            ),
        )

    for _ in range(max_iter):
        # TWO propagate+shortcut steps per materialization/probe cycle:
        # checkpoint jobs and convergence probes are the fixed cost that
        # dominates when the label relation is small (long chains need
        # ~10 steps; batching halves the job count — measured 7.0s →
        # 5.1s for the sf0.1 cosine graph at equal fixpoint). The inner
        # plan doubles per unbatched step, so 2 is the sweet spot
        # before recompute outgrows the saved scheduling overhead.
        # The probe rides the checkpoint job (ckpt_sum) — ONE job per
        # cycle, same as the initial label build; a separate 1-row agg
        # job per cycle was the r6 leftover this replaced.
        labels, new_sum = ckpt_sum(step(step(labels)))
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    # The returned labels are the LAST checkpoint — lineage-truncated, so
    # they depend on no earlier round's blocks (nor on sym). Everything
    # else this loop pinned is dead: free it now rather than at session
    # end. The final label blocks stay until the caller's query runs.
    dead: set[int] = set()
    for ids in ckpt_ids[:-1]:
        dead |= ids
    _free_blocks(sc, dead)
    return labels


def dedup_clusters(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Full dedup resolution: every doc → (doc_id, keeper_id, is_keeper).

    Docs without any near-dup edge are their own keeper. Keeper = min
    doc_id in the component (deterministic).
    """
    comps = connected_components(pairs)
    return (
        docs.select(id_col)
        .join(comps.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("keeper_id"),
        )
        .withColumn("is_keeper", F.col(id_col) == F.col("keeper_id"))
    )
