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
    for tag, sf_dir in (("x10", x10), ("x100", x100)):
        for name in CHAIN:
            before = {s["stageId"] for s in _stages(ui, app_id)}
            t0 = time.monotonic()
            n_rows = specs[name].fn(spark, sf_dir).count()
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
            results[f"{tag}/{name}"] = row
            print(
                f"{tag:>5} {name:<24} rows={n_rows:>9} wall={wall:6.1f}s "
                f"shuf_w={row['shuffle_write'] / 1e6:9.1f}MB "
                f"spill={row['memory_spilled'] + row['disk_spilled']}B"
            )

    # growth ratios: corpus grew 10x from x10 to x100 — the hot-bucket
    # cap claims candidate pairs grow ~linearly (ratio ~10, never ~100)
    growth = {
        name: round(results[f"x100/{name}"]["rows"] / max(results[f"x10/{name}"]["rows"], 1), 2)
        for name in CHAIN
    }

    # ---- recall@10 at x100 (ann_recall_smoke method, denser buckets) ----
    from hbacker_spark.functions.similarity import cosine
    from hbacker_spark.operators.similarity import ann_topk, ivf_topk

    e = spark.read.parquet(f"{x100}/embeddings.parquet").cache()
    n_vec = e.count()
    qids = sorted({(i * 2503) % n_vec for i in range(N_QUERIES)})
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in e.filter(F.col("vec_id").isin(qids)).collect()
    }
    lsh_r, mp_r, ivf_r = [], [], []
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
        lsh = {r["vec_id"] for r in ann_topk(spark, e, qv, k=K).collect()}
        mp = {
            r["vec_id"]
            for r in ann_topk(spark, e, qv, k=K, multiprobe=MULTIPROBE).collect()
        }
        ivf = {r["vec_id"] for r in ivf_topk(spark, e, qv, k=K).collect()}
        lsh_r.append(len(lsh & exact) / K)
        mp_r.append(len(mp & exact) / K)
        ivf_r.append(len(ivf & exact) / K)
    e.unpersist()

    receipt = {
        "model": "x100 replica of sf0.1 docs/embeddings (constant dup rate); x10 baseline",
        "n_vectors_x100": n_vec,
        "chain": results,
        "rows_growth_x100_over_x10": growth,
        "spilled_anywhere": any(
            r["memory_spilled"] + r["disk_spilled"] > 0 for r in results.values()
        ),
        "recall10_x100": {
            "lsh": round(sum(lsh_r) / len(lsh_r), 3),
            "lsh_multiprobe2": round(sum(mp_r) / len(mp_r), 3),
            "ivf": round(sum(ivf_r) / len(ivf_r), 3),
        },
    }
    with open(os.path.join(REPO, "X100_RECEIPT.json"), "w") as f:
        json.dump(receipt, f, indent=1)
    print(json.dumps({k: receipt[k] for k in ("rows_growth_x100_over_x10", "spilled_anywhere", "recall10_x100")}))

    # the cap's core claim: candidate pairs grow ~linearly in corpus
    # size (10x data -> ~10x pairs), never quadratically (100x)
    assert growth["ann_candidate_pairs"] < 30, growth
    # recall regression bars at x100 (measured r8: lsh 0.625 / mp2 0.838
    # / ivf 0.562) — same floors as ann_recall_smoke.py, so a geometry
    # or cap change that destroys recall at density fails the receipt
    r = receipt["recall10_x100"]
    assert r["lsh"] >= 0.3 and r["lsh_multiprobe2"] >= 0.5 and r["ivf"] >= 0.4, r
    # span removal must never spill: its keys are uniform by construction
    for tag in ("x10", "x100"):
        row = results[f"{tag}/span_removal_filter"]
        assert row["memory_spilled"] + row["disk_spilled"] == 0, (tag, row)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
