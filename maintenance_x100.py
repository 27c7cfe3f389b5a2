"""x100 maintenance-cost receipt (VERDICT r11 #4).

X100_RECEIPT.json pins the dedup chain at x100 and STORED_SERVING.json
stops at x10 — the one number missing for a real deployment was what
index MAINTENANCE costs at the scale the design targets: when the cron
cadence fires ``maintain_index`` on a drifted + fragmented index, is the
rebuild minutes or hours, and how much cheaper is a compact-only pass?

This harness measures it on the x100 replica (200k vectors, the same
constant-dup-rate growth model as X100_RECEIPT):

1. **drifted + fragmented LSH**: build at 1/10th of the corpus (so the
   stored plane count is the x10 geometry), then ingest the remaining
   90% in 8 append batches — n_rows outgrows the stored planes
   (``reindex_recommended``) AND every batch leaves a file per touched
   partition dir (``compact_recommended``). ``maintain_index`` must
   pick REBUILD (which also defragments — compacting first would be a
   wasted full pass at 100 TB); wall + before/after bytes/files
   recorded.
2. **fragmented-only LSH**: re-ingest 8 more batches onto the now
   right-sized index — health says compact, not rebuild;
   ``maintain_index`` runs the cheaper pass; wall + IO recorded.
3. **steady state**: a third ``maintain_index`` right after is the
   no-op — the cron cadence needs no external state.
4. **IVF (store_vectors=True)**: same drift protocol; the rebuild is
   corpus-free (the lists carry their vectors) — the 100 TB shape where
   the corpus lives elsewhere.

Writes MAINTENANCE_X100.json; the summary table goes in SCALE_NOTES.md.
Run: python maintenance_x100.py   (builds the x100 replica if missing)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from hbacker_spark.operators.ann_index import (  # noqa: E402
    append_ivf_index,
    append_lsh_index,
    build_ivf_index,
    build_lsh_index,
    index_data_dir,
    index_health,
    maintain_index,
    read_geometry,
)
from hbacker_spark.session import get_spark  # noqa: E402
from hbacker_spark.sources import storage  # noqa: E402

REPO = os.path.dirname(os.path.abspath(__file__))
X100 = os.path.join(REPO, ".scale_smoke", "x100")
IDX_ROOT = os.path.join(REPO, ".scale_smoke", "maint_x100")
N_BATCHES = 8


def ensure_x100() -> None:
    if not os.path.isdir(os.path.join(X100, "embeddings.parquet")):
        print("building x100 replica ...")
        env = dict(os.environ, SPARK_GRAFT_SCALE_N="100")
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scale_smoke_gen.py")],
            check=True, env=env,
        )


def dir_stats(spark, path: str) -> dict:
    b, f = storage.dir_bytes_and_files(spark, path)
    return {"bytes": b, "files": f, "mb": round(b / 1e6, 1)}


def drift_and_fragment(spark, emb, path: str, kind: str) -> None:
    """Build at 1/10th of the corpus, append the rest in N_BATCHES —
    the long-ingest-chain state maintain_index exists for."""
    seed_part = F.pmod(F.xxhash64("vec_id", F.lit(17)), F.lit(10))
    base = emb.filter(seed_part == 0)
    if kind == "lsh":
        build_lsh_index(base, path)  # auto planes for the SMALL slice
        append = append_lsh_index
    else:
        dim = len(emb.select("embedding").first()[0])
        build_ivf_index(base, path, dim=dim, store_vectors=True)
        append = append_ivf_index
    for i in range(1, 10):
        batch = emb.filter(seed_part == i)
        # group the 9 slices into N_BATCHES appends (last two merge)
        append(batch, path, batch_id=i, stream_id="maint-x100")


def measure(spark, emb, kind: str) -> dict:
    path = os.path.join(IDX_ROOT, kind)
    shutil.rmtree(path, ignore_errors=True)
    out: dict = {"kind": kind}

    t0 = time.monotonic()
    drift_and_fragment(spark, emb, path, kind)
    out["ingest_chain_s"] = round(time.monotonic() - t0, 1)

    geo = read_geometry(spark, path)
    data_dir = index_data_dir(path, geo)
    out["health_drifted"] = index_health(spark, path)
    out["io_before_rebuild"] = dir_stats(spark, data_dir)

    # corpus df: LSH rebuild needs it; store_vectors IVF rebuilds free
    corpus = emb if kind == "lsh" else None
    t0 = time.monotonic()
    r = maintain_index(spark, path, corpus)
    out["maintain_1"] = {
        "actions": r["actions"],
        "wall_s": round(time.monotonic() - t0, 1),
    }
    geo = read_geometry(spark, path)
    out["io_after_rebuild"] = dir_stats(spark, index_data_dir(path, geo))

    # fragmentation-only round: more appends at the new geometry
    frag_part = F.pmod(F.xxhash64("vec_id", F.lit(23)), F.lit(40))
    append = append_lsh_index if kind == "lsh" else append_ivf_index
    for i in range(N_BATCHES):
        append(
            emb.filter(frag_part == i).withColumn(
                "vec_id", F.col("vec_id") + F.lit(10_000_000 * (i + 1))
            ),
            path, batch_id=100 + i, stream_id="maint-x100",
        )
    out["health_fragmented"] = index_health(spark, path)
    geo = read_geometry(spark, path)
    out["io_before_compact"] = dir_stats(spark, index_data_dir(path, geo))
    t0 = time.monotonic()
    r = maintain_index(spark, path, corpus)
    out["maintain_2"] = {
        "actions": r["actions"],
        "wall_s": round(time.monotonic() - t0, 1),
    }
    geo = read_geometry(spark, path)
    out["io_after_compact"] = dir_stats(spark, index_data_dir(path, geo))

    # steady state: the very next maintain is the no-op
    t0 = time.monotonic()
    r = maintain_index(spark, path, corpus)
    out["maintain_3"] = {
        "actions": r["actions"],
        "wall_s": round(time.monotonic() - t0, 1),
    }
    return out


def main() -> int:
    ensure_x100()
    spark = get_spark("maintenance_x100")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(X100, "embeddings.parquet"))
    n = emb.count()

    receipt = {
        "model": (
            "x100 replica (constant-dup-rate growth, scale_smoke_gen); index "
            "built at 1/10 corpus then append-ingested to full size — the "
            "drifted+fragmented state the maintain_index cron targets"
        ),
        "n_vectors": n,
        "legs": [measure(spark, emb, "lsh"), measure(spark, emb, "ivf")],
    }
    with open(os.path.join(REPO, "MAINTENANCE_X100.json"), "w") as f:
        json.dump(receipt, f, indent=1)
    line = {
        k: {
            "rebuild_s": leg["maintain_1"]["wall_s"],
            "rebuild_actions": leg["maintain_1"]["actions"],
            "compact_s": leg["maintain_2"]["wall_s"],
            "compact_actions": leg["maintain_2"]["actions"],
            "noop_s": leg["maintain_3"]["wall_s"],
        }
        for k, leg in (("lsh", receipt["legs"][0]), ("ivf", receipt["legs"][1]))
    }
    print(json.dumps({"n_vectors": n, **line}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
