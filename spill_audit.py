"""Peak-shuffle / spill / memory receipts for the heaviest queries.

VERDICT r6 #5: plans are shape-checked and wall-times measured, but
"fits in executor memory, no spill" was asserted only by argument.
This audit measures it: for each of the heaviest registered queries it
snapshots the completed-stage metrics (Spark UI REST API) before and
after a full materialization (noop write / the query's own actions) and
aggregates, per query:

  shuffle_read / shuffle_write bytes   — the real exchange volume
  memory_spilled / disk_spilled bytes  — MUST be 0 (self-asserting)
  peak_execution_memory                — max over the query's stages

Run at sf0.1 and at the 10x replica (scale_smoke_gen.py output); the
receipt table goes into SPILL_AUDIT.json and is summarized in
SCALE_NOTES.md. Exit code is non-zero if any query spilled, so the
audit doubles as the no-spill gate for the 10x smoke.

Usage:  python spill_audit.py [sf_dir ...]   (default: sf0.1 and x10)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hbacker_spark.operators.rank import release_rank_blocks  # noqa: E402
from hbacker_spark.registry import load_all_queries  # noqa: E402
from hbacker_spark.session import get_spark  # noqa: E402

HEAVY = [
    "ann_cluster_validity",
    "dedup_cluster_resolution",
    "ann_dedup_clusters",
    "copurchase_pagerank",
    "pipeline_pretraining_corpus",
    "span_removal_filter",
]

STAGE_FIELDS = {
    "shuffle_read": "shuffleReadBytes",
    "shuffle_write": "shuffleWriteBytes",
    "memory_spilled": "memoryBytesSpilled",
    "disk_spilled": "diskBytesSpilled",
}


def _stages(ui: str, app_id: str) -> list[dict]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale_smoke/x10"),
    ]
    spark = get_spark(
        "spill_audit",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "5000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    specs = load_all_queries()

    results: dict[str, dict] = {}
    spilled_anywhere = False
    for sf_dir in sf_dirs:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_dir} (missing — run scale_smoke_gen.py first)")
            continue
        tag = os.path.basename(sf_dir.rstrip("/"))
        for name in HEAVY:
            before = {s["stageId"] for s in _stages(ui, app_id)}
            t0 = time.monotonic()
            df = specs[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            # Query boundary: free rank/checkpoint-pinned MEMORY_AND_DISK
            # blocks (as bench.py and the oracle harness do) so each
            # measured run starts with a clean block manager — prior
            # queries' resident blocks would skew the peak-memory and
            # no-spill receipts this audit exists to produce (ADVICE r7).
            release_rank_blocks()
            time.sleep(0.5)  # let the last stage land in the UI store
            new = [s for s in _stages(ui, app_id) if s["stageId"] not in before]
            row = {k: sum(int(s.get(v, 0)) for s in new) for k, v in STAGE_FIELDS.items()}
            row["peak_execution_memory"] = max(
                (int(s.get("peakExecutionMemory", 0)) for s in new), default=0
            )
            row["n_stages"] = len(new)
            row["wall_sec"] = round(wall, 2)
            results[f"{tag}/{name}"] = row
            spill = row["memory_spilled"] + row["disk_spilled"]
            spilled_anywhere |= spill > 0
            print(
                f"{tag:>4} {name:<28} stages={row['n_stages']:>3} "
                f"wall={wall:6.1f}s shuf_r={row['shuffle_read'] / 1e6:9.2f}MB "
                f"shuf_w={row['shuffle_write'] / 1e6:9.2f}MB "
                f"peak_exec={row['peak_execution_memory'] / 1e6:9.2f}MB "
                f"spill={spill}B {'!! SPILLED' if spill else 'ok'}"
            )

    out = {
        "asserts": "memory_spilled == 0 and disk_spilled == 0 for every query",
        "spilled": spilled_anywhere,
        "queries": results,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "SPILL_AUDIT.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"spill_audit": "FAIL" if spilled_anywhere else "PASS"}))
    return 1 if spilled_anywhere else 0


if __name__ == "__main__":
    sys.exit(main())
