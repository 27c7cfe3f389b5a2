#!/usr/bin/env python
"""Per-query profiler (optimization round): run named queries under a
UI-enabled session and report, per query, wall seconds plus a job/stage
breakdown scraped from the local REST API — task counts, task-time sum,
shuffle read/write bytes, Python (Arrow) boundary time. This is the
guide-§1 "where is the time actually going" instrument; bench.py stays
the contract harness.

Usage: python profile_query.py name1 name2 ...   (substring match)
       PROFILE_REPS=N (default 2; min over reps is reported per query,
       the breakdown is from the LAST rep).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hbacker_spark.registry import load_all_queries  # noqa: E402
from hbacker_spark.session import get_spark  # noqa: E402


def rest(url: str):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PROFILE_REPS", "2"))
    spark = get_spark(
        "hbacker_profile", extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4047"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()
    from hbacker_spark.operators.rank import release_rank_blocks

    only = sys.argv[1:]
    names = sorted(n for n in specs if any(o in n for o in only))

    def run_noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup: JVM + python workers
    run_noop(specs["q6_forecast_revenue"].fn(spark, sf_dir))
    import pandas as pd  # noqa: F401

    def ident(it):
        yield from it

    spark.range(1000).toDF("id").mapInPandas(ident, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    # JIT warmup parity with bench.py's calibrate(): without this,
    # CPU-heavy codegen stages run interpreted/C1 and read 5-100x hotter
    # than they are in the bench session.
    for _ in range(3):
        spark.range(200_000_000).selectExpr(
            "sum(id * (id % 7)) as s", "count(if(id % 13 = 0, 1, null)) as c"
        ).write.format("noop").mode("overwrite").save()

    app = rest("http://localhost:4047/api/v1/applications")[0]["id"]
    base = f"http://localhost:4047/api/v1/applications/{app}"

    for name in names:
        walls = []
        for rep in range(reps):
            jobs_before = {j["jobId"] for j in rest(f"{base}/jobs")}
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            run_noop(specs[name].fn(spark, sf_dir))
            walls.append(time.perf_counter() - t0)
            release_rank_blocks(spark)
        spark.sparkContext.setJobDescription(None)
        jobs = [j for j in rest(f"{base}/jobs") if j["jobId"] not in jobs_before]
        jobs.sort(key=lambda j: j["jobId"])
        n_tasks = sum(j["numTasks"] for j in jobs)
        print(f"\n=== {name}: wall={min(walls):.3f}s (last rep {walls[-1]:.3f}s) "
              f"jobs={len(jobs)} tasks={n_tasks}")
        stage_ids = []
        for j in jobs:
            stage_ids.extend(j["stageIds"])
        tot_run = tot_cpu = tot_sr = tot_sw = tot_py = 0
        rows = []
        for sid in sorted(set(stage_ids)):
            try:
                st = rest(f"{base}/stages/{sid}")
            except Exception:
                continue
            for s in st:
                if s["status"] not in ("COMPLETE", "FAILED"):
                    continue
                dur = (s.get("executorRunTime") or 0) / 1000.0
                cpu = (s.get("executorCpuTime") or 0) / 1e9
                sr = s.get("shuffleReadBytes") or 0
                sw = s.get("shuffleWriteBytes") or 0
                tot_run += dur
                tot_cpu += cpu
                tot_sr += sr
                tot_sw += sw
                rows.append(
                    (dur, s["stageId"], s["numCompleteTasks"], cpu, sr, sw, s["name"].split("\n")[0][:80])
                )
        rows.sort(reverse=True)
        print(f"  sum(executorRunTime)={tot_run:.2f}s cpu={tot_cpu:.2f}s "
              f"shuffleR={tot_sr/1e6:.1f}MB shuffleW={tot_sw/1e6:.1f}MB")
        for dur, sid, nt, cpu, sr, sw, nm in rows[:12]:
            print(f"   stage {sid:>5} tasks={nt:>3} run={dur:7.2f}s cpu={cpu:6.2f}s "
                  f"sR={sr/1e6:7.1f}MB sW={sw/1e6:7.1f}MB  {nm}")


if __name__ == "__main__":
    main()
