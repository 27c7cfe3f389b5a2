#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution goes to the JVM-side noop sink so timings measure the full plan
(scan → shuffle → agg) without driver-side row transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hbacker_spark.registry import load_all_queries  # noqa: E402
from hbacker_spark.session import get_spark  # noqa: E402

WARMUP_QUERY = "q6_forecast_revenue"


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark("hbacker_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()

    # Warm the JVM / codegen / parquet footer caches once; not timed.
    run_noop(specs[WARMUP_QUERY].fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name in sorted(specs):
        t0 = time.perf_counter()
        run_noop(specs[name].fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
