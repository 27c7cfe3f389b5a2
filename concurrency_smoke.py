#!/usr/bin/env python
"""Wall receipt for the bounded multi-table export pool (VERDICT r9 #2).

The reference's workload was thousands of SMALL HBase tables driven by
4-16 beanstalkd workers (README.textile:120-121): per-table job latency
is dominated by fixed costs (scheduling, catalog row, snapshot-dir
commit), so serial driving leaves the cluster idle between jobs. This
measures that claim on the shape it applies to: N small cells tables
exported serially vs under ``max_concurrent=4``, same Spark session
(FAIR scheduler), fresh catalog+dest per pass, result parity asserted
(identical table-row sets, identical snapshot row counts).

Writes CONCURRENCY.json. Run: python concurrency_smoke.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hbacker_spark.catalog.catalog import Catalog  # noqa: E402
from hbacker_spark.operators.snapshots import CELLS_SCHEMA, SnapshotStore  # noqa: E402
from hbacker_spark.session import get_spark  # noqa: E402

N_TABLES = 12
ROWS_PER_TABLE = 20_000
POOL = 4


def make_cells(spark, seed: int):
    from pyspark.sql import functions as F

    base = 1_288_537_130_080
    return (
        spark.range(ROWS_PER_TABLE)
        .select(
            F.format_string("row%06d", (F.col("id") + seed) % 5000).alias("row_key"),
            F.when(F.col("id") % 2 == 0, "cf_a").otherwise("cf_b").alias("cf"),
            F.format_string("q%d", F.col("id") % 7).alias("qualifier"),
            (F.lit(base) + (F.col("id") * 37 + seed) % 1_000_000_000).alias("ts"),
            F.sha1(F.concat(F.col("id").cast("string"), F.lit(seed))).alias("value"),
        )
        .select([F.col(f.name).cast(f.dataType) for f in CELLS_SCHEMA.fields])
    )


def run_pass(spark, tables, root: str, max_concurrent: int) -> float:
    cat = Catalog(spark, os.path.join(root, "catalog"))
    store = SnapshotStore(spark, cat)
    t0 = time.perf_counter()
    store.export_tables(
        tables, os.path.join(root, "backups"), "20110101_000000",
        0, 2_300_000_000_000, max_concurrent=max_concurrent,
    )
    wall = time.perf_counter() - t0
    rows = {
        r["table_name"]: (r["empty"], r["error"])
        for r in cat.list_table_info("20110101_000000").collect()
    }
    assert len(rows) == N_TABLES and all(v == (False, False) for v in rows.values())
    return wall


def main() -> None:
    spark = get_spark(
        "concurrency_smoke",
        shuffle_partitions=8,
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tables = {f"t{i:02d}": make_cells(spark, i * 101).cache() for i in range(N_TABLES)}
    for df in tables.values():  # materialize inputs so passes measure EXPORT cost
        df.count()

    work = tempfile.mkdtemp(prefix="conc_smoke_")
    results = {}
    try:
        # warmup pass (JVM/commit-protocol), then measured serial + pooled
        run_pass(spark, tables, os.path.join(work, "warm"), 1)
        results["serial_wall_sec"] = round(run_pass(spark, tables, os.path.join(work, "serial"), 1), 2)
        results["pooled_wall_sec"] = round(run_pass(spark, tables, os.path.join(work, "pooled"), POOL), 2)

        # parity: pooled snapshot dirs hold exactly the serial row counts
        for t in tables:
            a = spark.read.parquet(os.path.join(work, "serial", "backups", "20110101_000000", t)).count()
            b = spark.read.parquet(os.path.join(work, "pooled", "backups", "20110101_000000", t)).count()
            assert a == b, (t, a, b)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    out = {
        "n_tables": N_TABLES,
        "rows_per_table": ROWS_PER_TABLE,
        "max_concurrent": POOL,
        "scheduler": "FAIR",
        **results,
        "speedup": round(results["serial_wall_sec"] / results["pooled_wall_sec"], 2),
        "note": (
            "small-table-heavy export (the reference's real workload shape): "
            "per-table cost is fixed-overhead-dominated, so a bounded driver "
            "pool overlaps it; big-table exports already use every core and "
            "gain little. Result parity asserted (catalog rows + per-table "
            "snapshot row counts identical serial vs pooled)."
        ),
    }
    Path(__file__).resolve().parent.joinpath("CONCURRENCY.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
