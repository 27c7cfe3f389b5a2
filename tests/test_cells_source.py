"""Python Data Source connector for the cells model: 1 partition per
region, row-key pushdown prunes regions at planning time, writer
round-trips through an atomic meta commit."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from hbacker_spark.sources.cells_source import FORMAT_NAME, HBaseCellsDataSource


@pytest.fixture(scope="module")
def region_dir(spark, tmp_path_factory):
    """3 regions with key boundaries row000 | row004 | row008."""
    root = str(tmp_path_factory.mktemp("regions"))
    bounds = [(None, "row004"), ("row004", "row008"), ("row008", None)]
    regions = []
    for i, (start, end) in enumerate(bounds):
        file = f"region_{i:05d}.jsonl"
        with open(os.path.join(root, file), "w") as f:
            for rk in range(12):
                key = f"row{rk:03d}"
                if (start is None or key >= start) and (end is None or key < end):
                    for v in range(2):
                        f.write(json.dumps({
                            "row_key": key, "cf": "hobbit", "qualifier": "qa",
                            "ts": 1000 + v, "value": f"v{v}-{key}",
                        }) + "\n")
        regions.append({"file": file, "start": start, "end": end})
    with open(os.path.join(root, "meta.json"), "w") as f:
        json.dump({"regions": regions}, f)
    spark.dataSource.register(HBaseCellsDataSource)
    # runtime-settable; belt-and-braces in case the session predates the
    # factory conf (session.py sets it at build time too)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return root


def test_full_scan_one_partition_per_region(spark, region_dir):
    df = spark.read.format(FORMAT_NAME).option("path", region_dir).load()
    assert df.count() == 24
    assert df.rdd.getNumPartitions() == 3  # mapper-per-region layout


def test_rowkey_pushdown_prunes_regions(spark, region_dir):
    df = spark.read.format(FORMAT_NAME).option("path", region_dir).load()
    one = df.filter(F.col("row_key") == "row006")
    assert one.rdd.getNumPartitions() == 1  # planned AFTER pushdown
    assert one.count() == 2
    rng = df.filter((F.col("row_key") >= "row004") & (F.col("row_key") < "row008"))
    assert rng.rdd.getNumPartitions() == 1
    assert rng.count() == 8
    # non-key filters are NOT accepted -> Spark evaluates them, all regions scanned
    other = df.filter(F.col("value") == "v0-row000")
    assert other.rdd.getNumPartitions() == 3
    assert other.count() == 1


def test_writer_roundtrip_with_range_partitioning(spark, region_dir, tmp_path):
    src = spark.read.format(FORMAT_NAME).option("path", region_dir).load()
    out = str(tmp_path / "bulk_out")
    # caller range-partitions by row_key = the HFile bulk-load contract
    src.repartitionByRange(2, "row_key").write.format(FORMAT_NAME).option(
        "path", out
    ).mode("append").save()
    back = spark.read.format(FORMAT_NAME).option("path", out).load()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    assert back.rdd.getNumPartitions() == 2
    # and pushdown prunes on the rebuilt meta too
    assert (
        back.filter(F.col("row_key") == "row000").rdd.getNumPartitions() == 1
    )


def test_stream_reader_tails_new_regions_as_deltas(spark, tmp_path):
    """Streaming tail: first drain ingests the store, a new region file
    (a new snapshot session) surfaces as exactly its delta on the next
    drain of the SAME checkpoint — no history re-read, ts is the
    watermark."""
    root = str(tmp_path / "regions")
    os.makedirs(root)

    def write_region(idx, cells, regions_acc):
        file = f"region_{idx:05d}.jsonl"
        with open(os.path.join(root, file), "w") as f:
            for c in cells:
                f.write(json.dumps(c) + "\n")
        regions_acc.append({"file": file, "start": None, "end": None})
        with open(os.path.join(root, "meta.json"), "w") as f:
            json.dump({"regions": regions_acc}, f)

    regions = []
    write_region(
        0,
        [
            {"row_key": "row000", "cf": "hobbit", "qualifier": "qa", "ts": 1000, "value": "a"},
            {"row_key": "row001", "cf": "hobbit", "qualifier": "qa", "ts": 1001, "value": "b"},
        ],
        regions,
    )
    spark.dataSource.register(HBaseCellsDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        # file sink (memory sink can't recover a checkpoint): each
        # drain APPENDS its delta, so the output dir accumulates
        # exactly once per cell
        q = (
            spark.readStream.format(FORMAT_NAME)
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r["row_key"], r["ts"]) for r in spark.read.parquet(out).collect()
        )

    assert drain() == [("row000", 1000), ("row001", 1001)]
    # a later snapshot session lands as a new region with higher ts
    write_region(
        1,
        [
            {"row_key": "row002", "cf": "hobbit", "qualifier": "qa", "ts": 1002, "value": "c"},
            # late cell BELOW the committed watermark is (documented)
            # dropped by the ts-offset contract — same as the export
            # chain's incremental watermark semantics
            {"row_key": "row000", "cf": "hobbit", "qualifier": "qa", "ts": 999, "value": "late"},
        ],
        regions,
    )
    # second drain of the same checkpoint appends ONLY the delta
    assert drain() == [("row000", 1000), ("row001", 1001), ("row002", 1002)]


def test_stream_reader_bounded_batches_and_starting_ts(tmp_path):
    """ADVICE r4: cold starts must be boundable. startingTs skips
    history below the backfill watermark; maxCellsPerBatch advances the
    ts offset only to the N-smallest pending versions per batch (ties
    on the boundary ts stay together, O(cap) driver memory) — driven
    directly against the reader, no Spark needed."""
    from hbacker_spark.sources.cells_source import CellsStreamReader

    root = str(tmp_path / "regions")
    os.makedirs(root)
    cells = [
        {"row_key": f"row{i:03d}", "cf": "cf", "qualifier": "q", "ts": ts, "value": "v"}
        for i, ts in enumerate([1000, 1001, 1001, 1002, 1003, 1004])
    ]
    with open(os.path.join(root, "region_00000.jsonl"), "w") as f:
        for c in cells:
            f.write(json.dumps(c) + "\n")
    with open(os.path.join(root, "meta.json"), "w") as f:
        json.dump({"regions": [{"file": "region_00000.jsonl", "start": None, "end": None}]}, f)

    r = CellsStreamReader({"path": root, "startingTs": "1000", "maxCellsPerBatch": "2"})
    off = r.initialOffset()
    assert off == {"ts": 1000}  # history at/below the backfill mark skipped

    rows1, off1 = r.read(off)
    rows1 = list(rows1)
    # cap=2 but the boundary ts 1001 has two cells — kept together
    assert [x[3] for x in rows1] == [1001, 1001] and off1 == {"ts": 1001}

    rows2, off2 = r.read(off1)
    assert [x[3] for x in rows2] == [1002, 1003] and off2 == {"ts": 1003}

    rows3, off3 = r.read(off2)
    assert [x[3] for x in rows3] == [1004] and off3 == {"ts": 1004}

    rows4, off4 = r.read(off3)
    assert list(rows4) == [] and off4 == {"ts": 1004}

    # exactly-once replay slices are cap-independent
    assert [x[3] for x in r.readBetweenOffsets({"ts": 1000}, {"ts": 1003})] == [
        1001, 1001, 1002, 1003
    ]
