"""Snapshot maintenance: compaction preserves content exactly (fingerprint,
not just count) while cutting file count; clustered writes range-partition
+ sort so parquet row-group stats prune."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hbacker_spark.operators.maintenance import (
    compact_snapshot,
    write_clustered,
)
from hbacker_spark.sources.storage import dir_bytes_and_files
from hbacker_spark.operators.validate import table_fingerprint


def _fp(df):
    cols = [F.col("id").cast("string"), F.col("v").cast("decimal(12,2)").cast("string")]
    return tuple(table_fingerprint(df, cols).collect()[0])


def test_compact_reduces_files_preserves_fingerprint(spark, tmp_path):
    path = str(tmp_path / "snap")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97 / F.lit(7)).cast("decimal(12,2)").alias("v")
    )
    df.repartition(64).write.parquet(path)  # pathological small-file layout
    assert dir_bytes_and_files(spark, path)[1] == 64
    want = _fp(spark.read.parquet(path))

    before, after = compact_snapshot(spark, path, target_file_mb=128)
    assert (before, after) == (64, 1)
    assert _fp(spark.read.parquet(path)) == want
    # no leftover temp/backup dirs
    assert not os.path.exists(path + ".__compact__")
    assert not os.path.exists(path + ".__pre_compact__")


def test_clustered_write_prunes_files_on_key_filter(spark, tmp_path):
    path = str(tmp_path / "clustered")
    df = spark.range(100_000).select(
        F.col("id"), (F.col("id") % 1000).cast("decimal(12,2)").alias("v")
    )
    write_clustered(df, path, ["id"], n_partitions=8)
    assert dir_bytes_and_files(spark, path)[1] == 8

    got = spark.read.parquet(path).filter(F.col("id") == 12_345)
    # correctness
    assert got.count() == 1
    # pruning: a narrow key range touches at most 2 adjacent range files
    # (1 + a sampled-split-point straddle), where the same data written
    # round-robin spreads every key range across ALL files.
    def files_touched(p):
        return (
            spark.read.parquet(p)
            .filter((F.col("id") >= 12_000) & (F.col("id") <= 12_999))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    assert files_touched(path) <= 2
    rr = str(tmp_path / "roundrobin")
    df.repartition(8).write.parquet(rr)
    assert files_touched(rr) == 8


def test_zorder_clustered_write_prunes_box_filters_on_both_dims(spark, tmp_path):
    """Z-order layout serves box filters on BOTH dimensions; 1-dim range
    clustering on x spreads any y-range across every file."""
    from hbacker_spark.operators.maintenance import zorder_key

    n = 64_000
    df = spark.range(n).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
    )

    def files_touched(p, lo_x, hi_x, lo_y, hi_y):
        return (
            spark.read.parquet(p)
            .filter(
                (F.col("x") >= lo_x) & (F.col("x") <= hi_x)
                & (F.col("y") >= lo_y) & (F.col("y") <= hi_y)
            )
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    zp = str(tmp_path / "zordered")
    write_clustered(df.withColumn("zk", zorder_key("x", "y", 8)), zp, ["zk"], n_partitions=16)
    xp = str(tmp_path / "x_only")
    write_clustered(df, xp, ["x"], n_partitions=16)

    # box filter: 1/8 of each dimension
    z_files = files_touched(zp, 0, 31, 0, 31)
    x_files = files_touched(xp, 0, 31, 0, 31)
    # x-clustering helps the x half of the box but every x-file spans
    # all y; the z-curve confines a 1/64-area box to a few curve spans
    assert z_files < x_files
    assert z_files <= 4
    # and the key fold is exact/portable: spot-check the interleave
    row = spark.range(1).select(
        F.lit(0b1010).alias("x"), F.lit(0b0110).alias("y")
    ).select(zorder_key("x", "y", 8).alias("zk")).first()
    # x bits -> even positions, y bits -> odd: 1010 & 0110 -> 01101100
    assert row["zk"] == 0b01101100


def test_zorder_key_matches_python_reference(spark):
    """The SQL shift/mask fold equals a bit-twiddling Python reference
    on a random grid, and the interleave is injective on the bounded
    domain (what makes it a usable clustering KEY)."""
    import random

    from hbacker_spark.operators.maintenance import zorder_key

    random.seed(7)
    pts = list({(random.randrange(256), random.randrange(256)) for _ in range(500)})
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["zk"]
        for r in df.select("x", "y", zorder_key("x", "y", 8).alias("zk")).collect()
    }

    def ref(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert all(got[(x, y)] == ref(x, y) for x, y in pts)
    assert len(set(got.values())) == len(pts)  # injective


def test_scrub_removes_only_forgotten_keys(spark, tmp_path):
    path = str(tmp_path / "scrub_snap")
    df = spark.range(1_000).select(
        F.col("id"), (F.col("id") % 7).cast("decimal(12,2)").alias("v")
    )
    df.write.parquet(path)
    forget = spark.createDataFrame([(5,), (17,), (999,)], "id long")

    from hbacker_spark.operators.maintenance import scrub_snapshot

    before, after = scrub_snapshot(spark, path, forget, "id")
    assert (before, after) == (1_000, 997)
    remaining = spark.read.parquet(path)
    assert remaining.filter(F.col("id").isin(5, 17, 999)).count() == 0
    # untouched rows keep their content (fingerprint of the kept set)
    want = _fp(df.filter(~F.col("id").isin(5, 17, 999)))
    assert _fp(remaining) == want
