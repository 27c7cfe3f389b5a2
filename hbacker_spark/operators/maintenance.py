"""Snapshot maintenance: compaction and clustered (sorted) rewrite.

The two table-layout problems that dominate at 100 TB and that the
reference (which delegates layout to HBase itself) never had to face:

- **Small files.** An incremental chain of thousands of sessions — or a
  highly parallel export — leaves snapshot dirs full of KB-scale parquet
  files; every downstream scan then pays per-file open/footer overhead
  and the driver pays listing time. ``compact_snapshot`` rewrites a dir
  to ~target-sized files. (This is what OPTIMIZE does in lakehouse
  formats; here it's plain parquet + an atomic dir swap.)
- **Clustering.** Parquet prunes row groups via min/max column stats,
  but only if the data is actually clustered on the filter column.
  ``write_clustered`` = repartitionByRange + sortWithinPartitions: a
  range shuffle (sampled split points, balanced output) followed by a
  per-partition sort, so every output file covers a narrow key range
  and point/range scans skip whole files.

Both rewrites are verified by content fingerprint (operators/validate),
not row count alone, and both swap directories atomically (temp dir +
rename — same crash-safety pattern as the catalog's C2 point-update),
so a reader never observes a half-compacted snapshot. All sizing and
swap filesystem ops go through the Hadoop FileSystem API (r10, same
port as the catalog and the ANN index maintenance) so snapshot dirs on
``hdfs://``/``s3a://`` compact and scrub like local ones.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession

from hbacker_spark.sources import storage


def compact_snapshot(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> tuple[int, int]:
    """Rewrite a snapshot dir into ~``target_file_mb`` files; returns
    (files_before, files_after).

    File count is computed from the dir's actual bytes, so the rewrite
    is one narrow-dependency coalesce when shrinking (no shuffle — the
    usual case) and one round-robin repartition only when a dir must be
    split wider. The swap is atomic: write to ``<path>.__compact__``,
    then rename over the original (keeping it as ``.__pre_compact__``
    until the swap succeeds — crash leaves either the old or the new
    dir, never a mix).
    """
    total_bytes, before = storage.dir_bytes_and_files(spark, path)
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    out = df.coalesce(n_files) if n_files <= before else df.repartition(n_files)

    tmp = path.rstrip("/") + ".__compact__"
    bak = path.rstrip("/") + ".__pre_compact__"
    storage.delete_path(spark, tmp)
    out.write.mode("errorifexists").parquet(tmp)
    storage.swap_dir(spark, tmp, path, bak)
    return before, storage.dir_bytes_and_files(spark, path)[1]


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str | Column],
    n_partitions: int | None = None,
) -> None:
    """Range-clustered parquet write: repartitionByRange samples split
    points (balanced files even on skewed keys), sortWithinPartitions
    orders rows inside each file, so min/max row-group stats become
    tight and filters on the cluster key prune whole files/groups.
    """
    part = (
        df.repartitionByRange(n_partitions, *cluster_by)
        if n_partitions
        else df.repartitionByRange(*cluster_by)
    )
    part.sortWithinPartitions(*cluster_by).write.mode("errorifexists").parquet(path)


def zorder_key(x: str, y: str, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of the low ``bits`` bits of two
    non-negative integer expressions — the multi-dimensional clustering
    key for data skipping. ``write_clustered(df, path, [zorder_key(a,
    b)])`` lays files along the Z-curve, so parquet min/max stats stay
    tight on BOTH dimensions and a box filter (a-range AND b-range)
    prunes files; 1-dim range clustering can only serve one of the two.
    Pure codegen fold (shift/mask inside ``aggregate``), no Python;
    bit-identical cross-engine (the DuckDB mirror is the same integer
    fold), so layout decisions are reproducible anywhere.
    """
    from pyspark.sql import functions as F

    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), "
        f"(acc, i) -> acc "
        f"+ shiftleft(shiftright(CAST({x} AS BIGINT), i) & CAST(1 AS BIGINT), 2*i) "
        f"+ shiftleft(shiftright(CAST({y} AS BIGINT), i) & CAST(1 AS BIGINT), 2*i+1))"
    )


def sql_zorder_key(x: str, y: str, bits: int = 16) -> str:
    """DuckDB mirror of :func:`zorder_key` (same integer fold)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), generate_series(0, {bits - 1})), "
        f"(acc, i) -> acc "
        f"+ (((CAST({x} AS BIGINT) >> i) & 1) << (2*i)) "
        f"+ (((CAST({y} AS BIGINT) >> i) & 1) << (2*i+1)))"
    )


def scrub_snapshot(
    spark: SparkSession, path: str, forget_keys: DataFrame, key_col: str
) -> tuple[int, int]:
    """Right-to-be-forgotten rewrite: drop every row whose ``key_col``
    appears in ``forget_keys``; returns (rows_before, rows_after).

    This is the ONE deliberate exception to the snapshot layer's
    append-only discipline (snapshots.py documents the no-delete
    caveat): compliance deletion must rewrite history, so it reuses the
    compaction swap (temp dir + rename) to stay atomic, and the
    implementation is a broadcast left_anti join — the forget list is
    small relative to the table at any scale, and the rewrite is one
    scan with no shuffle of the kept data. Run fingerprints before and
    after if you need an audit trail of what changed.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    before = df.count()
    keys = forget_keys.select(F.col(key_col)).distinct()
    kept = df.join(F.broadcast(keys), key_col, "left_anti")

    tmp = path.rstrip("/") + ".__scrub__"
    bak = path.rstrip("/") + ".__pre_scrub__"
    storage.delete_path(spark, tmp)
    kept.write.mode("errorifexists").parquet(tmp)
    storage.swap_dir(spark, tmp, path, bak)
    after = spark.read.parquet(path).count()
    return before, after
