"""Directory-safe byte probe + driver_local_df guards (r14).

VERDICT r13 #2: the r13 scale-adaptive width heuristics probed table
size with ``os.path.getsize(table_path(...))`` — correct on the driver's
single-file testdata layout, but a DIRECTORY-backed table (any real
multi-file layout) returns the dirent size (~4 KB) without raising, so
the derived widths silently collapsed to their floor exactly where they
matter. ``table_bytes`` sums real data files; these tests pin that a
directory-backed table derives the same width as its single-file
equivalent, that Spark-style metadata names are skipped, and that the
no-data and missing-path cases still raise OSError for the callers'
planner fallback.
"""

from __future__ import annotations

import os
import shutil

import pytest

from hbacker_spark.sources.tables import driver_local_df, table_bytes, table_path

SF = "/root/testdata/sf0.001"


@pytest.fixture
def dir_backed(tmp_path):
    """An sf_dir whose lineitem table is a DIRECTORY of part files, each
    byte-identical to the single-file testdata table."""
    src = table_path(SF, "lineitem")
    d = tmp_path / "lineitem.parquet"
    d.mkdir()
    shutil.copyfile(src, d / "part-00000.parquet")
    shutil.copyfile(src, d / "part-00001.parquet")
    # Spark-style metadata the file index ignores — the probe must too
    (d / "_SUCCESS").write_text("")
    (d / ".part-00000.parquet.crc").write_bytes(b"x" * 1024)
    hidden = d / "_delta_log"
    hidden.mkdir()
    (hidden / "000.json").write_text("{}" * 100)
    return str(tmp_path)


def test_single_file_unchanged():
    assert table_bytes(SF, "lineitem") == os.path.getsize(table_path(SF, "lineitem"))


def test_directory_sums_data_files_only(dir_backed):
    single = os.path.getsize(table_path(SF, "lineitem"))
    got = table_bytes(dir_backed, "lineitem")
    assert got == 2 * single, "must sum real part files, skip _/. metadata"
    # the r13 bug shape: a dirent-size probe would be ~4 KB
    assert got > 100 * 1024


def test_directory_width_equals_single_file_equivalent(tmp_path):
    """The derived exchange width (bytes // 32MB + 1, the graph-family
    formula) for a directory holding exactly the single file's bytes is
    identical to the single-file probe's width."""
    src = table_path(SF, "lineitem")
    d = tmp_path / "lineitem.parquet"
    d.mkdir()
    shutil.copyfile(src, d / "part-00000.parquet")
    single_w = os.path.getsize(src) // (32 << 20) + 1
    dir_w = table_bytes(str(tmp_path), "lineitem") // (32 << 20) + 1
    assert dir_w == single_w


def test_empty_directory_raises(tmp_path):
    (tmp_path / "lineitem.parquet").mkdir()
    with pytest.raises(OSError):
        table_bytes(str(tmp_path), "lineitem")


def test_missing_path_raises(tmp_path):
    with pytest.raises(OSError):
        table_bytes(str(tmp_path), "lineitem")


def test_driver_local_df_comma_typed_schema(spark):
    """ADVICE r13: schema parsing must survive commas inside types."""
    from decimal import Decimal

    df = driver_local_df(
        spark, [(1, Decimal("2.50"))], "k int, v decimal(12,2)"
    )
    assert df.columns == ["k", "v"]
    assert df.count() == 1


def test_driver_local_df_arity_guard(spark):
    with pytest.raises(ValueError, match="arity"):
        driver_local_df(spark, [(1, 2, 3)], "k int, v int")
