"""Multi-scheme artifact I/O — S11/S12 via the Hadoop FileSystem API.

The reference dispatches on URI scheme by hand (s3/s3n → RightAws PUT,
file → mkdir_p+write, hdfs → local shadow dir with a warning;
lib/hbacker/s3.rb:60-78). Spark's Hadoop layer already resolves
``file://``, ``hdfs://``, ``s3a://`` (with the right jars) uniformly, so
one code path covers every scheme — on a real cluster the same call
writes to S3/HDFS with no code change.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def save_info(spark: SparkSession, full_path: str, data: str) -> None:
    """S11 (s3.rb:60-78): write a small artifact (job log, marker) to any
    scheme the Hadoop conf resolves. Parent dirs are created implicitly."""
    fs, hpath = _fs_and_path(spark, full_path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(data.encode("utf-8")))
    finally:
        out.close()


def read_info(spark: SparkSession, full_path: str) -> str:
    fs, hpath = _fs_and_path(spark, full_path)
    stream = fs.open(hpath)
    try:
        jvm = spark._jvm
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def list_path(spark: SparkSession, path: str) -> list[dict]:
    """S12 (s3.rb:38-48): one-level listing — files and "common prefixes"
    (subdirectories), like a delimiter='/' object-store listing."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return []
    out = []
    for status in fs.listStatus(hpath):
        out.append(
            {
                "name": status.getPath().getName(),
                "is_dir": bool(status.isDirectory()),
                "size": int(status.getLen()),
            }
        )
    return sorted(out, key=lambda d: d["name"])


def exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def delete_path(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """Remove a path (any scheme). Used to clear partial output before a
    transient-failure retry; returns False if the path did not exist."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return False
    return bool(fs.delete(hpath, recursive))
