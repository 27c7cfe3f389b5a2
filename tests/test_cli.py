"""CLI surface: drive `python -m hbacker_spark` as a subprocess — the
same terminal surface the reference's `hbacker export/import/db` offered.
One subprocess per command variant is slow (fresh JVM each); the suite
keeps it to one export+import+db round trip plus an error probe.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*argv: str, check: bool = True) -> subprocess.CompletedProcess:
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    return subprocess.run(
        [sys.executable, "-m", "hbacker_spark", *argv],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        check=check,
        timeout=240,
    )


@pytest.mark.slow
def test_cli_export_import_db_roundtrip(spark, tmp_path):
    # stage cells input with the engine (schema-correct parquet)
    from hbacker_spark.operators.snapshots import CELLS_SCHEMA

    cells_root = str(tmp_path / "cells")
    df = spark.createDataFrame(
        [(f"r{i % 7}", "cf", f"q{i % 2}", 1000 + i, f"v{i}") for i in range(200)], CELLS_SCHEMA
    )
    df.coalesce(1).write.parquet(f"{cells_root}/users.parquet")

    cat = str(tmp_path / "cat")
    dest = str(tmp_path / "dest")
    out = run_cli(
        "--catalog-root", cat, "export",
        "--cells-root", cells_root, "--all",
        "--dest-root", dest, "--session-name", "20260813_010101",
        "--end-time", "99999",
    )
    exported = json.loads(out.stdout.strip().splitlines()[-1])
    assert exported["tables"] == ["users"]

    restored_root = str(tmp_path / "restored")
    out = run_cli(
        "--catalog-root", cat, "import",
        "--source-root", dest, "--export-session", "20260813_010101",
        "--out-root", restored_root,
    )
    imported = json.loads(out.stdout.strip().splitlines()[-1])
    assert imported["tables"] == ["users"]
    back = spark.read.parquet(f"{restored_root}/users.parquet")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    out = run_cli("--catalog-root", cat, "db", "--session-name-pattern", "2026%")
    rows = [json.loads(l) for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert any(r["table_name"] == "users" and r["session_name"] == "20260813_010101" for r in rows)

    # probe: importing a table missing from the backup fails loudly
    bad = run_cli(
        "--catalog-root", cat, "import",
        "--source-root", dest, "--export-session", "20260813_010101",
        "--out-root", restored_root, "--tables", "users", "ghost",
        check=False,
    )
    assert bad.returncode != 0
    assert "ghost" in bad.stderr

    # wildcard selection (cli.rb:259 --pattern → C5 LIKE): 'us%' matches
    # users, 'zz%' matches nothing
    pat_root = str(tmp_path / "restored_pat")
    out = run_cli(
        "--catalog-root", cat, "import",
        "--source-root", dest, "--export-session", "20260813_010101",
        "--out-root", pat_root, "--pattern", "us%", "--import-session", "20260813_020202",
    )
    assert json.loads(out.stdout.strip().splitlines()[-1])["tables"] == ["users"]
    out = run_cli(
        "--catalog-root", cat, "import",
        "--source-root", dest, "--export-session", "20260813_010101",
        "--out-root", pat_root, "--pattern", "zz%", "--import-session", "20260813_030303",
    )
    assert json.loads(out.stdout.strip().splitlines()[-1])["tables"] == []

    # --tables xor --pattern (cli.rb:259 raises MalformattedArgumentError
    # on both; neither = catalog-driven full restore, exercised above).
    # argparse rejects the combination before a JVM ever starts.
    both = run_cli(
        "--catalog-root", cat, "import",
        "--source-root", dest, "--export-session", "20260813_010101",
        "--out-root", pat_root, "--tables", "users", "--pattern", "us%",
        check=False,
    )
    assert both.returncode != 0
    assert "not allowed with" in both.stderr  # mutually-exclusive-group error

    # db --table-name-pattern narrows the nested per-table listing
    # (cli.rb:310-319: LIKE on table_name within each session)
    out = run_cli("--catalog-root", cat, "db", "--table-name-pattern", "us%")
    rows = [json.loads(l) for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert rows and all(r["table_name"].startswith("us") for r in rows)
    out = run_cli("--catalog-root", cat, "db", "--table-name-pattern", "zz%")
    assert not [l for l in out.stdout.strip().splitlines() if l.startswith("{")]

    # db --dest-root filters to one destination chain (cli.rb:304-310)
    out = run_cli("--catalog-root", cat, "db", "--dest-root", dest)
    rows = [json.loads(l) for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert rows and all(r["dest_root"] == dest for r in rows)
    out = run_cli("--catalog-root", cat, "db", "--dest-root", str(tmp_path / "nowhere"))
    assert not [l for l in out.stdout.strip().splitlines() if l.startswith("{")]

    # compact: rewrite the exported users snapshot to one file, content-safe
    from hbacker_spark.operators.snapshots import snapshot_path

    snap = snapshot_path(dest, "20260813_010101", "users")
    n_before = sum(1 for f in os.listdir(snap) if f.endswith(".parquet"))
    out = run_cli(
        "--catalog-root", cat, "compact",
        "--dest-root", dest, "--session-name", "20260813_010101", "--table", "users",
        "--target-file-mb", "512",
    )
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["files_before"] == n_before and info["files_after"] == 1
    restored_again = spark.read.parquet(snap)
    assert restored_again.count() > 0


@pytest.mark.slow
def test_cli_query_surface(tmp_path):
    """`queries` lists the registry without a catalog root; `run` executes
    a registered query and writes parquet; `explain` prints a plan; an
    unknown name exits 2. One subprocess for the listing + one combined
    run (fresh JVM per subprocess is the cost ceiling here)."""
    ls = run_cli("queries", "--tag", "dedup")
    names = [json.loads(line)["name"] for line in ls.stdout.splitlines() if line.strip()]
    assert "dedup_exact_groups" in names
    assert all(json.loads(line).keys() == {"name", "tags", "oracled", "doc"}
               for line in ls.stdout.splitlines() if line.strip())
    # the listing surfaces each query's contract note (VERDICT r8 #6):
    # the O(n²) exactness anchors must show the scale fuse + their
    # sub-quadratic twin right in the user-facing surface
    by_name = {json.loads(line)["name"]: json.loads(line)
               for line in ls.stdout.splitlines() if line.strip()}
    for anchor, twin in (
        ("embedding_near_dup_pairs", "ann_near_dup_pairs"),
        ("embedding_dedup_clusters", "ann_dedup_clusters"),
        ("semantic_keeper_by_quality", "ann_keeper_by_quality"),
    ):
        doc = by_name[anchor]["doc"]
        assert "SPARK_GRAFT_EXACT_PAIR_MAX" in doc, anchor
        assert twin in doc, anchor

    out = str(tmp_path / "res")
    r = run_cli(
        "run", "--name", "dedup_exact_groups",
        "--sf-dir", "/root/testdata/sf0.001", "--out", out,
    )
    assert json.loads(r.stdout.splitlines()[-1])["out"] == out
    assert any(f.endswith(".parquet") for f in os.listdir(out))

    bad = run_cli("run", "--name", "nope", "--sf-dir", "/root/testdata/sf0.001", check=False)
    assert bad.returncode == 2

    ex = run_cli("explain", "--name", "q6_forecast_revenue", "--sf-dir", "/root/testdata/sf0.001")
    assert "PushedFilters" in ex.stdout or "Physical Plan" in ex.stdout


def test_cli_index_ops(spark, tmp_path):
    """`index health|compact|geometry` surface the stored-ANN-index
    lifecycle ops (no catalog root needed — geometry travels with the
    index). Built in-process, exercised via one subprocess each."""
    from pyspark.sql import functions as F

    from hbacker_spark.operators.ann_index import build_lsh_index
    from hbacker_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(200)
    path = str(tmp_path / "cli_idx")
    build_lsh_index(e, path, n_planes=6, n_shards=4)

    h = json.loads(run_cli("index", "health", "--index-path", path).stdout.splitlines()[-1])
    assert h["kind"] == "lsh" and "reindex_recommended" in h

    g = json.loads(run_cli("index", "geometry", "--index-path", path).stdout.splitlines()[-1])
    assert g["n_planes"] == 6 and g["n_shards"] == 4 and g["n_rows"] == 200

    c = json.loads(run_cli("index", "compact", "--index-path", path).stdout.splitlines()[-1])
    assert c["kind"] == "lsh" and c["files_after"] <= c["files_before"]

    forget = str(tmp_path / "forget_ids")
    e.filter(F.col("vec_id") < 20).select("vec_id").write.parquet(forget)
    s = json.loads(
        run_cli("index", "scrub", "--index-path", path, "--forget-ids", forget)
        .stdout.splitlines()[-1]
    )
    assert s["ids_removed"] == 20 and s["rows_after"] < s["rows_before"]
    assert s["purged"] is False
    bad = run_cli("index", "scrub", "--index-path", path, check=False)
    assert bad.returncode == 2

    # --purge (VERDICT r11 #5): forced physical deletion, flagged in the
    # receipt; exactly one data version remains on disk afterwards
    e.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 30)).select(
        "vec_id"
    ).write.parquet(forget2 := str(tmp_path / "forget_ids2"))
    sp = json.loads(
        run_cli("index", "scrub", "--index-path", path, "--forget-ids",
                forget2, "--purge").stdout.splitlines()[-1]
    )
    assert sp["purged"] is True and sp["ids_removed"] == 10
    from hbacker_spark.sources import storage as _storage

    sig_versions = [
        x["name"]
        for x in _storage.list_path(spark, f"{path}/signatures")
        if x["name"].startswith("v")
    ]
    assert len(sig_versions) == 1, sig_versions

    # rebuild (VERDICT r9 #3): auto-resized geometry, version advanced
    corpus = str(tmp_path / "corpus")
    e.write.parquet(corpus)
    r = json.loads(
        run_cli("index", "rebuild", "--index-path", path, "--corpus", corpus)
        .stdout.splitlines()[-1]
    )
    assert r["kind"] == "lsh" and r["n_rows"] == 200 and r["version"] >= 1

    # maintain (VERDICT r10 #4): the cron-able policy entry point — a
    # just-rebuilt index is clean, so maintain is a no-op
    m = json.loads(
        run_cli("index", "maintain", "--index-path", path, "--corpus", corpus)
        .stdout.splitlines()[-1]
    )
    assert m["actions"] == [] and not m["health_after"]["reindex_recommended"]


def test_csv_safe_stringifies_unwritable_columns(spark, tmp_path):
    """`run --format csv` must work for queries with container/binary
    columns (ADVICE r4): arrays/maps/structs become JSON, binary
    becomes hex, scalars pass through untouched — and the result
    actually CSV-writes."""
    from pyspark.sql import functions as F

    from hbacker_spark.cli import csv_safe

    df = spark.range(1).select(
        F.col("id"),
        F.array(F.lit(1), F.lit(2)).alias("arr"),
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
        F.struct(F.lit(1).alias("a")).alias("st"),
        F.lit(b"\x01\xff").alias("bin"),
    )
    safe = csv_safe(df)
    assert [f.dataType.typeName() for f in safe.schema.fields] == ["long"] + ["string"] * 4
    row = safe.collect()[0]
    assert row["arr"] == "[1,2]" and row["m"] == '{"k":1}' and row["st"] == '{"a":1}'
    assert row["bin"] == "01FF"
    out = str(tmp_path / "csv_out")
    safe.write.mode("overwrite").csv(out)  # would raise on the raw df
