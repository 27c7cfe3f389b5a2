"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registered query in Spark and its oracle SQL in DuckDB over the
same parquet, then compares row count, column-name set, and an
order-insensitive canonicalized value multiset. Strict by default
(exact string canonicalization of every value) — if this passes, any
reasonable hash-based driver check passes too.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import shutil
import tempfile
from decimal import Decimal

import duckdb

from hbacker_spark.sources.tables import TABLES, table_path


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        # repr round-trips doubles exactly; bit-identical doubles → equal strings
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        return f"f:{float(v)!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, dt.datetime):
        return f"t:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, dt.date):
        return f"t:{dt.datetime(v.year, v.month, v.day).isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return f"s:{v}"


class OracleTimeout(RuntimeError):
    """The DuckDB oracle exceeded its wall budget and was interrupted.
    This is a statement about the ORACLE's cost (interpreted lambda
    folds, recursive CTEs), never the engine's — sweeps catch it and
    degrade the query to a smaller replica scale (sf1_parity.py)."""


def duckdb_oracle(sql: str, sf_dir: str, timeout_s: float | None = None):
    # Bounded memory + a spill dir: at replica scales (x10 sweeps) the
    # heavy pair/recursive-CTE oracles otherwise grow until malloc fails
    # ("bad allocation") while sharing the machine with the Spark JVM.
    # With a temp_directory DuckDB spills spillable operators to disk
    # instead of dying; tiny test SFs never notice the cap. The temp dir
    # is UNIQUE PER CONNECTION: two DuckDB processes sharing one spill
    # dir clobber each other's numbered temp files (observed abort:
    # "Could not remove duckdb_temp_storage-2.tmp").
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".duckdb_spill")
    os.makedirs(base, exist_ok=True)
    spill = tempfile.mkdtemp(dir=base)
    con = duckdb.connect(
        config={
            "memory_limit": os.environ.get("SPARK_GRAFT_DUCK_MEM", "24GB"),
            "temp_directory": spill,
        }
    )
    try:
        for t in TABLES:
            p = table_path(sf_dir, t)
            if not os.path.exists(p):
                # partial replica dirs (e.g. x3/x100 carry only
                # documents+embeddings) — a query referencing a missing
                # table fails at ITS view lookup, not at setup
                continue
            if os.path.isdir(p):
                # Spark-written table (e.g. the x10/x100 scale replicas)
                # is a directory of part files; DuckDB needs the glob.
                p = os.path.join(p, "*.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        timer = None
        if timeout_s:
            import threading

            # con.interrupt() is thread-safe; the running statement
            # raises duckdb.InterruptException at its next check
            timer = threading.Timer(timeout_s, con.interrupt)
            timer.daemon = True
            timer.start()
        try:
            cur = con.execute(sql)
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
        except duckdb.InterruptException as ex:
            raise OracleTimeout(f"oracle exceeded {timeout_s:.0f}s wall budget") from ex
        finally:
            if timer is not None:
                timer.cancel()
        return cols, rows
    finally:
        con.close()
        shutil.rmtree(spill, ignore_errors=True)


def compare(spark_df, oracle_sql: str, sf_dir: str, oracle_timeout_s: float | None = None) -> list[str]:
    """Returns a list of mismatch descriptions (empty == pass)."""
    o_cols, o_rows = duckdb_oracle(oracle_sql, sf_dir, timeout_s=oracle_timeout_s)
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    # query boundary: free any rank-pinned checkpoint blocks so a full
    # 169-query parity sweep doesn't accumulate dead range buckets
    from hbacker_spark.operators.rank import release_rank_blocks

    release_rank_blocks()

    problems: list[str] = []
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")

    s_order = [s_cols.index(c) for c in sorted(s_cols)]
    o_order = [o_cols.index(c) for c in sorted(o_cols)]
    s_set = sorted("|".join(_canon(r[i]) for i in s_order) for r in s_rows)
    o_set = sorted("|".join(_canon(r[i]) for i in o_order) for r in o_rows)
    if s_set != o_set:
        diffs = [(a, b) for a, b in zip(s_set, o_set) if a != b]
        only_s = [x for x in s_set if x not in set(o_set)][:3]
        only_o = [x for x in o_set if x not in set(s_set)][:3]
        problems.append(
            f"values differ ({len(diffs)} positional diffs); spark-only sample={only_s}; oracle-only sample={only_o}"
        )
    return problems
