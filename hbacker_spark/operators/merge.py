"""MERGE/upsert emulation on plain Parquet (no Delta in this image).

The engine's catalog point-update (C2) is one special case; this is the
general operator: upsert + delete-by-predicate + SCD2 history append,
each producing a new DataFrame the caller writes with an atomic dir swap
(see catalog.Catalog._overwrite). On Delta/Iceberg these map 1:1 onto
MERGE INTO; expressing them as anti-join + union keeps the semantics
portable and testable here.

Scale notes: upsert is one shuffle on the key (anti-join) + union;
nothing driver-side. SCD2 windows once over (key, valid_from).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Rows from ``source`` win on key collision; unmatched target rows
    survive (MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT)."""
    kept = target.join(source.select(*keys).distinct(), on=keys, how="left_anti")
    return kept.unionByName(source)


def merge_delete(target: DataFrame, predicate: Column) -> DataFrame:
    """MERGE ... WHEN MATCHED DELETE (tombstone-free: the rewrite drops
    the rows; append-only snapshot history still can't resurrect them —
    the reference's no-delete caveat, README.textile:9)."""
    return target.filter(~predicate)


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: list[str],
    ts_col: str = "valid_from",
    end_col: str = "valid_to",
    current_col: str = "is_current",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2: append new versions, close the
    previous current row per key (valid_to = new valid_from), exactly one
    is_current per key. ``updates`` must carry ``keys`` + ``ts_col``.
    Pass ``tiebreak_cols`` when ts values can collide within a key — the
    version order (and hence close-out chain) stays deterministic.
    """
    base = history.select(*[c for c in history.columns if c not in (end_col, current_col)])
    merged = base.unionByName(updates.select(*base.columns))
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        merged.withColumn(end_col, F.lead(ts_col).over(w))
        .withColumn(current_col, F.col(end_col).isNull())
    )
