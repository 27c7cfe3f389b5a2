"""Snapshot validation: order-insensitive table fingerprints.

The reference validates an import by set-comparing table NAMES only
(lib/hbacker/import.rb:54-63 via S10); it has no content check — a
restored table that lost rows passes. This closes that gap with a
content fingerprint cheap enough to run after every export/import:

- per row: md5 over a canonical '|'-joined rendering of the columns
  (decimals rendered at fixed scale so both engines — and any future
  one — print identical strings), truncated to 60 bits;
- per table/group: BIT_XOR of the row digests + COUNT.

XOR is commutative/associative → the aggregate is partition-order
independent (safe under any shuffle or executor count, no overflow),
and any single-row difference flips the fingerprint. Comparing
(count, fingerprint) between source and restore detects loss,
duplication, and corruption; grouping by a partition column localizes
WHICH shard diverged without re-reading either side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_digest(cols: list[Column | str]) -> Column:
    """60-bit row digest: md5 of the canonical rendering, hex→int64.

    Callers must pre-render floats/decimals at a fixed scale (e.g.
    ``col.cast("decimal(12,2)").cast("string")``) — raw double→string
    is engine-specific, fixed-scale decimal→string is not.
    """
    canon = F.concat_ws("|", *[F.col(c) if isinstance(c, str) else c for c in cols])
    return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")


def table_fingerprint(df: DataFrame, cols: list[Column | str], group_by: list[str] | None = None) -> DataFrame:
    """(count, xor-fingerprint) per group (or for the whole table)."""
    d = row_digest(cols)
    aggs = [F.count(F.lit(1)).alias("n_rows"), F.bit_xor(d).alias("fingerprint")]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)
