"""Portable HyperLogLog: the ESTIMATE itself is value-oracled.

ADVICE r6 flagged that the error-band reformulations of the sketch
queries (approx_distinct_users, hll_distinct_users, ...) check the
estimator CONTRACT but no longer return the estimate — the approximate
path the 100 TB story is about. Engine-native sketches (DataSketches
HLL, HLL++) can never return a hash-matchable estimate because their
register hashing is engine-internal. This module removes that
impossibility the same way the MinHash/SimHash family was oracled in
r6: make the hash plumbing itself engine-portable.

Standard HLL (Flajolet-Fuss-Gandouet-Meunier 2007), md5-keyed:

  bucket = first 8 md5 hex bits            (m = 256 registers)
  rho    = leading-zero count + 1 of the next 40 bits
           = 41 - bitlen(x), capped at 40  (exact via bin() length)
  register[bucket] = max(rho)              (mergeable: max is the union)
  E_raw  = alpha_m · m² / Σ 2^-register    (Σ as EXACT int64: Σ 2^(40-r),
           absent registers via the closed-form complement)
  E      = m · ln(m/V) when E_raw ≤ 2.5m and V = empty registers > 0
           (the small-range linear-counting correction), else E_raw.

Every step is integer-exact except the final estimate arithmetic,
which uses only IEEE-exact ops on identical literals: ln is never
evaluated by either engine — V is an integer in [1, m], so ln(V) comes
from an embedded 256-entry literal table generated once by Python's
repr (both engines parse the same decimal literal to the same double).
DuckDB therefore reproduces the estimate BIT-FOR-BIT, so the
production-shaped sketch query (group → estimate, no exact twin, no
second scan) is hash-checked cell-for-cell. Scale shape: one corpus
scan, map-side combine into ≤ m rows per group; merge/rollup is a
register-wise max.

Accuracy (not part of the hash contract; pinned in
tests/test_curation_stats.py): σ ≈ 1.04/√256 = 6.5%; measured 4.2%
(sf0.01) / 3.1% (sf0.1) vs exact distinct on every group.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M = 256  # registers = 2^8 buckets from the first md5 byte
RHO_W = 40  # width of the rho bit stream (next 10 hex chars)

# alpha_m * m^2 * 2^RHO_W and ln(m) as repr'd literals: both engines
# parse the identical decimal string to the identical double.
_ALPHA_NUM = repr(0.7213 / (1.0 + 1.079 / M) * float(M * M) * float(2**RHO_W))
_LN_M = repr(math.log(float(M)))
_LC_CUTOFF = repr(2.5 * M)
# ln(v) for v = 1..m as a literal lookup — the LC correction without
# either engine's ln() in the hash contract.
_LNV = [repr(math.log(v)) for v in range(1, M + 1)]
_LNV_SPARK = "array(" + ",".join(f"CAST({x} AS DOUBLE)" for x in _LNV) + ")"
_LNV_DUCK = "[" + ",".join(f"CAST({x} AS DOUBLE)" for x in _LNV) + "]"


def registers(df: DataFrame, group_cols: list[str], item_col: str) -> DataFrame:
    """(group..., bucket, rho) register relation: ≤ m rows per group,
    built in ONE scan with map-side combine (groupBy max). The register
    relation IS the mergeable sketch state: union of groups = max per
    bucket."""
    h = F.md5(F.col(item_col).cast("string").cast("binary"))
    x = F.conv(F.substring(h, 3, 10), 16, 10).cast("long")
    return (
        df.select(
            *group_cols,
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("bucket"),
            F.least(F.lit(RHO_W + 1) - F.length(F.bin(x)), F.lit(RHO_W)).alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def estimate_agg(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse a register relation to (group..., s, nb): s = exact
    int64 Σ 2^(RHO_W - rho) including the closed-form complement for
    absent registers, nb = present registers."""
    return regs.groupBy(*group_cols).agg(
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {RHO_W} - rho)"))
            + (F.lit(M) - F.count(F.lit(1))) * F.lit(1 << RHO_W)
        ).alias("s"),
        F.count(F.lit(1)).alias("nb"),
    )


def estimate_expr(s_col: str = "s", nb_col: str = "nb", round_to: int = 4) -> Column:
    """The portable estimate from (s, nb) — raw HLL with the
    linear-counting small-range branch, every float op IEEE-exact over
    identical literals in both engines."""
    return F.expr(
        f"CASE WHEN CAST({_ALPHA_NUM} AS DOUBLE) / CAST({s_col} AS DOUBLE)"
        f"          <= CAST({_LC_CUTOFF} AS DOUBLE) AND {M} - {nb_col} > 0 "
        f"THEN round(CAST({M}.0 AS DOUBLE) * (CAST({_LN_M} AS DOUBLE) "
        f"     - element_at({_LNV_SPARK}, CAST({M} - {nb_col} AS INT))), {round_to}) "
        f"ELSE round(CAST({_ALPHA_NUM} AS DOUBLE) / CAST({s_col} AS DOUBLE), {round_to}) "
        f"END"
    )


# --- DuckDB mirrors ---------------------------------------------------


def sql_registers(rel: str, group_expr: str, item_expr: str) -> str:
    """Register-relation fragment: SELECT {group} AS grp, bucket, rho."""
    h = f"md5(CAST({item_expr} AS VARCHAR))"
    return f"""
      SELECT {group_expr} AS grp, bucket, MAX(rho) AS rho FROM (
        SELECT {group_expr},
               CAST(('0x' || substr({h}, 1, 2)) AS BIGINT) AS bucket,
               least({RHO_W + 1} - length(bin(CAST(('0x' || substr({h}, 3, 10)) AS BIGINT))),
                     {RHO_W}) AS rho
        FROM {rel})
      GROUP BY 1, 2"""


def sql_estimate_agg(regs_rel: str, group_col: str = "grp") -> str:
    """(group, s, nb) fragment over a register relation."""
    return f"""
      SELECT {group_col},
             SUM(CAST(1 AS BIGINT) << ({RHO_W} - rho))
               + ({M} - COUNT(*)) * (CAST(1 AS BIGINT) << {RHO_W}) AS s,
             COUNT(*) AS nb
      FROM {regs_rel} GROUP BY 1"""


def sql_estimate(s_col: str = "s", nb_col: str = "nb", round_to: int = 4) -> str:
    """Estimate expression over (s, nb) — bit-identical to
    :func:`estimate_expr`."""
    return (
        f"CASE WHEN CAST({_ALPHA_NUM} AS DOUBLE) / CAST({s_col} AS DOUBLE)"
        f"          <= CAST({_LC_CUTOFF} AS DOUBLE) AND {M} - {nb_col} > 0 "
        f"THEN round(CAST({M}.0 AS DOUBLE) * (CAST({_LN_M} AS DOUBLE) "
        f"     - {_LNV_DUCK}[CAST({M} - {nb_col} AS INT)]), {round_to}) "
        f"ELSE round(CAST({_ALPHA_NUM} AS DOUBLE) / CAST({s_col} AS DOUBLE), {round_to}) "
        f"END"
    )
