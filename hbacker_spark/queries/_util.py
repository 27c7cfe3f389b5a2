"""Shared helpers for oracle-exact query definitions.

Money columns in the testdata carry exactly 2 decimals and rates
(discount/tax) 2 decimals, so casting to DECIMAL is lossless. Decimal
sums are exact and order-independent → Spark (parallel partial aggs) and
DuckDB produce the *same* number regardless of execution order; casting
the final value to DOUBLE is then deterministic on both sides. Never sum
raw doubles in an oracle-checked aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"  # l_extendedprice, o_totalprice, *_acctbal, value
RATE = "decimal(4,2)"  # l_discount, l_tax
QTY = "decimal(12,2)"  # l_quantity (integral-valued)


def money(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def rate(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(RATE)


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal — scale 4."""
    return (money("l_extendedprice") * (F.lit(1).cast(RATE) - rate("l_discount"))).cast("decimal(18,4)")


def charge() -> Column:
    """disc_price * (1 + l_tax), exact decimal — scale 6."""
    return (disc_price() * (F.lit(1).cast(RATE) + rate("l_tax"))).cast("decimal(24,6)")


# DuckDB-side equivalents (keep in lockstep with the Column builders above).
SQL_DISC_PRICE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))"
)
SQL_CHARGE = (
    f"CAST({SQL_DISC_PRICE}"
    " * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(24,6))"
)


def sql_double(expr: str) -> str:
    """Correctly-rounded DECIMAL→DOUBLE for DuckDB oracles.

    DuckDB's ``CAST(decimal AS DOUBLE)`` converts the scaled integer to
    double FIRST and divides by 10^scale after — two roundings. Once
    the scaled integer exceeds 2^53 the first conversion is inexact and
    the composition lands 1 ulp off the correctly-rounded value
    (measured in the r10 full-registry sf1 sweep: q1's sum_charge at
    x10 is ~2.8e16 scaled units at scale 6 → DuckDB ...941593 vs the
    true ...94159 that Spark's BigDecimal.doubleValue() and Python's
    float(Decimal) both produce). Routing through VARCHAR is one
    correctly-rounded string→double parse, bit-identical to Spark at
    any magnitude. Use this for any oracle double whose exact decimal
    can exceed ~9e15 scaled units at the sweep's replica scales."""
    return f"CAST(CAST(({expr}) AS VARCHAR) AS DOUBLE)"
