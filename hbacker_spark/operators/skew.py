"""Skew-aware aggregation/join helpers.

AQE (enabled in session.py) already splits skewed shuffle partitions for
joins at runtime; these helpers cover the cases AQE doesn't: hot-key
aggregation (a single giant group still lands on one reducer) and
deterministic pre-salting when the hot keys are known.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: partial agg on (keys, salt) then final agg
    on keys. The salt spreads a hot group over ``salt_buckets`` reducers;
    correctness requires the supplied aggregates to be decomposable the
    same way twice (sum/count/min/max — pass the *partial* form and the
    re-combining form is inferred for these).

    ``aggs`` maps output column name -> partial aggregate expression.
    The recombine step applies: sum→sum, count→sum, min→min, max→max,
    determined by the expression's leading function name.
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_buckets))
        if salt_source
        else F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    )
    partial_cols = {name: expr.alias(name) for name, expr in aggs.items()}
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_cols.values())

    def recombine(name: str, expr: Column) -> Column:
        fn = expr._jc.toString().split("(", 1)[0].lower()
        if fn.startswith("min"):
            return F.min(name).alias(name)
        if fn.startswith("max"):
            return F.max(name).alias(name)
        # sum and count both recombine by summing partials
        return F.sum(name).alias(name)

    return partial.groupBy(*keys).agg(*[recombine(n, e) for n, e in aggs.items()])


def replicated_broadcast_join(big: DataFrame, small: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """Skew-proof equi-join: salt the big side deterministically, explode
    the (broadcastable) small side across all salt values, join on
    (key, salt). Every hot key spreads over ``salt_buckets`` tasks.
    """
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)))
    small_s = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    return big_s.join(F.broadcast(small_s), on=[key, "_salt"]).drop("_salt")
