"""Query registry: every declared operator is a (spark_fn, oracle_sql) pair.

The driver contract (``__spark_entry__.py``) needs ``queries()`` and
``oracle_sql()`` dicts; modules under ``hbacker_spark.queries`` register
themselves here with the :func:`register` decorator. ``oracle=None`` would
mark a genuinely non-SQL-expressible op (the driver then records a weaker
rows-only check) — as of r7 every registered query carries a full value
oracle, so the escape hatch is currently unused.

Oracle-parity discipline (this is what makes the value-hash gate pass):

- alias EVERY computed column identically in Spark and SQL;
- money/ratio aggregates: cast inputs to DECIMAL first (exact,
  order-independent sums), cast the final aggregate to DOUBLE — both
  engines then produce bit-identical doubles;
- ranking: always break ties with a unique key so top-k is deterministic;
- timestamps: Spark session TZ pinned to UTC (session.py) = DuckDB naive.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered testdata views
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    import hbacker_spark.queries.graph  # noqa: F401
    import hbacker_spark.queries.hbacker_semantics  # noqa: F401
    import hbacker_spark.queries.llm_pipeline  # noqa: F401
    import hbacker_spark.queries.multimodal_udf  # noqa: F401
    import hbacker_spark.queries.relational  # noqa: F401
    import hbacker_spark.queries.streaming_shadow  # noqa: F401
    import hbacker_spark.queries.tpch_extra  # noqa: F401

    return REGISTRY
