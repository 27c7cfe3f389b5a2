"""Single-pass pipeline metrics via the Observation API.

A cleaning pipeline wants yield/rejection counters without re-running
the plan per metric. ``df.observe(Observation, exprs...)`` attaches
aggregates to the existing job: metrics materialize as a side effect of
whatever action executes the plan — zero extra scans, cluster-safe
(unlike accumulators, observed metrics are exactly-once per action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_corpus_quality(docs: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach corpus-quality metrics to a documents scan.

    Returns (df, observation); read ``observation.get`` AFTER an action
    on df. Metrics: n_docs, n_short (<50 chars), n_empty_lang,
    total_chars.
    """
    obs = Observation("corpus_quality")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_chars") < 50, 1).otherwise(0)).alias("n_short"),
        F.sum(F.when(F.col("lang").isNull() | (F.col("lang") == ""), 1).otherwise(0)).alias("n_empty_lang"),
        F.sum("n_chars").alias("total_chars"),
    )
    return observed, obs


def observe_filter_yield(df: DataFrame, predicate, name: str = "filter_yield") -> tuple[DataFrame, Observation]:
    """Filter with an attached input/output counter pair: measures the
    selectivity of a pipeline stage in the same pass that applies it."""
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.when(predicate, 1).otherwise(0)).alias("rows_kept"),
    ).filter(predicate)
    return observed, obs
