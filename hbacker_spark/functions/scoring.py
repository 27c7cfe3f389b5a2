"""Model-based quality scoring as batch inference (VERDICT r7 #8).

The production shape this mirrors: a FastText/logistic quality
classifier trained offline, shipped as a weight vector, applied to every
document of a 100 TB corpus as a batch-inference gate. Spark-first
design decisions:

- weights are PLAN LITERALS (closure constants), not a model file or
  driver-side state — nothing to broadcast, nothing to version-skew;
- features are computed JVM-side (codegen'd split/filter/length
  expressions — see the registered query), so Python sees only k narrow
  double columns;
- the affine map runs as an Arrow-batched pandas_udf — the vectorized
  slow-path idiom, never row-at-a-time;
- the margin is evaluated LEFT TO RIGHT in float64, the same IEEE
  addition order as the SQL affine form, so a DuckDB oracle replays the
  score bit-for-bit — the classifier is value-checked, not just
  shape-checked. (exp()/sigmoid is deliberately NOT applied: libm ulps
  differ across engines; the margin's sign IS the decision, and any
  monotone calibration can be applied downstream.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def affine_margin_pandas(weights: tuple[float, ...], bias: float):
    """Arrow-batched affine scorer: margin = (((bias + w1*f1) + w2*f2) + ...).

    Returns a pandas_udf over len(weights) double feature columns. Each
    step is an elementwise float64 multiply-then-add in ascending weight
    order — bit-identical to the parenthesized SQL form
    ``((((CAST(b AS DOUBLE) + CAST(w1 AS DOUBLE) * f1) + ...)``.
    """
    ws = tuple(float(w) for w in weights)
    b = float(bias)

    @F.pandas_udf("double")
    def margin(*feats: pd.Series) -> pd.Series:
        n = len(feats[0])
        acc = np.full(n, b, dtype="float64")
        for w, f in zip(ws, feats):
            acc = acc + w * f.to_numpy(dtype="float64")
        return pd.Series(acc)

    return margin


def sql_affine_margin(weights: tuple[float, ...], bias: float, feats: tuple[str, ...]) -> str:
    """The DuckDB mirror of :func:`affine_margin_pandas` — every literal
    wrapped in CAST(... AS DOUBLE) (DuckDB parses bare float literals as
    DECIMAL, whose arithmetic would not match float64)."""
    expr = f"CAST({bias} AS DOUBLE)"
    for w, f in zip(weights, feats):
        # feature expressions are parenthesized: an unparenthesized
        # `w * a / b` would associate as `(w*a)/b` — same real value,
        # DIFFERENT float64 bits than the engine's `w * (a/b)`
        expr = f"({expr} + CAST({w} AS DOUBLE) * ({f}))"
    return expr


# ---------------------------------------------------------------------------
# The frozen production classifier (fit offline against the repo's
# heuristic quality gate — see queries/llm_pipeline.py for the fit
# notes and agreement measurements) and its shared scoring chain. ONE
# definition, TWO execution modes: the registered batch query
# (quality_classifier_scores) and the streaming ingest gate
# (streaming/quality.py + stream_quality_gate_rates) build the exact
# same expressions, so stream==batch is a property of construction and
# the pytest pin is a regression tripwire, not a tolerance band.
# Feature order: (n_words/100, stopword_ratio, distinct_word_ratio,
# mean_word_len/10).
# ---------------------------------------------------------------------------

QC_WEIGHTS = (-0.262, 150.217, -1.089, -12.665)
QC_BIAS = -1.034


def qc_feats_sql(stopword_count_sql: str) -> tuple[str, ...]:
    """The DuckDB feature mirror (parenthesized — see sql_affine_margin)."""
    return (
        "CAST(len(string_split(text, ' ')) AS DOUBLE) / CAST(100.0 AS DOUBLE)",
        f"CAST({stopword_count_sql} AS DOUBLE) / len(string_split(text, ' '))",
        "CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' '))",
        "(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)"
        " / len(string_split(text, ' '))) / CAST(10.0 AS DOUBLE)",
    )


def quality_gate_scored(df, keep_cols: tuple[str, ...] = ("doc_id",)):
    """(keep_cols..., margin_micro, keep) over a documents-shaped frame
    (needs a ``text`` column). Stateless projection + Arrow margin —
    legal verbatim under Structured Streaming, which is the point: the
    gate RUNS IN INGEST with zero state. margin_micro is the
    floor-quantized micro-margin (floor(m*1e6): two IEEE-exact ops;
    decimal round() is not engine-portable at scaled-.5 boundaries)."""
    from pyspark.sql import functions as F

    from hbacker_spark.functions import text as TX

    nw = TX.n_words()
    feats = df.select(
        *keep_cols,
        (nw.cast("double") / F.lit(100.0)).alias("f_nw"),
        (TX.stopword_count().cast("double") / nw).alias("f_swr"),
        (F.size(F.array_distinct(F.split("text", " "))).cast("double") / nw).alias("f_dwr"),
        (
            ((F.length("text") - (nw - F.lit(1))).cast("double") / nw) / F.lit(10.0)
        ).alias("f_mwl"),
    )
    margin = affine_margin_pandas(QC_WEIGHTS, QC_BIAS)
    scored = feats.withColumn("_m", margin("f_nw", "f_swr", "f_dwr", "f_mwl"))
    return scored.select(
        *keep_cols,
        F.floor(F.col("_m") * F.lit(1000000.0)).cast("bigint").alias("margin_micro"),
        (F.col("_m") > F.lit(0.0)).alias("keep"),
    )


def quality_gate_rates(df):
    """Per-source ingest monitoring aggregate over the gate: (source,
    n_docs, n_keep, keep_rate). In streaming this is the update/complete
    -mode dashboard aggregate a foreachBatch-free ingest pipeline
    maintains; keep_rate is an exact-int IEEE division, so DuckDB
    reproduces the double bit-for-bit."""
    from pyspark.sql import functions as F

    scored = quality_gate_scored(df, keep_cols=("doc_id", "source"))
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("bigint").alias("n_keep"),
        (
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("keep_rate"),
    )
