"""Streaming ingest form of the model-based quality gate (VERDICT r8 #7).

The batch classifier (functions/scoring.py: frozen logistic weights as
plan literals, Arrow-batched affine margin) is a stateless projection —
exactly the shape Structured Streaming runs unchanged. This module
supplies the stream source reader; the SCORING CHAIN ITSELF is the same
``quality_gate_scored`` / ``quality_gate_rates`` definitions the
registered batch queries use, so "gates run in ingest" is a property of
construction: one definition, two execution modes, stream==batch pinned
in tests/test_streaming.py (same contract as the dedup/CMS incremental
instantiations).

At 100 TB-scale ingest this is the cheapest possible gate placement:
zero state, zero shuffle for the per-doc scores (the per-source rate
aggregate carries |sources| rows of state), and no model file to
distribute — the weights ride in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# documents-table schema (TESTDATA.md); nullable everywhere like the
# parquet files themselves
DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def read_documents_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a directory of documents parquet — the
    test/ingest analog of a landing zone; one file per micro-batch by
    default so multi-batch behavior is actually exercised."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
