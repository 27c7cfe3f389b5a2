from __future__ import annotations

from pyspark.sql import functions as F

from hbacker_spark.operators.observe import observe_corpus_quality, observe_filter_yield
from hbacker_spark.sources.tables import load_table


def test_corpus_quality_metrics_single_pass(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    observed, obs = observe_corpus_quality(docs)
    n = observed.count()  # one action → metrics materialize
    m = obs.get
    assert m["n_docs"] == n == docs.count()
    assert m["n_short"] == docs.filter(F.col("n_chars") < 50).count()
    assert m["n_empty_lang"] == 0
    assert m["total_chars"] == docs.agg(F.sum("n_chars")).first()[0]


def test_filter_yield_measures_selectivity(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    observed, obs = observe_filter_yield(docs, F.col("lang") == "en", "en_yield")
    kept = observed.count()
    m = obs.get
    assert m["rows_in"] == docs.count()
    assert m["rows_kept"] == kept == docs.filter(F.col("lang") == "en").count()
