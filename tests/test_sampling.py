"""Sampling operators: determinism and stratum-size guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbacker_spark.registry import load_all_queries

SPECS = load_all_queries()


def test_hash_sample_fixed_size_and_deterministic(spark, sf_dir):
    fn = SPECS["hash_sample_per_source"].fn
    a = fn(spark, sf_dir)
    per_stratum = a.groupBy("source").count()
    assert per_stratum.filter(F.col("count") > 20).count() == 0
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert rows_a == rows_b
    # stable under repartitioning of the input (the property rand() lacks)
    from hbacker_spark.sources.tables import load_table
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").repartition(13)
    # same md5 ordering key as the registered query (oracled form)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42"))), F.col("doc_id")
    )
    again = (
        d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 20).select("doc_id", "source", "lang", "rn")
    )
    assert sorted(map(tuple, again.collect())) == rows_a


def test_stratified_sample_seed_deterministic(spark, sf_dir):
    fn = SPECS["stratified_sample_fractions"].fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b
    assert len(a) > 0
    # only requested strata appear
    langs = {t[1] for t in a}
    assert langs <= {"en", "es", "de", "fr", "zh"}
