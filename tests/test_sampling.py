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
    """r6 error-band form: (lang, exact n_rows, within_band). The
    fixed-seed draw is deterministic, only requested strata report,
    and every stratum's sampled count sits inside the 5-sigma binomial
    band the oracle states as its contract."""
    fn = SPECS["stratified_sample_fractions"].fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b
    assert len(a) > 0
    langs = {t[0] for t in a}
    assert langs <= {"en", "es", "de", "fr", "zh"}
    assert all(t[2] for t in a), a  # within_band holds per stratum


def test_weighted_sample_pps_unbiased_and_sized(spark, sf_dir):
    """Expected size ~= PPS_TARGET and the Horvitz-Thompson estimator
    of total chars reconstructs the true corpus total within the
    sampler's design variance."""
    from hbacker_spark.queries.llm_pipeline import PPS_TARGET
    from hbacker_spark.sources.tables import load_table

    out = SPECS["weighted_sample_pps"].fn(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    true_total = d.agg(F.sum("n_chars")).first()[0]
    n_docs = d.count()
    # sample size concentrates around the target (Poisson binomial;
    # generous 40% band — the draw is deterministic, not flaky)
    assert 0.6 * PPS_TARGET <= len(out) <= 1.4 * PPS_TARGET
    # HT estimate: sum over sample of w_i / p_i
    ht = sum(r["n_chars"] * r["ht_weight"] for r in out)
    assert abs(ht - true_total) / true_total < 0.25
    # inclusion probability must be proportional to weight (or capped)
    k = PPS_TARGET
    for r in out:
        expect = min(1.0, k * r["n_chars"] / true_total)
        assert abs(r["p_include"] - expect) < 1e-6
    assert len(out) < n_docs  # it is actually a sample


def test_weighted_sample_pps_stable_under_repartitioning(spark, sf_dir):
    """The PPS draw is a pure function of (doc_id, corpus total), so
    the selected set must not change with input partitioning — the
    property rand()-based samplers lack."""
    from pyspark.sql import functions as SF

    from hbacker_spark.queries.llm_pipeline import PPS_TARGET
    from hbacker_spark.sources.tables import load_table

    base = sorted(r["doc_id"] for r in SPECS["weighted_sample_pps"].fn(spark, sf_dir).collect())
    d = load_table(spark, sf_dir, "documents").repartition(13)
    tot = d.agg(SF.sum("n_chars").cast("bigint").alias("_w_tot"))
    u = (
        SF.conv(SF.substring(SF.md5(SF.col("doc_id").cast("string")), 1, 8), 16, 10).cast("double")
        + SF.lit(0.5)
    ) / SF.lit(4294967296.0)
    p = SF.least(
        SF.lit(1.0),
        SF.lit(float(PPS_TARGET)) * SF.col("n_chars").cast("double") / SF.col("_w_tot").cast("double"),
    )
    again = sorted(
        r["doc_id"]
        for r in d.crossJoin(SF.broadcast(tot)).filter(u < p).select("doc_id").collect()
    )
    assert again == base


def test_ewma_stays_within_frame_bounds(spark, sf_dir):
    """EWMA is a convex combination of in-frame values, so every output
    must lie within [min(frame), max(frame)] — a shape property that
    catches fold-order/seed bugs independent of the oracle."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as SF

    out = SPECS["ewma_user_value"].fn(spark, sf_dir)
    from hbacker_spark.queries.relational import EWMA_LOOKBACK
    from hbacker_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_LOOKBACK - 1), W.currentRow)
    )
    bounds = e.select(
        "event_id",
        SF.min("value").over(w).alias("lo"),
        SF.max("value").over(w).alias("hi"),
    )
    viol = (
        out.join(bounds, "event_id")
        .filter(
            (SF.col("ewma_value") < SF.round(SF.col("lo"), 6) - 1e-6)
            | (SF.col("ewma_value") > SF.round(SF.col("hi"), 6) + 1e-6)
        )
        .count()
    )
    assert viol == 0


def test_hll_distinct_users_accuracy_and_merge(spark, sf_dir):
    """The r6 error-band query self-reports the sketch contract: every
    row (per-type AND the '__all__' union rollup) lands within the 5%
    bound and carries the exact count the oracle can rebuild — the
    mergeability contract that makes sketches the scale path for
    distinct counting. Determinism: sketches are deterministic
    aggregates, not samples."""
    from hbacker_spark.sources.tables import load_table

    rows = {
        r["event_type"]: (r["exact_users"], r["within_rel_err"])
        for r in SPECS["hll_distinct_users"].fn(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    exact["__all__"] = e.agg(F.count_distinct("user_id")).first()[0]
    assert {k: v[0] for k, v in rows.items()} == exact
    assert all(v[1] for v in rows.values()), rows
    again = {
        r["event_type"]: (r["exact_users"], r["within_rel_err"])
        for r in SPECS["hll_distinct_users"].fn(spark, sf_dir).collect()
    }
    assert again == rows


def test_bloom_probe_superset_of_exact_contamination(spark, sf_dir):
    """Bloom membership can never miss a true hit: per doc,
    n_maybe_hits >= the exact twin's n_eval_hits, and the
    false-positive mass stays under 2% of clean shingles at this
    filter load (m=262144, k=3)."""
    exact = {
        r["doc_id"]: (r["n_shingles"], r["n_eval_hits"])
        for r in SPECS["contamination_ngram_overlap"].fn(spark, sf_dir).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_shingles"], r["n_maybe_hits"])
        for r in SPECS["bloom_decontamination_probe"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(bloom)
    fp = clean = 0
    for doc_id, (n_sh, n_exact) in exact.items():
        n_sh_b, n_maybe = bloom[doc_id]
        assert n_sh_b == n_sh
        assert n_maybe >= n_exact, f"false negative on doc {doc_id}"
        fp += n_maybe - n_exact
        clean += n_sh - n_exact
    assert clean > 0
    assert fp <= 0.02 * clean, f"FPR {fp}/{clean} exceeds 2%"


def test_hll_audience_overlap_accuracy(spark, sf_dir):
    """Inclusion-exclusion over HLL sketches tracks the exact pairwise
    audience intersections (lgConfigK=12 => ~2.3% per-estimate error;
    the difference compounds, so the bound here is 10% relative or a
    small absolute slack for tiny intersections)."""
    from hbacker_spark.sources.tables import load_table

    got = {
        (r["type_a"], r["type_b"]): (r["exact_common_users"], r["within_err"])
        for r in SPECS["hll_audience_overlap"].fn(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    a = e.toDF("type_a", "user_id")
    b = e.toDF("type_b", "user_id")
    exact = {
        (r["type_a"], r["type_b"]): r["n"]
        for r in a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {k: v[0] for k, v in got.items()} == exact
    for pair, (n_exact, ok) in got.items():
        assert ok, f"{pair}: estimate outside max(10% of {n_exact}, 25)"
