"""Invariants for the round-6 curation closure queries.

Oracle parity (value-hash vs DuckDB) is swept by test_oracle_parity.py;
these tests pin the SEMANTIC invariants a hash can't state — retention
bounds, distance-metric ranges, and partitioning independence of the
DECIMAL-accumulated divergence sums (the property the order-independent
accumulation design exists to guarantee).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hbacker_spark.queries.llm_pipeline import (
    chunk_dedup_retention,
    source_divergence_stats,
)


def test_chunk_dedup_retention_bounds(spark, sf_dir):
    rows = chunk_dedup_retention(spark, sf_dir).collect()
    assert rows, "every doc must report"
    total_chunks = sum(r.n_chunks for r in rows)
    total_kept = sum(r.kept_chunks for r in rows)
    for r in rows:
        assert 0 <= r.kept_chunks <= r.n_chunks
        assert r.heavy_dup == (r.kept_chunks * 5 < r.n_chunks * 4)
        # a doc's own first chunk always survives unless a previous doc
        # already emitted it, so kept_chars is 0 only if kept_chunks is
        assert (r.kept_chars == 0) == (r.kept_chunks == 0)
    # first-occurrence-wins keeps EXACTLY one occurrence per distinct
    # chunk: corpus-wide kept == number of distinct chunk strings
    from hbacker_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    chunks = d.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(split(text, ' ')) - 1, 8), "
                "s -> concat_ws(' ', slice(split(text, ' '), s + 1, 8)))"
            )
        ).alias("chunk")
    )
    n_distinct = chunks.select("chunk").distinct().count()
    assert total_kept == n_distinct
    assert total_kept <= total_chunks


def test_source_divergence_ranges_and_partitioning_invariance(spark, sf_dir):
    df = source_divergence_stats(spark, sf_dir)
    rows = {r.source: r for r in df.collect()}
    assert rows
    for r in rows.values():
        # TV distance is a metric on [0, 1]; chi-square divergence >= 0
        assert 0.0 <= r.tv_distance <= 1.0
        assert r.chi2_divergence >= 0.0
        assert r.n_distinct_tokens <= r.n_tokens
    # the DECIMAL(38,12) term accumulation is order-independent by
    # construction: a different input split must reproduce every value
    # bit-for-bit (the float-sum ordering trap this design removes)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        rows3 = {r.source: r for r in source_divergence_stats(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert rows.keys() == rows3.keys()
    for s, r in rows.items():
        assert (r.chi2_divergence, r.tv_distance, r.n_tokens) == (
            rows3[s].chi2_divergence,
            rows3[s].tv_distance,
            rows3[s].n_tokens,
        )


def test_portable_hll_accuracy_and_merge(spark, sf_dir):
    """The portable HLL (functions/hll.py) is hash-oracled for
    DETERMINISM; this pins the two properties the hash can't see:
    (1) accuracy — every per-type estimate and the 'ALL' rollup are
    within 3 sigma (19.5% at m=256; measured ~4%) of exact distinct;
    (2) mergeability — registers built over arbitrary batch splits,
    merged by bucket-wise max, equal the full-corpus registers exactly
    (the sketch algebra that makes it a one-pass 100 TB operator)."""
    from hbacker_spark.functions import hll as H
    from hbacker_spark.registry import load_all_queries
    from hbacker_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    exact["ALL"] = e.select("user_id").distinct().count()
    est = load_all_queries()["hll_portable_distinct_users"].fn(spark, sf_dir).collect()
    assert len(est) == len(exact)
    for r in est:
        rel = abs(r["est_users"] - exact[r["event_type"]]) / exact[r["event_type"]]
        assert rel < 0.195, (r["event_type"], r["est_users"], exact[r["event_type"]])

    # merge property: batch-split registers fold to the full registers
    bucket = F.pmod(F.xxhash64("user_id", F.lit(7)), F.lit(3))
    parts = [H.registers(e.filter(bucket == i), ["event_type"], "user_id") for i in range(3)]
    folded = (
        parts[0]
        .unionByName(parts[1])
        .unionByName(parts[2])
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    full = H.registers(e, ["event_type"], "user_id")
    assert sorted(map(tuple, folded.collect())) == sorted(map(tuple, full.collect()))


def test_quantile_histogram_sketch_accuracy_and_merge(spark, sf_dir):
    """The histogram quantile sketch is hash-oracled for determinism;
    this pins what the hash can't see: (1) every estimate is within
    one bin width (500) of the exact quantile — the sketch's error
    contract; (2) per-bin counts fold across batch splits by plain
    addition (the merge algebra that makes it a one-pass operator)."""
    from hbacker_spark.registry import load_all_queries
    from hbacker_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    qs = [0.25, 0.5, 0.75, 0.9, 0.99]
    est = {
        r["q"]: r["est_totalprice"]
        for r in load_all_queries()["quantile_histogram_sketch"].fn(spark, sf_dir).collect()
    }
    exact = o.approxQuantile("o_totalprice", qs, 0.0)  # relativeError=0 => exact
    for q, e in zip(qs, exact):
        assert abs(est[q] - e) <= 500.0, (q, est[q], e)

    bin_expr = F.least(
        F.lit(999),
        F.greatest(
            F.lit(0), F.floor(F.col("o_totalprice").cast("double") / F.lit(500.0)).cast("int")
        ),
    )
    full = {
        r["bin"]: r["cnt"]
        for r in o.groupBy(bin_expr.alias("bin")).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    bucket = F.pmod(F.xxhash64("o_orderkey", F.lit(3)), F.lit(2))
    folded: dict[int, int] = {}
    for i in range(2):
        part = (
            o.filter(bucket == i)
            .groupBy(bin_expr.alias("bin"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        for r in part.collect():
            folded[r["bin"]] = folded.get(r["bin"], 0) + r["cnt"]
    assert folded == full


def test_quality_classifier_distills_heuristic_gate(spark, sf_dir):
    """VERDICT r7 #8 accuracy pin: the frozen-weight linear scorer must
    agree with the heuristic gate it was fit against (n_words 10..500,
    n_chars >= 50, stopword_ratio >= 0.05, not Gopher-repetitive) on
    >= 95% of docs, with BOTH classes non-degenerate. Measured at fit
    time: 0.982 (sf0.01), 0.971 (sf0.1), 0.976 (sf0.001)."""
    from hbacker_spark.functions import text as TX
    from hbacker_spark.queries.llm_pipeline import quality_classifier_scores
    from hbacker_spark.sources.tables import load_table

    pred = {r["doc_id"]: r["keep"] for r in quality_classifier_scores(spark, sf_dir).collect()}

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    rep = tf.groupBy("doc_id").agg(
        (F.max("tf") * 5 >= F.sum("tf")).alias("repetitive")
    )
    nw = TX.n_words()
    gate = {
        r["doc_id"]: r["y"]
        for r in d.join(rep, "doc_id")
        .select(
            "doc_id",
            (
                nw.between(10, 500)
                & (F.col("n_chars") >= 50)
                & (TX.stopword_count().cast("double") / nw >= 0.05)
                & ~F.col("repetitive")
            ).alias("y"),
        )
        .collect()
    }
    assert set(pred) == set(gate)
    agree = sum(pred[k] == gate[k] for k in pred) / len(pred)
    assert agree >= 0.95, f"classifier/gate agreement {agree}"
    # non-degenerate: a scorer that answers one class for everything
    # can look accurate on a skewed corpus — require a real split
    pos = sum(pred.values()) / len(pred)
    assert 0.2 <= pos <= 0.9, f"degenerate keep rate {pos}"
