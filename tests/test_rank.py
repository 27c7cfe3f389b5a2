"""Two-phase distributed rank vs the single-reducer global window.

The operator must be bit-identical to ``row_number()/sum() OVER
(ORDER BY ...)`` and ``ntile(k)`` for any tie-broken ordering,
independent of bucket count — including buckets > rows (empty range
partitions) and buckets = 1 (degenerate single bucket)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hbacker_spark.operators.rank import ntile_from_rank, with_global_order


def _sample(spark, n=97):
    # keys with heavy value ties so rank must lean on the tiebreak
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).alias("v"),
        ((F.col("id") * 37) % 11).cast("decimal(12,2)").alias("amt"),
    )


@pytest.mark.parametrize("buckets", [1, 4, 200])
def test_global_rank_and_running_sum_match_window(spark, buckets):
    df = _sample(spark)
    order = [F.col("v").desc(), F.col("id")]
    got = with_global_order(
        df, order, sums=[(F.col("amt"), "cum_amt")], rank_col="rnk",
        n_col="n", buckets=buckets,
    )
    w = Window.orderBy(F.col("v").desc(), "id")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    exp = df.select(
        "id",
        F.row_number().over(w).cast("bigint").alias("rnk"),
        F.sum("amt").over(wr).alias("cum_amt"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("amt").over(wall).alias("_total_cum_amt"),
    )
    g = {r["id"]: r for r in got.collect()}
    for r in exp.collect():
        q = g[r["id"]]
        assert q["rnk"] == r["rnk"], (r["id"], q["rnk"], r["rnk"])
        assert q["cum_amt"] == r["cum_amt"]
        assert q["n"] == r["n"] and q["_total_cum_amt"] == r["_total_cum_amt"]


@pytest.mark.parametrize("buckets", [1, 4, 200])
def test_rank_only_fast_path_matches_window(spark, buckets):
    """The no-sums path (r13: no per-bucket window — sortWithinPartitions
    + monotonically_increasing_id normalized through the offsets
    broadcast) must stay bit-identical to row_number() OVER (ORDER BY
    ...), including empty range partitions (buckets > rows) and the
    degenerate single bucket; and must really skip the per-bucket
    window (the second full-width exchange it would plan)."""
    df = _sample(spark)
    order = [F.col("v").desc(), F.col("id")]
    got = with_global_order(df, order, rank_col="rnk", n_col="n", buckets=buckets)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # attributes print with expr ids: the offsets window spells
    # `windowspecdefinition(_bkt#N ASC ...` (sort expr only); a
    # data-sized per-bucket window would PARTITION by it and spell
    # `windowspecdefinition(_bkt#N, <order cols>...` — that exact shape
    # is present in every sums-path plan and must be absent here.
    assert not re.search(
        r"windowspecdefinition\(_bkt#\d+,", plan
    ), "fast path not taken: per-bucket data window still planned"
    w = Window.orderBy(F.col("v").desc(), "id")
    exp = df.select(
        "id",
        F.row_number().over(w).cast("bigint").alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    g = {r["id"]: (r["rnk"], r["n"]) for r in got.collect()}
    e = {r["id"]: (r["rnk"], r["n"]) for r in exp.collect()}
    assert g == e


@pytest.mark.parametrize("n,k", [(97, 4), (8, 4), (3, 4), (100, 7), (1, 3)])
def test_ntile_closed_form_matches_window(spark, n, k):
    df = spark.range(n).select(F.col("id"), ((F.col("id") * 13) % 29).alias("v"))
    w = Window.orderBy("v", "id")
    exp = df.select("id", F.ntile(k).over(w).alias("t"))
    rank = F.row_number().over(w)  # window only to produce the rank input
    got = df.select("id", ntile_from_rank(rank, F.lit(n), k).alias("t"))
    assert {r["id"]: r["t"] for r in got.collect()} == {
        r["id"]: r["t"] for r in exp.collect()
    }


def test_no_unpartitioned_window_over_data(spark):
    """The only empty-partition Window in the compiled plan must be the
    P-row offsets relation (child = the per-bucket aggregate)."""
    df = _sample(spark, 50)
    got = with_global_order(df, [F.col("id")], rank_col="rnk", buckets=4)
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re
    empty_part_windows = [
        ln for ln in plan.splitlines()
        if re.search(r"\bWindow \[", ln)
        and "windowspecdefinition(_bkt" not in ln
    ]
    # every remaining global window line must be over the offsets agg
    # (its expressions reference _bn / _bs_ columns only)
    for ln in empty_part_windows:
        assert "_bn" in ln or "_bs_" in ln, ln


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(st.integers(min_value=-5, max_value=5), min_size=1, max_size=60),
    buckets=st.integers(min_value=1, max_value=9),
    k=st.integers(min_value=2, max_value=5),
)
def test_rank_operator_properties(spark, vals, buckets, k):
    """Property pin: for ANY value multiset (heavy ties by construction),
    bucket count, and tile count — global rank, inclusive running sum,
    total count, and closed-form ntile all equal the single-reducer
    window forms."""
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = with_global_order(
        df,
        [F.col("v").desc(), F.col("id")],
        sums=[(F.col("v"), "cum")],
        rank_col="rnk",
        n_col="n",
        buckets=buckets,
    )
    got = got.withColumn("t", ntile_from_rank(F.col("rnk"), F.col("n"), k))
    w = Window.orderBy(F.col("v").desc(), "id")
    exp = df.select(
        "id",
        F.row_number().over(w).cast("bigint").alias("rnk"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("cum"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.ntile(k).over(w).alias("t"),
    )
    g = {r["id"]: (r["rnk"], r["cum"], r["n"], r["t"]) for r in got.collect()}
    e = {r["id"]: (r["rnk"], r["cum"], r["n"], r["t"]) for r in exp.collect()}
    assert g == e


def test_rfm_quartiles_match_window_ntile(spark, sf_dir):
    """orders_rfm_segments chains three rank-only with_global_order
    calls (all on the r13 fast path: no per-bucket window) + the
    closed-form ntile arithmetic — pin the whole query bit-identical to
    the literal ntile(4) windows the oracle states, on real data. This
    is the fast path's chained real-data exercise: calls 2 and 3 rank a
    relation that already carries fast-path outputs."""
    from hbacker_spark.registry import load_all_queries

    got = load_all_queries()["orders_rfm_segments"].fn(spark, sf_dir)
    from hbacker_spark.queries._util import MONEY
    from hbacker_spark.sources.tables import load_table, ts_epoch_us

    base = load_table(spark, sf_dir, "orders")

    rfm = base.groupBy("o_custkey").agg(
        F.max(ts_epoch_us(base, "o_orderdate")).alias("recency_us"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round("o_totalprice", 2).cast(MONEY)).cast("double").alias("monetary"),
    )
    r = F.ntile(4).over(Window.orderBy(F.desc("recency_us"), "o_custkey"))
    f = F.ntile(4).over(Window.orderBy(F.desc("frequency"), "o_custkey"))
    m = F.ntile(4).over(Window.orderBy(F.desc("monetary"), "o_custkey"))
    exp = rfm.select(
        "o_custkey",
        "frequency",
        "monetary",
        r.alias("r_quartile"),
        f.alias("f_quartile"),
        m.alias("m_quartile"),
        (r * 100 + f * 10 + m).cast("int").alias("rfm_segment"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


RANK_ROUTED = [
    "gini_part_revenue",
    "pareto_customers_for_80pct",
    "orders_rfm_segments",
    "orders_median_price_distributed",
    "orders_price_decile_boundaries",
    "nucleus_docs_global",
    "quality_percent_rank_global",
    "mixture_interleave",
]


def test_rank_routed_queries_invariant_to_input_partitioning(spark, sf_dir):
    """End-to-end bucket-identity safety on the REAL queries: results
    must be identical when the parquet scan is forced into many tiny
    input splits (different range-sampler input → different bucket
    boundaries → same ranks). This is the metamorphic pin for the
    spark_partition_id + lazy-checkpoint design."""
    from hbacker_spark.registry import load_all_queries

    specs = load_all_queries()
    base = {}
    for name in RANK_ROUTED:
        base[name] = sorted(map(tuple, specs[name].fn(spark, sf_dir).collect()))
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
    try:
        for name in RANK_ROUTED:
            got = sorted(map(tuple, specs[name].fn(spark, sf_dir).collect()))
            assert got == base[name], f"{name} changed under tiny input splits"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_rank_blocks_released_after_action(spark):
    """Managed block lifecycle (VERDICT r5 #2): the lazy checkpoint that
    pins bucket identity is tracked, and release_rank_blocks() frees it
    from the block manager once the consuming action has run — so a
    long-lived session running many rank queries holds at most one
    query's range buckets. Also pins that a released relation can be
    rebuilt (a fresh call re-checkpoints and still answers)."""
    from hbacker_spark.operators.rank import (
        _PINNED,
        rank_scope,
        release_rank_blocks,
        with_global_order,
    )

    release_rank_blocks(spark)  # clean slate from other tests
    jsc = spark.sparkContext._jsc

    def persistent_ids():
        return set(jsc.getPersistentRDDs().keySet().toArray())

    before = persistent_ids()
    df = _sample(spark)
    got = with_global_order(df, [F.col("v").desc(), F.col("id")], rank_col="rnk")
    assert len(_PINNED) == 1  # checkpoint registered at plan time
    n_rows = got.count()  # materializes the pinned blocks
    assert n_rows == 97
    mid = persistent_ids()
    assert mid - before, "checkpoint RDD should be registered while pinned"
    released = release_rank_blocks(spark)
    assert released == 1 and not _PINNED
    assert persistent_ids() <= before, "released blocks must leave the block manager"

    # the scope form: consume inside, freed on exit; result still correct
    with rank_scope(spark):
        got2 = with_global_order(df, [F.col("v").desc(), F.col("id")], rank_col="rnk")
        top = got2.filter(F.col("rnk") == 1).collect()
        assert len(top) == 1 and top[0]["v"] == 6
    assert not _PINNED and persistent_ids() <= before
