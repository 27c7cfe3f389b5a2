"""Plan-quality gates: the properties that decide 100 TB viability,
asserted on the actual physical plans (not vibes).

If one of these breaks, a code change silently de-optimized a scan or
join — treat as a perf regression even though results stay correct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hbacker_spark.plans import explain as X
from hbacker_spark.registry import load_all_queries
from hbacker_spark.sources.tables import load_table

SPECS = load_all_queries()


def test_q6_filters_push_to_parquet(spark, sf_dir):
    df = SPECS["q6_forecast_revenue"].fn(spark, sf_dir)
    plan = X.explain_str(df)
    assert "PushedFilters" in plan
    # at least the range predicates reach the scan
    assert any(
        "l_shipdate" in line and "PushedFilters" in line for line in plan.splitlines()
    ), plan


def test_q6_prunes_columns(spark, sf_dir):
    df = SPECS["q6_forecast_revenue"].fn(spark, sf_dir)
    cols = X.read_schema_columns(df)
    assert "l_comment" not in cols  # nonexistent anyway, but the real check:
    assert cols <= {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}, cols


def test_like_filter_pushdown(spark, sf_dir):
    df = SPECS["filter_like_in_between"].fn(spark, sf_dir)
    plan = X.explain_str(df)
    assert "PushedFilters" in plan and "StringContains" in plan, plan


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    """q5's full shape, pinned exactly (VERDICT r4 #4: its bench blip
    was first-pass broadcast warmup — this assertion is what would
    actually catch a plan regression): every dimension side broadcasts,
    zero sort-merge joins, zero cartesians."""
    df = SPECS["q5_local_supplier_volume"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 5, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan


def test_topk_window_gets_group_limit(spark, sf_dir):
    df = SPECS["topk_orders_per_customer"].fn(spark, sf_dir)
    assert X.has_window_group_limit(df), X.explain_str(df)
    # the hbacker version-limit scan is the same shape
    df2 = SPECS["s1_version_limited_scan"].fn(spark, sf_dir)
    assert X.has_window_group_limit(df2)


def test_aggregates_are_codegen(spark, sf_dir):
    # AQE's plan wrapper reports 0 codegen subtrees pre-execution; build
    # the static plan to compile-check codegen coverage.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = SPECS["q1_pricing_summary"].fn(spark, sf_dir)
        assert X.codegen_stage_count(df) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    plan = X.explain_str(df)
    assert "HashAggregate" in plan  # partial+final hash agg, not sort-based


def test_semi_anti_stay_joins_not_subqueries(spark, sf_dir):
    for name in ("semi_customers_with_events", "anti_customers_without_events"):
        plan = X.explain_str(SPECS[name].fn(spark, sf_dir))
        assert "LeftSemi" in plan or "LeftAnti" in plan, plan


def test_salted_agg_equals_plain(spark, sf_dir):
    from hbacker_spark.operators.skew import salted_agg

    l = load_table(spark, sf_dir, "lineitem")
    plain = {
        tuple(r)[:1]: tuple(r)[1:]
        for r in l.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("q"),
            F.count(F.lit(1)).alias("n"),
            F.max("l_shipdate").alias("mx"),
        )
        .collect()
    }
    salted = {
        tuple(r)[:1]: tuple(r)[1:]
        for r in salted_agg(
            l,
            ["l_returnflag"],
            {
                "q": F.sum(F.col("l_quantity").cast("decimal(12,2)")),
                "n": F.count(F.lit(1)),
                "mx": F.max("l_shipdate"),
            },
            salt_buckets=8,
            salt_source="l_orderkey",
        ).collect()
    }
    assert plain == salted


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """Bucketing both sides on the join key co-locates matching rows:
    the join plans with zero Exchange operators — at 100 TB this is the
    difference between a terabyte shuffle and none."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    (
        orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").format("parquet").saveAsTable("b_orders")
    )
    (
        cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").format("parquet").saveAsTable("b_customer")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_customer"), F.col("o_custkey") == F.col("c_custkey")
        )
        plan = X.explain_str(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_replicated_broadcast_join_equals_plain(spark, sf_dir):
    from hbacker_spark.operators.skew import replicated_broadcast_join

    o = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    c = load_table(spark, sf_dir, "customer")
    plain = o.join(c, "c_custkey").groupBy("c_mktsegment").count()
    salted = replicated_broadcast_join(o, c, "c_custkey", salt_buckets=4).groupBy("c_mktsegment").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_topk_similarity_is_take_ordered_not_global_window(spark, sf_dir):
    """Top-k similarity must compile to TakeOrderedAndProject (distributed
    per-partition partial top-k + k-row merge), never rank the full scored
    corpus through a single-reducer global Window (VERDICT r1 #4). The rnk
    re-derivation window runs over just the k collected rows, so any
    Window node must sit strictly ABOVE the TakeOrdered/limit."""
    for name in ("knn_cosine_top10", "ann_lsh_cosine_topk", "ann_ivf_cosine_topk"):
        plan = X.explain_str(SPECS[name].fn(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, f"{name}: no TakeOrderedAndProject\n{plan}"
        # the global-sort operator for the full corpus must not appear
        # below the limit: a Sort node outside the TakeOrdered rewrite
        # would mean a whole-corpus global sort survived
        lines = plan.splitlines()
        take_idx = min(i for i, l in enumerate(lines) if "TakeOrderedAndProject" in l)
        window_lines = [i for i, l in enumerate(lines) if l.strip().startswith(("Window", "* Window"))]
        assert all(i < take_idx for i in window_lines), (
            f"{name}: Window below TakeOrderedAndProject (full-corpus rank)\n{plan}"
        )


def test_embedding_pairs_plan_has_no_full_corpus_broadcast(spark, sf_dir):
    """embedding_near_dup_pairs must be the symmetric block-matrix plan
    (VERDICT r2 #3): one shuffle assembling bounded two-block combos —
    NO broadcast side carrying the whole corpus, no join at all, and no
    driver toPandas round-trip. Per-task memory is then O(2·n/n_blocks·d)
    instead of O(n·d), which is what survives a 100x scale-up."""
    plan = X.explain_str(SPECS["embedding_near_dup_pairs"].fn(spark, sf_dir))
    assert "BroadcastExchange" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "MapInPandas" in plan, plan
    # exactly one corpus-wide exchange: the combo-assembly groupBy
    n_exchanges = sum(
        1 for l in plan.splitlines() if l.strip().startswith(("Exchange", "+- Exchange"))
        or "Exchange hashpartitioning" in l
    )
    assert n_exchanges <= 2, plan  # combo shuffle (+ AQE wrapper variance)


def test_q19_disjunction_pushes_side_local_conjuncts(spark, sf_dir):
    """OR-of-ANDs across both join sides: Catalyst must CNF-extract the
    side-local disjuncts and push them into BOTH parquet scans — the
    quantity envelope to lineitem, the brand/size envelope to part."""
    plan = X.explain_str(SPECS["q19_disjunctive_revenue"].fn(spark, sf_dir))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_quantity" in l for l in pushed), plan
    assert any("p_brand" in l or "p_size" in l for l in pushed), plan


def test_tpch_topk_compile_to_take_ordered(spark, sf_dir):
    """Q10/Q18/Q21-style deterministic top-k must be distributed partial
    top-k (TakeOrderedAndProject), never a global sort or a
    single-partition rank window."""
    for name in ("q10_returned_items", "q18_large_volume_customers", "q21_sole_returner"):
        plan = X.explain_str(SPECS[name].fn(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, f"{name}:\n{plan}"


def test_exists_patterns_stay_semi_anti_joins(spark, sf_dir):
    """EXISTS / NOT EXISTS / IN subqueries must plan as semi/anti hash
    joins (decorrelated), not nested-loop or cartesian shapes."""
    for name, frag in (
        ("q4_priority_exists", "LeftSemi"),
        ("q20_part_supply_chain", "LeftSemi"),
        ("q22_idle_rich_customers", "LeftAnti"),
    ):
        plan = X.explain_str(SPECS[name].fn(spark, sf_dir))
        assert frag in plan, f"{name}: expected {frag}\n{plan}"
        assert "CartesianProduct" not in plan.replace(
            "BroadcastNestedLoopJoin BuildRight, Inner", ""
        ), f"{name}: cartesian residual\n{plan}"


def test_copurchase_pairs_subplan_is_reused(spark):
    """The degree computation references the edge relation twice; the
    physical plan must reuse one exchange, not rebuild the self-join.
    ReusedExchange only materializes in the POST-EXECUTION AQE plan (and
    only when the input is big enough that AQE doesn't broadcast the
    whole subplan), so run at sf0.1 and collect first."""
    from hbacker_spark.queries.graph import copurchase_degree_distribution

    df = copurchase_degree_distribution(spark, "/root/testdata/sf0.1")
    df.collect()
    plan = X.executed_plan_str(df)
    assert "ReusedExchange" in plan, plan


def test_bfs_frontier_joins_are_hash_not_cartesian(spark, sf_dir, monkeypatch):
    # r13: pin the DISTRIBUTED loop's shape — the driver-local fast
    # path (gated on edge count) would otherwise satisfy this trivially
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_LOCAL_EDGES", "0")
    plan = X.explain_str(SPECS["copurchase_bfs_reachable"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_bfs_lineage_is_checkpointed_not_replayed(spark, sf_dir, monkeypatch):
    """VERDICT r3 #2: the unrolled BFS must NOT re-reference the
    lineitem self-join per frontier round. With edges + each round's
    frontier localCheckpoint'ed, the final plan reads only materialized
    RDDs — zero parquet scans and zero joins of the pair build remain
    in the visited-union plan (they ran exactly once, eagerly, inside
    the builder). r13: force the distributed loop — the driver-local
    fast path would satisfy this trivially."""
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_LOCAL_EDGES", "0")
    df = SPECS["copurchase_bfs_reachable"].fn(spark, sf_dir)
    plan = X.explain_str(df)
    assert "Scan parquet" not in plan, plan
    # the pair build's order-key self-join must not survive into the
    # unrolled plan (each round joins checkpointed scans only)
    assert "SortMergeJoin" not in plan, plan


def test_q2_q13_q16_pattern_shapes(spark, sf_dir):
    """The round-3 TPC-H closure analogs must keep their load-bearing
    shapes: Q2's top-100 is distributed (TakeOrderedAndProject), Q13
    keeps the LEFT OUTER join (zero-order customers must survive), and
    Q16's NOT IN compiles to a left_anti hash join, never a cartesian."""
    plan = X.explain_str(SPECS["q2_min_cost_supplier"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    plan = X.explain_str(SPECS["q13_customer_order_distribution"].fn(spark, sf_dir))
    assert "LeftOuter" in plan, plan
    plan = X.explain_str(SPECS["q16_supplier_count_by_part"].fn(spark, sf_dir))
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_containment_and_gate_shapes(spark, sf_dir):
    """fingerprint_containment_pairs must stay on the single-scan
    inverted-index shape (no cartesian, no broadcast of the corpus);
    adaptive_length_gate_per_lang must broadcast the tiny per-lang
    bounds side, not shuffle the corpus twice for it."""
    plan = X.explain_str(SPECS["fingerprint_containment_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    plan = X.explain_str(SPECS["adaptive_length_gate_per_lang"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_variant_and_range_frame_shapes(spark, sf_dir):
    """VARIANT extraction must not fall back to a Python UDF (the
    parse_json/variant_get pipeline is JVM-side), and the trailing
    30-minute window must plan a RANGE frame (value-based bounds), not
    a ROWS frame."""
    plan = X.explain_str(SPECS["variant_props_k_stats"].fn(spark, sf_dir))
    assert "Python" not in plan, plan
    assert "variant" in plan.lower() or "parse_json" in plan.lower(), plan
    plan = X.explain_str(SPECS["events_trailing_30min_window"].fn(spark, sf_dir))
    assert "RANGE BETWEEN" in plan or "RangeFrame" in plan, plan


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """Partitioned fact + filtered dim join must plan a dynamicpruning
    subquery on the partition column — at 100 TB this is the difference
    between scanning 3 partitions and scanning all of them when the
    pruning key only becomes known at runtime (via the dim filter)."""
    fact_path = str(tmp_path / "lineitem_part")
    load_table(spark, sf_dir, "lineitem").write.partitionBy("l_returnflag").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("R", "returned")], "flag string, label string"
    ).filter(F.col("label") == "returned")
    joined = fact.join(dim, fact.l_returnflag == dim.flag).groupBy("label").count()
    plan = X.explain_str(joined)
    assert "dynamicpruning" in plan.lower(), plan


# ---------------------------------------------------------------------------
# Registry-wide plan gate (VERDICT r3 #4): plan_audit.py reports; this FAILS.
# ---------------------------------------------------------------------------

# The deliberate row-at-a-time Python surfaces: the U2 reference-parity
# demo UDF and the lateral Python UDTF demo. Everything else must keep
# Python boundaries Arrow-batched.
_ROW_UDF_ALLOWED = {"udf_canonicalize_labels", "udtf_chunk_documents"}

# Queries whose BroadcastNestedLoopJoin is a SINGLE-ROW broadcast side by
# construction — a scalar subquery (1-row aggregate: q11's threshold,
# q22's average balance, tfidf/lift/waterfill corpus totals) or a 1-row
# query-vector literal (knn/ann rerank). A 1-row broadcast nested loop is
# a map-side constant join — scale-safe. Any OTHER query planning a BNLJ
# must be added here deliberately, with the same justification.
_SINGLE_ROW_BNLJ_ALLOWED = {
    "ann_ivf_cosine_topk",
    "ann_lsh_cosine_topk",
    "ann_multiprobe_cosine_topk",
    "ann_multiprobe2bit_cosine_topk",  # same 1-row query-vector broadcast
    "event_type_lift",
    # 1-row corpus-token-total aggregate broadcast (divergence complement)
    "source_divergence_stats",
    "knn_cosine_top10",
    "mixture_waterfill_allocation",
    "q11_revenue_concentration",
    "q22_idle_rich_customers",
    "tfidf_top_terms",
    "weighted_sample_pps",  # 1-row corpus-total aggregate broadcast
    "embedding_int8_quantize",  # 1-row per-dim min/max calibration broadcast
    # crossJoin of two literally-one-row relations: the limit(1)
    # state-metadata row x the global audit aggregate
    "streaming_state_audit",
    # aggregate-sized, not single-row: both inputs of the pair join are
    # per-event_type groupBy results, so the nested loop is bounded by
    # group cardinality² (types²), never by data volume
    "hll_audience_overlap",
    # same bound: the type<type pair join and the pair→register-row
    # OR-join both run over ≤ types × 256 register rows (sketch state),
    # never raw events
    "hll_portable_audience_overlap",
    # 1-row broadcast of the sorted per-source count array (the
    # closed-form interleave rank, VERDICT r4 #1 fix)
    "mixture_interleave",
    # 9-row decile-position broadcast against the distributed rank
    "orders_price_decile_boundaries",
    # 1-row max-source-mass budget broadcast into the repeat factors
    "mixture_repeat_upsample",
    # 1-row total + a 5x<=1000 rank lookup over SKETCH state, never data
    "quantile_histogram_sketch",
}

# Queries allowed to compile a Window with an EMPTY partition spec
# (VERDICT r4 #2: an unpartitioned window is an Exchange SinglePartition
# + sort — a single reducer — so every occurrence must be over a
# relation whose size is CONSTANT in data volume, and justified here).
# The distributed alternative for anything data- or dimension-sized is
# operators/rank.py (range-partition + local rank + P-row offsets).
_GLOBAL_WINDOW_ALLOWED = {
    # rank-after-limit: the window input is the k-row top-k result
    "ann_ivf_cosine_topk": "ranks the k-row top-k output",
    "ann_lsh_cosine_topk": "ranks the k-row top-k output",
    "ann_multiprobe_cosine_topk": "ranks the k-row top-k output",
    "ann_multiprobe2bit_cosine_topk": "ranks the k-row top-k output",
    "knn_cosine_top10": "ranks the k-row top-k output",
    "cms_heavy_hitters": "ranks the CMS_TOPK-row result",
    # bounded-domain post-agg spines: cardinality is the key DOMAIN
    # (hours/months/sources/event-type triples), not the data volume
    "cumulative_new_users_hourly": "per-hour spine (~9k rows/year)",
    "orders_open_backlog_monthly": "per-month spine",
    "mixture_waterfill_allocation": "per-source caps (sources-sized)",
    "top_event_paths_3step": "per-(type,type,type) path counts, domain^3",
    # operators/rank.py offsets relation: <= spark.sql.shuffle.partitions
    # rows by construction (the two-phase distributed rank)
    "gini_part_revenue": "P-row bucket-offset relation",
    "orders_rfm_segments": "P-row bucket-offset relation",
    "pareto_customers_for_80pct": "P-row bucket-offset relation",
    "orders_median_price_distributed": "P-row bucket-offset relation",
    "orders_price_decile_boundaries": "P-row bucket-offset relation",
    "nucleus_docs_global": "P-row bucket-offset relation",
    "quality_percent_rank_global": "P-row bucket-offset relation",
    "epoch_shuffle_order": "P-row bucket-offset relation",
    # <=1000-row fixed-bin histogram relation (constant in data volume)
    "quantile_histogram_sketch": "BINS-row histogram cumulative sum",
}


def _empty_partition_window_args(plan: str) -> list[str]:
    """First arguments of windowspecdefinition(...) calls that start
    with a SORT expression — i.e. windows with no partition columns."""
    import re

    out = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        i, depth, arg = m.end(), 0, ""
        while i < len(plan):
            ch = plan[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                break
            arg += ch
            i += 1
        if " ASC NULLS" in arg or " DESC NULLS" in arg:
            out.append(arg.strip())
    return out


def test_plan_gate_sweep_all_registered_queries(spark, sf_dir):
    """Every registered query's compiled plan must satisfy the 100 TB
    invariants, swept automatically so a new query can't regress them
    silently (the hand-picked assertions above pin specific shapes):

    - no CartesianProduct, ever;
    - BroadcastNestedLoopJoin only in the explicit single-row-side
      allowlist (scalar subqueries and 1-row query-vector literals);
    - no row-at-a-time Python (BatchEvalPython) outside the one
      deliberate U2 demo;
    - no unpartitioned Window (a single-reducer global sort) outside
      the justified constant-cardinality allowlist (VERDICT r4 #2);
    - no un-reused repeated base-table scan: a relation scanned >4
      times in one plan with zero exchange reuse means an iterative
      builder forgot to checkpoint (this catches the r3 BFS lineage
      bug class automatically).
    """
    import re

    failures = []
    for name in sorted(SPECS):
        try:
            df = SPECS[name].fn(spark, sf_dir)
            plan = X.explain_str(df)
        except Exception as ex:  # noqa: BLE001 - report, don't abort sweep
            failures.append((name, f"plan build failed: {type(ex).__name__}: {ex}"))
            continue
        if "CartesianProduct" in plan:
            failures.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and name not in _SINGLE_ROW_BNLJ_ALLOWED:
            failures.append((name, "BroadcastNestedLoopJoin outside the single-row allowlist"))
        if "BatchEvalPython" in plan and name not in _ROW_UDF_ALLOWED:
            failures.append((name, "row-at-a-time Python UDF in plan"))
        if name not in _GLOBAL_WINDOW_ALLOWED:
            for arg in _empty_partition_window_args(plan):
                failures.append(
                    (name, f"unpartitioned Window (single-reducer sort) over [{arg[:60]}]")
                )
        scans = re.findall(r"Scan parquet[^\n]*?([a-z_]+)\.parquet", plan)
        from collections import Counter

        for rel, cnt in Counter(scans).items():
            if cnt > 4 and "ReusedExchange" not in plan:
                failures.append((name, f"{rel} scanned {cnt}x with no exchange reuse"))
    assert not failures, "\n".join(f"{n}: {r}" for n, r in failures)
