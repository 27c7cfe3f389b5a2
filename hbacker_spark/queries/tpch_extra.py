"""TPC-H query-pattern closure (SURVEY.md §2.C rows 2-8, widened).

Round-1 shipped Q1/Q3/Q5/Q6 analogs; this module completes the TPC-H
query *patterns* — correlated EXISTS / NOT EXISTS, IN over a grouped
HAVING subquery, scalar-subquery thresholds, disjunctive (OR-of-ANDs)
predicates, conditional-aggregate shares — restated over the columns the
testdata actually has (no partsupp / shipmode / commitdate there, so
these are pattern-faithful analogs, not verbatim TPC-H).

Scale notes (100 TB discipline):
- every dimension side (part, supplier, nation, region, per-group agg of
  a dimension) is broadcast explicitly; fact-fact joins shuffle on the
  join key and AQE handles skew.
- correlated subqueries are written in their de-correlated form (the
  rewrite Catalyst itself performs): per-key aggregate + equi-join back.
  At 100 TB the aggregate side is orders of magnitude smaller than the
  fact table, so the join broadcasts or shuffles a small relation.
- EXISTS / NOT EXISTS / IN become left_semi / left_anti joins — no
  row-at-a-time subquery evaluation anywhere.
- decimal-exact money math per ``_util`` (order-independent partial
  aggregation ⇒ same bits on any executor count).

Reference parity: the reference's only query surface is catalog LIKE
scans (lib/hbacker/db.rb:74-86); this closure is the §2.C capability
widening, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbacker_spark.queries._util import MONEY, SQL_DISC_PRICE, disc_price, money
from hbacker_spark.registry import register
from hbacker_spark.sources.tables import load_table

_DISC = SQL_DISC_PRICE
_DISC_L = SQL_DISC_PRICE.replace("l_extendedprice", "l.l_extendedprice").replace(
    "l_discount", "l.l_discount"
)
_ZERO_DISC = "CAST(0 AS DECIMAL(18,4))"


@register(
    "q4_priority_exists",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    tags=("subquery", "semi", "tpch"),
    doc="TPC-H Q4 pattern: correlated EXISTS with a non-equi residual "
    "(late-shipped line), counted per order priority. Spark form: "
    "left_semi join on key + residual predicate — the EXISTS never "
    "materializes matches, and the semi join short-circuits per key.",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q7_nation_trade_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
           CAST(SUM({_DISC_L}) AS DOUBLE) AS revenue
    FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l.l_shipdate)
    """,
    tags=("join", "tpch"),
    doc="TPC-H Q7 pattern: bidirectional nation-pair trade volume by "
    "ship year. Both nation filters push below the fact joins "
    "(broadcast dim filter → fact rows drop before the shuffle).",
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = F.col("supp_nation").isin("NATION_1", "NATION_2") & F.col(
        "cust_nation"
    ).isin("NATION_1", "NATION_2") & (F.col("supp_nation") != F.col("cust_nation"))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(n).alias("n1"), s.s_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(n).alias("n2"), F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
            disc_price().alias("_vol"),
        )
        .filter(pair)
    )
    return joined.groupBy("supp_nation", "cust_nation", "l_year").agg(
        F.sum("_vol").cast("double").alias("revenue")
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           (CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE {_ZERO_DISC} END) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE)) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
             {_DISC_L} AS volume,
             n1.n_name AS nation
      FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        JOIN region r   ON n2.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    ) t
    GROUP BY o_year
    """,
    tags=("join", "aggregation", "tpch"),
    doc="TPC-H Q8 pattern: one nation's share of a region's market for a "
    "part type, per order year. Numerator and denominator are exact "
    "decimal sums cast to DOUBLE before the one division (both engines "
    "then divide identical bits).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nations = (
        c.select("c_custkey", "c_nationkey")
        .join(F.broadcast(n.select("n_nationkey", "n_regionkey")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.select("r_regionkey")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    vol = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_nations), o.o_custkey == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), l.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            disc_price().alias("volume"),
            "nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return vol.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(zero)).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
             {_DISC_L} - CAST(CAST(p.p_retailprice AS DECIMAL(12,2))
                              * CAST(l.l_quantity AS DECIMAL(12,2)) AS DECIMAL(18,4)) AS amount
      FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%gear%'
    ) t
    GROUP BY nation, o_year
    """,
    tags=("join", "aggregation", "tpch"),
    doc="TPC-H Q9 pattern: per-nation per-year profit on a part-name "
    "family (retailprice*qty stands in for supplycost — no partsupp in "
    "the testdata). LIKE filter prunes the broadcast part dim before "
    "the fact join.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    cost = (money("p_retailprice") * F.col("l_quantity").cast(MONEY)).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(p.select("p_partkey", "p_retailprice")), l.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), l.l_suppkey == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (disc_price() - cost).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, CAST(SUM({_DISC_L}) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY SUM({_DISC_L}) DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("join", "topk", "tpch"),
    doc="TPC-H Q10 pattern: top-20 customers by returned-item revenue in "
    "a quarter. Sort key is the exact decimal sum (not the double "
    "projection) with a unique tie-break — deterministic top-k on both "
    "engines; compiles to TakeOrderedAndProject.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    agg = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n.select("n_nationkey", "n_name")), c.c_nationkey == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(disc_price()).alias("_rev_dec"))
    )
    return (
        agg.orderBy(F.col("_rev_dec").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", F.col("_rev_dec").cast("double").alias("revenue"), "c_acctbal", "n_name")
    )


@register(
    "q11_revenue_concentration",
    oracle=f"""
    SELECT l_partkey, CAST(SUM({_DISC}) AS DOUBLE) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING CAST(SUM({_DISC}) AS DECIMAL(18,4))
           > CAST((SELECT CAST(SUM({_DISC}) AS DECIMAL(18,4)) FROM lineitem)
                  * CAST(0.0002 AS DECIMAL(6,4)) AS DECIMAL(24,8))
    """,
    tags=("subquery", "aggregation", "tpch"),
    doc="TPC-H Q11 pattern: parts whose revenue exceeds a fraction of the "
    "global total (HAVING vs scalar subquery). Spark form: per-part agg "
    "+ broadcast cross-join of the 1-row global total — one fact scan "
    "per aggregate, no correlated re-evaluation. Threshold compare is "
    "decimal-exact on both engines.",
)
def q11_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(F.sum(disc_price()).alias("_val"))
    total = l.agg(F.sum(disc_price()).cast("decimal(18,4)").alias("_total"))
    thresh = (F.col("_total") * F.lit(0.0002).cast("decimal(6,4)")).cast("decimal(24,8)")
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_val").cast("decimal(18,4)") > thresh)
        .select("l_partkey", F.col("_val").cast("double").alias("part_value"))
    )


@register(
    "q12_priority_shipmode",
    oracle="""
    SELECT l.l_linestatus,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    tags=("join", "aggregation", "tpch"),
    doc="TPC-H Q12 pattern: conditional counts (CASE-in-SUM) of "
    "high/low-priority orders per line status over a ship-year window "
    "(linestatus stands in for shipmode). Integer sums — exact on any "
    "partitioning.",
)
def q12_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT (CAST(100 AS DOUBLE)
            * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_DISC_L} ELSE {_ZERO_DISC} END) AS DOUBLE))
           / CAST(SUM({_DISC_L}) AS DOUBLE) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    tags=("join", "aggregation", "tpch"),
    doc="TPC-H Q14: promo part revenue share for one month. Single "
    "broadcast dim join + two exact decimal sums; the (100*num)/den "
    "double arithmetic is stated in the same order on both engines.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    promo = F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(zero)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                (F.lit(100).cast("double") * F.sum(promo).cast("double"))
                / F.sum(disc_price()).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, SUM({_DISC}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    tags=("subquery", "aggregation", "tpch"),
    doc="TPC-H Q15: supplier(s) achieving the maximum quarterly revenue "
    "(scalar-subquery MAX over a derived aggregate). Spark form reuses "
    "ONE per-supplier aggregate for both the max and the equality "
    "filter via a broadcast 1-row join; decimal equality is exact, so "
    "ties surface identically on both engines.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(disc_price()).alias("_rev")
    )
    mx = rev.agg(F.max("_rev").alias("_mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("_rev") == F.col("_mx"))
        .join(F.broadcast(s.select("s_suppkey", "s_name")), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("_rev").cast("double").alias("total_revenue"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN (SELECT l_partkey, COUNT(*) AS n_cnt,
                   SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_sum
            FROM lineitem GROUP BY l_partkey) a
        ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#5'
      AND CAST(l.l_quantity AS DECIMAL(12,2)) * CAST(2 AS DECIMAL(4,0)) * a.n_cnt < a.qty_sum
    """,
    tags=("subquery", "aggregation", "tpch"),
    doc="TPC-H Q17 pattern: revenue from brand lines below half their "
    "part's mean quantity. The correlated AVG is de-correlated to a "
    "per-part (count,sum) aggregate joined back; the half-mean test is "
    "cross-multiplied (2*qty*n < sum) so it stays decimal/integer "
    "exact — no floating avg() boundary flips.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    # r13: the per-part aggregate only ever feeds Brand#5 partkeys, so
    # pre-filter the fact with the broadcast semi-join BEFORE the agg
    # shuffle (guide §3.2) — per-part groups are intact (every lineitem
    # row of a surviving partkey survives), values unchanged; the agg
    # shuffle shrinks by the brand's selectivity (~1/25).
    lf = l.join(
        F.broadcast(p.select(F.col("p_partkey").alias("_fk"))),
        l.l_partkey == F.col("_fk"),
        "left_semi",
    )
    per_part = lf.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.count(F.lit(1)).alias("n_cnt"),
        F.sum(F.col("l_quantity").cast(MONEY)).alias("qty_sum"),
    )
    qty2 = F.col("l_quantity").cast(MONEY) * F.lit(2).cast("decimal(4,0)")
    return (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .join(per_part, l.l_partkey == F.col("_pk"))
        .filter(qty2 * F.col("n_cnt") < F.col("qty_sum"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > CAST(150 AS DECIMAL(12,2)))
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    tags=("subquery", "topk", "tpch"),
    doc="TPC-H Q18: large-volume customers — the grouped-HAVING subquery "
    "already computes the exact per-order quantity sum the SELECT "
    "re-aggregates, so the engine folds them: ONE lineitem aggregate "
    "produces both the >150 filter and total_qty (o_orderkey is the "
    "grouping key, so the outer GROUP BY is per-order by construction), "
    "then the few surviving orders join orders/customer. One fact scan "
    "and one fact shuffle instead of two of each; top-100 by totalprice "
    "with orderkey tie-break compiles to TakeOrderedAndProject.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(MONEY)).alias("_q"))
        .filter(F.col("_q") > F.lit(150).cast(MONEY))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_q").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_DISC_L}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#5'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "filter", "tpch"),
    doc="TPC-H Q19: disjunctive (OR-of-ANDs) predicate across both join "
    "sides. Catalyst CNF-converts the disjunction to push the "
    "side-local conjuncts (brand/size → part scan, quantity range → "
    "lineitem scan) below the join — the pushdown stress-test.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((p.p_brand == "Brand#5") & p.p_size.between(1, 15) & q.between(1, 11))
        | ((p.p_brand == "Brand#14") & p.p_size.between(1, 25) & q.between(10, 20))
        | ((p.p_brand == "Brand#20") & p.p_size.between(1, 35) & q.between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q20_part_supply_chain",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM(CAST(l.l_quantity AS DECIMAL(12,2))) > CAST(90 AS DECIMAL(12,2)))
    """,
    tags=("subquery", "semi", "tpch"),
    doc="TPC-H Q20 pattern: nested IN chain (suppliers ← heavy lines ← "
    "name-matched parts) as two stacked semi-joins over a grouped "
    "aggregate — no correlated execution; each IN level is one "
    "broadcast semi join.",
)
def q20_part_supply_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    heavy = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(MONEY)).alias("_q"))
        .filter(F.col("_q") > F.lit(90).cast(MONEY))
        .select("l_suppkey")
        .distinct()
    )
    return s.join(
        F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


@register(
    "q21_sole_returner",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
      JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY COUNT(*) DESC, s.s_name
    LIMIT 20
    """,
    tags=("subquery", "semi", "anti", "tpch"),
    doc="TPC-H Q21 pattern: the supplier solely responsible for returns "
    "in multi-supplier finished orders (EXISTS + NOT EXISTS over "
    "sibling lines). De-correlated form: one per-order aggregate "
    "(distinct suppliers, distinct returning suppliers) joined back — "
    "EXISTS ⇔ n_supp ≥ 2, NOT EXISTS ⇔ the flagged line's supplier is "
    "the only returner.",
)
def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    # r13 (optimization, guide §2.3): the twin countDistincts planned an
    # Expand (2 projections — every lineitem row shuffled twice, with a
    # gid column) feeding the distinct-merge machinery. The same two
    # quantities come from one (orderkey, suppkey) pre-aggregation —
    # n_supp = group count, n_ret = groups with any 'R' line — shuffling
    # each lineitem row once and replacing distinct-merge with plain
    # partial-aggregating counts; the second aggregate runs over the
    # already-small per-supplier relation. Identical values (verified
    # against the unchanged oracle).
    per_supp = l.groupBy(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    ).agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("_ret")
    )
    per_order = per_supp.groupBy("_ok").agg(
        F.count(F.lit(1)).alias("_n_supp"),
        F.sum("_ret").alias("_n_ret"),
    )
    l1 = l.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(o.select("o_orderkey"), l1.l_orderkey == F.col("o_orderkey"))
        .join(per_order, l1.l_orderkey == F.col("_ok"))
        .filter((F.col("_n_supp") >= 2) & (F.col("_n_ret") == 1))
        .join(F.broadcast(s.select("s_suppkey", "s_name")), l1.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH pos AS (SELECT COUNT(*) AS n,
                        SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS s
                 FROM customer WHERE c_acctbal > 0.0)
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer c, pos
    WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) * pos.n > pos.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
    tags=("subquery", "anti", "aggregation", "tpch"),
    doc="TPC-H Q22 pattern: customers richer than the positive-balance "
    "mean with no recent orders (every customer has SOME order in the "
    "testdata, so 'idle' = nothing since 2000), counted per nation. "
    "Global mean test is cross-multiplied (bal*n > sum, decimal-exact); "
    "NOT EXISTS is a left_anti join on custkey with the date filter "
    "pushed into the anti side's scan.",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(money("c_acctbal")).alias("_s"),
    )
    return (
        c.join(F.broadcast(pos))
        .filter(money("c_acctbal") * F.col("_n") > F.col("_s"))
        .join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (SELECT l_partkey, min(cost) AS min_cost FROM costs GROUP BY l_partkey)
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
           CAST(c.cost AS DOUBLE) AS cost
    FROM part p
      JOIN costs c ON c.l_partkey = p.p_partkey
      JOIN best b  ON b.l_partkey = c.l_partkey AND c.cost = b.min_cost
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size = 15
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey, s.s_suppkey
    LIMIT 100
    """,
    tags=("subquery", "join", "topk", "tpch"),
    doc="TPC-H Q2 pattern: minimum-cost supplier per part (correlated "
    "scalar-min subquery), restated over the testdata (no partsupp "
    "table — supplier cost := min observed lineitem price for the "
    "(part, supplier) pair, decimal-exact so the min-equality join is "
    "safe). De-correlated form: per-(part,supp) costs → per-part min → "
    "equi-join back, exactly Catalyst's own rewrite; supplier/nation "
    "are broadcast dims. Top-100 is fully tie-broken (…, p_partkey, "
    "s_suppkey) so the cut is deterministic on both engines.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    # r13: only p_size=15 partkeys ever survive the part join, so
    # pre-filter the fact with the broadcast semi-join BEFORE the
    # (part,supp) min aggregate (guide §3.2) — groups are intact for
    # every surviving partkey, values unchanged; the agg shuffle
    # shrinks by the size predicate's selectivity (~1/50).
    lf = l.join(
        F.broadcast(p.select(F.col("p_partkey").alias("_fk"))),
        l.l_partkey == F.col("_fk"),
        "left_semi",
    )
    costs = lf.groupBy("l_partkey", "l_suppkey").agg(F.min(money("l_extendedprice")).alias("cost"))
    best = costs.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    return (
        p.join(costs, p.p_partkey == costs.l_partkey)
        .join(best, (best.l_partkey == costs.l_partkey) & (F.col("cost") == F.col("min_cost")))
        .join(F.broadcast(s), s.s_suppkey == costs.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("cost").cast("double").alias("cost"),
            "s_suppkey",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(100)
        .drop("s_suppkey")
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
    tags=("join", "aggregation", "tpch"),
    doc="TPC-H Q13 pattern: customer order-count distribution via LEFT "
    "OUTER join (zero-order customers must appear), with the 'special "
    "orders' exclusion restated on o_orderpriority (testdata has no "
    "comment column). COUNT(o_orderkey) counts only matched rows — the "
    "null-skipping count is the whole point of the pattern. Two "
    "shuffles (custkey join reuses the count's partitioning, then the "
    "tiny histogram agg).",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("subquery", "anti", "distinct", "aggregation", "tpch"),
    doc="TPC-H Q16 pattern: distinct supplier count per part attribute "
    "triple, with a NOT IN exclusion subquery (suppliers 'with "
    "complaints' restated as negative account balance — no comment "
    "column in the testdata) and the part-supplier relation derived "
    "from lineitem (no partsupp table). NOT IN → left_anti join on the "
    "tiny excluded-supplier set; the brand/size filters broadcast-"
    "prune the pair relation before the distinct shuffle.",
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    # r13: only qualifying partkeys survive the part join, so pre-filter
    # the fact with the broadcast semi-join BEFORE the distinct shuffle
    # (guide §3.2) — the pair relation shrinks by the brand/size
    # selectivity (~7x) with identical surviving pairs.
    lf = l.join(
        F.broadcast(p.select(F.col("p_partkey").alias("_fk"))),
        l.l_partkey == F.col("_fk"),
        "left_semi",
    )
    pairs = lf.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(bad_supp, pairs.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
