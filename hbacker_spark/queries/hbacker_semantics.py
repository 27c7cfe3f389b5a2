"""hbacker-core semantics (SURVEY.md §2.A S1 + §2.B), oracle-checked.

The reference's payload model is versioned wide-column cells
(row_key, cf, qualifier, ts, value). The driver testdata's ``events``
table is the cell-stream analog: user_id≈row_key, event_type≈qualifier,
ts≈cell version timestamp, value≈payload. These queries re-express the
reference's core data semantics on it:

- S1 time-range + version-limited scan-export (export.rb:145-169:
  `hadoop jar … export <table> <dest> <versions> <start> <end>`),
- point-in-time restore via latest-version-wins
  (docs/Proposed_HBase_Backup_using_HBASE-1684.txt:94-97),
- incremental chain watermarks: next start_time = previous end_time
  (docs/…HBASE-1684.txt:40-58).

At scale the window shuffles once on the cell key; Spark ≥3.5 rewrites
rank-limit windows to WindowGroupLimit (partial top-k map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hbacker_spark.registry import register
from hbacker_spark.sources.tables import load_table, ts_epoch_us

RANGE_START = "2024-01-05 00:00:00"
RANGE_END = "2024-01-20 00:00:00"
PITR_CUTOFF = "2024-01-15 00:00:00"


@register(
    "s1_version_limited_scan",
    oracle=f"""
    SELECT event_id, user_id, event_type, ts, value, CAST(version_rank AS INT) AS version_rank
    FROM (
      SELECT *,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS version_rank
      FROM events
      WHERE ts >= TIMESTAMP '{RANGE_START}' AND ts < TIMESTAMP '{RANGE_END}'
    ) WHERE version_rank <= 5
    """,
    tags=("hbacker", "window", "topk"),
    doc="S1: time-range scan keeping <=5 newest versions per cell "
    "(export.rb:145-169 versions/start/end semantics).",
)
def s1_version_limited_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit(RANGE_START).cast("timestamp")) & (F.col("ts") < F.lit(RANGE_END).cast("timestamp"))
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("version_rank", F.row_number().over(w))
        .filter(F.col("version_rank") <= 5)
        .select("event_id", "user_id", "event_type", "ts", "value", "version_rank")
    )


@register(
    "pitr_latest_state",
    oracle=f"""
    SELECT user_id, event_type, event_id, ts, value
    FROM (
      SELECT user_id, event_type, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
      WHERE ts <= TIMESTAMP '{PITR_CUTOFF}'
    ) WHERE rn = 1
    """,
    tags=("hbacker", "window"),
    doc="Point-in-time restore: drop cells newer than the cutoff, then "
    "latest-version-wins per cell (docs/…HBASE-1684.txt:94-97).",
)
def pitr_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("ts") <= F.lit(PITR_CUTOFF).cast("timestamp"))
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@register(
    "incremental_watermarks",
    oracle="""
    SELECT event_type AS table_name,
           max(ts) AS next_start_time,
           COUNT(*) AS rows_backed_up,
           CAST(min(ts) AS TIMESTAMP) AS first_seen
    FROM events
    GROUP BY event_type
    """,
    tags=("hbacker", "aggregation"),
    doc="Incremental chain: next export's start_time = previous end_time "
    "per table (docs/…HBASE-1684.txt:40-58; catalog max(end_time)).",
)
def incremental_watermarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.col("event_type").alias("table_name")).agg(
        F.max("ts").alias("next_start_time"),
        F.count(F.lit(1)).alias("rows_backed_up"),
        F.min("ts").alias("first_seen"),
    )


@register(
    "session_report",
    oracle="""
    SELECT strftime(ts, '%Y%m%d') AS session_name,
           min(ts) AS started_at,
           max(ts) AS ended_at,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
           (SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) > 0) AS error
    FROM events
    GROUP BY strftime(ts, '%Y%m%d')
    """,
    tags=("hbacker", "catalog", "aggregation"),
    doc="Session-bracket report analog (C9/C10: session_name yyyyMMdd mint "
    "cli.rb:30-32, started_at/ended_at/error columns mysql.rb:28-49).",
)
def session_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    is_err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    return e.groupBy(F.date_format("ts", "yyyyMMdd").alias("session_name")).agg(
        F.min("ts").alias("started_at"),
        F.max("ts").alias("ended_at"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(is_err).alias("n_errors"),
        (F.sum(is_err) > 0).alias("error"),
    )


@register(
    "catalog_like_wildcard",
    oracle="""
    SELECT event_type AS table_name, COUNT(*) AS n
    FROM events
    WHERE event_type LIKE '%u%'
    GROUP BY event_type
    """,
    tags=("hbacker", "like"),
    doc="C5 parity: table_name LIKE wildcard lookup (mysql.rb:274-288).",
)
def catalog_like_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type").like("%u%"))
        .groupBy(F.col("event_type").alias("table_name"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "snapshot_fingerprint_by_nation",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_rows,
           bit_xor(CAST(('0x' || substr(md5(concat_ws('|',
               CAST(c_custkey AS VARCHAR), c_name,
               CAST(c_nationkey AS VARCHAR),
               CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR),
               c_mktsegment)), 1, 15)) AS UBIGINT)) AS fingerprint
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("validation", "aggregation", "hbacker"),
    doc="Content fingerprint per shard: md5 row digests XOR-folded per "
    "nation (operators/validate.py). The reference's import validation "
    "set-compares table NAMES only (lib/hbacker/import.rb:54-63); this "
    "is the content-level check it lacks — XOR is partition-order "
    "independent, so source and restore fingerprints are comparable "
    "regardless of how either side was parallelized, and grouping "
    "localizes which shard diverged. Cross-engine exact because the "
    "row rendering pins decimals to a fixed scale before hashing.",
)
def snapshot_fingerprint_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.validate import table_fingerprint

    c = load_table(spark, sf_dir, "customer")
    cols = [
        F.col("c_custkey").cast("string"),
        F.col("c_name"),
        F.col("c_nationkey").cast("string"),
        F.col("c_acctbal").cast("decimal(12,2)").cast("string"),
        F.col("c_mktsegment"),
    ]
    return table_fingerprint(c, cols, group_by=["c_nationkey"])


@register(
    "snapshot_diff_order_status",
    oracle="""
    WITH v1 AS (
      SELECT o_custkey,
             max_by(o_orderstatus, epoch(o_orderdate) * 100000000 + o_orderkey) AS status
      FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY o_custkey),
    v2 AS (
      SELECT o_custkey,
             max_by(o_orderstatus, epoch(o_orderdate) * 100000000 + o_orderkey) AS status
      FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      GROUP BY o_custkey)
    SELECT COALESCE(v1.o_custkey, v2.o_custkey) AS o_custkey,
           v1.status AS v1_status,
           v2.status AS v2_status,
           CASE WHEN v1.o_custkey IS NULL THEN 'added'
                WHEN v1.status <> v2.status THEN 'changed'
                ELSE 'unchanged' END AS change_type
    FROM v1 FULL OUTER JOIN v2 ON v1.o_custkey = v2.o_custkey
    WHERE v1.o_custkey IS NULL OR v1.status <> v2.status
    """,
    tags=("validation", "cdc", "join", "hbacker"),
    doc="CDC diff between two point-in-time states (the reference's "
    "incremental chain, read back as a changeset): latest order status "
    "per customer as of two cutoffs, full-outer-joined and classified "
    "added/changed. One shuffle per state + one on the join key; the "
    "max_by arg-max uses the composite ordering scalar so both states "
    "are deterministic. At 100 TB this is the snapshot-comparison you "
    "run instead of re-exporting to see what an increment will touch.",
)
def snapshot_diff_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    ordval = (
        F.unix_timestamp("o_orderdate") * F.lit(100000000).cast("long")
        + F.col("o_orderkey")
    )

    def state(cutoff: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
            .groupBy("o_custkey")
            .agg(F.max_by("o_orderstatus", ordval).alias("status"))
        )

    v1 = state("1999-01-01").select(
        F.col("o_custkey").alias("k1"), F.col("status").alias("v1_status")
    )
    v2 = state("2000-01-01").select(
        F.col("o_custkey").alias("k2"), F.col("status").alias("v2_status")
    )
    diff = v1.join(v2, F.col("k1") == F.col("k2"), "full_outer")
    return (
        diff.select(
            F.coalesce(F.col("k1"), F.col("k2")).alias("o_custkey"),
            "v1_status",
            "v2_status",
            F.when(F.col("k1").isNull(), "added")
            .when(F.col("v1_status") != F.col("v2_status"), "changed")
            .otherwise("unchanged")
            .alias("change_type"),
        )
        .filter((F.col("v1_status").isNull()) | (F.col("v1_status") != F.col("v2_status")))
    )


ZORDER_BITS = 16


def _zorder_oracle() -> str:
    from hbacker_spark.operators.maintenance import sql_zorder_key

    return f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(epoch_us(o_orderdate) / 86400000000.0) AS BIGINT) AS day
      FROM orders)
    SELECT o_orderkey, o_custkey, day,
           {sql_zorder_key('o_custkey', 'day', ZORDER_BITS)} AS zkey
    FROM base
    ORDER BY zkey, o_orderkey
    LIMIT 100
    """


@register(
    "zorder_key_orders",
    oracle=_zorder_oracle(),
    tags=("maintenance", "layout", "deterministic"),
    doc="Morton (Z-order) clustering key over (customer, order-day): "
    "the multi-dimensional layout tool for 100 TB data skipping. "
    "Feeding this key to write_clustered lays files along the Z-curve "
    "so parquet min/max stats stay tight on BOTH dimensions and a box "
    "filter (customer range AND date range) prunes files — 1-dim range "
    "clustering can only serve one dimension (pruning advantage "
    "asserted in test_maintenance.py). The interleave is a pure "
    "codegen shift/mask fold, integer-exact and engine-portable, so "
    "layout decisions reproduce anywhere. The query surfaces the first "
    "100 rows of the curve (deterministic: zkey then key tiebreak).",
)
def zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.maintenance import zorder_key

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        F.floor(ts_epoch_us(o, "o_orderdate") / F.lit(86_400_000_000)).cast("long").alias("day"),
    )
    return (
        base.withColumn("zkey", zorder_key("o_custkey", "day", ZORDER_BITS))
        .orderBy("zkey", "o_orderkey")
        .limit(100)
    )
