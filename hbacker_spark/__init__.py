"""hbacker_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference system (rberger/hbacker, an
HBase backup/restore orchestrator — see SURVEY.md) as an idiomatic Spark
DataFrame engine:

- versioned wide-column snapshot export/import with time-range + version
  limits, incremental chains and point-in-time restore
  (``hbacker_spark.operators.snapshots``),
- a relational metadata catalog (``hbacker_spark.catalog``),
- the full relational operator closure (joins incl. semi/anti/as-of,
  aggregations incl. rollup/cube, windows, set ops, scalar/array/JSON
  functions) declared as oracle-checkable queries
  (``hbacker_spark.queries``),
- LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), similarity search, text analysis, multimodal column
  plumbing (``hbacker_spark.functions``),
- Structured Streaming windows over the events table
  (``hbacker_spark.streaming``).

Everything is DataFrame/SQL-first: logical plans go through Catalyst, no
driver-side row loops, no RDDs.
"""

from hbacker_spark.session import get_spark
from hbacker_spark.sources.tables import TABLES, load_table, register_views

__all__ = ["get_spark", "TABLES", "load_table", "register_views"]
