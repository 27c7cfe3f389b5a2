"""Connected-components dedup clustering + stateful streaming operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_connected_components_known_graph(spark):
    from hbacker_spark.operators.clustering import connected_components

    # components: {1,2,3,4} (chain), {10,11}, singleton edges absent
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    comps = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    from hbacker_spark.operators.clustering import connected_components

    n = 40  # longer than naive per-hop propagation would handle in 20 iters?
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], "doc_a long, doc_b long")
    comps = connected_components(edges, max_iter=50).collect()
    assert {r["component"] for r in comps} == {0}
    assert len(comps) == n + 1


def test_dedup_clusters_end_to_end(spark, sf_dir):
    """LSH candidates → components → every doc resolved to one keeper."""
    from hbacker_spark.functions.dedup import lsh_candidate_pairs
    from hbacker_spark.operators.clustering import dedup_clusters
    from hbacker_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs)
    resolved = dedup_clusters(docs, pairs)
    n_docs = docs.count()
    assert resolved.count() == n_docs
    # keeper is a member of the doc set and min of its cluster
    assert resolved.filter(F.col("keeper_id") > F.col("doc_id")).count() == 0
    # every cluster's keeper marks itself
    keepers = resolved.filter(F.col("is_keeper")).select("doc_id").distinct()
    clusters = resolved.select("keeper_id").distinct()
    assert keepers.count() == clusters.count()


def test_stateful_running_spend_stream(spark, tmp_path):
    from hbacker_spark.streaming.stateful import running_spend
    from hbacker_spark.streaming.windows import EVENTS_STREAM_SCHEMA

    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1, "click", 10.0, "{}"),
            (2, "2024-01-01 10:01:00", 1, "click", 5.5, "{}"),
            (3, "2024-01-01 10:02:00", 2, "view", 2.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.format("parquet").schema(EVENTS_STREAM_SCHEMA).load(src)
    )
    q = (
        running_spend(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("spend")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r["user_id"]: r for r in spark.sql("SELECT * FROM spend").collect()}
    assert rows[1]["n_events"] == 2 and rows[1]["total_value"] == 15.5
    assert rows[2]["n_events"] == 1 and rows[2]["total_value"] == 2.0
    assert all(r["status"] == "active" for r in rows.values())
