#!/usr/bin/env python
"""Adversarial-skew smoke (VERDICT r4 #7): one key at 50% mass.

Generates a 6M-row events-shaped relation where event_type='hot' carries
HALF the rows (63 cold types share the rest), then measures the
skew-relevant shapes and ASSERTS the expected ratios — a measured
answer to "what actually serializes on a hot key?", not a vibe:

1. plain grouped agg vs operators/skew.py:salted_agg — EXPECTED
   FINDING: plain is not slower (hash partial aggregation collapses
   every group to one row per map task before the shuffle, so the "hot
   reducer" receives ~n_tasks rows regardless of key mass; salting
   adds a second pass for nothing). Salting's real domain is
   partial-agg-hostile state (collect_list/set-valued aggregates,
   sort-based aggs) — for sum/count/min/max Spark is already
   skew-proof and the measurement proves it.
2. window over the hot key vs the agg + broadcast-join decomposition —
   EXPECTED FINDING: the window is the genuinely serializing shape
   (one task owns 50% of all rows; the run shows a (k+1)/n straggler
   stage) and the decomposition wins by >= WINDOW_MIN_RATIO. This is
   the rewrite rule for order-INDEPENDENT windowed aggregates; order-
   dependent ones (sessionization's lag, running sums per user) have
   no salt-shaped fix — their per-key locality is the semantics.

3. (r8, VERDICT r7 #4) the ExactSubstr gram window — span_removal_filter
   partitions by md5(gram), and a viral duplicated span IS a hot key.
   Two adversarial corpora: (a) the VERDICT spec, one 8-gram present in
   30% of DOCS — measured finding: this is NOT a hot key, because a
   single occurrence per doc is one gram row out of ~23, so the "viral"
   key carries only ~1.3% of gram mass and the md5-hashed window
   partition absorbs it; (b) word-spam, 30% of docs a single repeated
   word, so ONE gram key carries ~30% of all gram rows — the genuinely
   serializing case. Against both we measure the two-phase
   decomposition (partial-agg min(struct(doc_id,pos)) per gram + join
   back, the same rewrite rule as #2 — min is partial-aggregatable so
   the hot key collapses map-side before the shuffle). Results drive
   whether span_removal_filter keeps the window or adopts the agg+join.

Run: python skew_smoke.py  (prints one JSON line; exits nonzero if a
ratio assertion fails). Results recorded in SCALE_NOTES.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from hbacker_spark.operators.skew import salted_agg
from hbacker_spark.session import get_spark

N_ROWS = 6_000_000
SALTED_MAX_RATIO = 1.8  # salted may cost up to this vs plain (overhead)
WINDOW_MIN_RATIO = 1.4  # hot-key window must lose to decomposition by this


N_DOCS = 300_000
DOC_WORDS = 30


def _grams(docs):
    """span_removal_filter's gram explode: every overlapping SPAN_W-word
    window, with its starting word position."""
    from hbacker_spark.operators.incremental import SPAN_W

    return docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {DOC_WORDS - SPAN_W}), "
                f"p -> struct(CAST(p AS INT) AS p, "
                f"concat_ws(' ', slice(words, p + 1, {SPAN_W})) AS gram))"
            )
        ).alias("g"),
    ).select("doc_id", "g.p", "g.gram")


def _dup_window(grams):
    """The r7 span_removal_filter shape: ONE window over the gram hash,
    first occurrence (min doc_id, p) survives, rn>=2 rows are the
    duplicate occurrences."""
    w = Window.partitionBy(F.md5(F.col("gram").cast("binary"))).orderBy("doc_id", "p")
    return (
        grams.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") >= 2)
        .select("doc_id", "p")
    )


def _dup_twophase(grams):
    """Skew-proof decomposition: min(struct(doc_id,p)) + count per gram
    hash is PARTIAL-aggregatable (the hot key collapses to one row per
    map task before the shuffle), then only grams with count>=2 — a tiny
    relation, just the duplicated keys — join back to drop the owner
    row. Same output as the window, no per-key serialization."""
    g = grams.withColumn("h", F.md5(F.col("gram").cast("binary")))
    firsts = (
        g.groupBy("h")
        .agg(F.min(F.struct("doc_id", "p")).alias("f"), F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("h", "f")
    )
    return (
        g.join(firsts, "h")
        .filter((F.col("doc_id") != F.col("f.doc_id")) | (F.col("p") != F.col("f.p")))
        .select("doc_id", "p")
    )


def _stage_task_skew(spark, df, noop) -> tuple[float, int]:
    """Run ``df`` once and return (max/median task runtime, n_tasks) of
    the heaviest-shuffle-read new stage — the window's sort stage. This
    is the direct straggler measurement: wall-clock can hide a hot task
    behind overlapping work; the task-time ratio cannot."""
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
            return _json.load(r)

    before = {s["stageId"] for s in stages()}
    noop(df)
    time.sleep(0.5)  # let the last stage land in the UI store
    new = [s for s in stages() if s["stageId"] not in before]
    st = max(new, key=lambda s: int(s.get("shuffleReadBytes", 0)))
    url = (
        f"{ui}/api/v1/applications/{app}/stages/{st['stageId']}/"
        f"{st.get('attemptId', 0)}/taskSummary?quantiles=0.5,1.0"
    )
    with urllib.request.urlopen(url) as r:
        q = _json.load(r)
    med, mx = q["executorRunTime"]
    return round(mx / max(med, 1.0), 2), int(st.get("numTasks", 0))


def hot_gram_case(spark, best_of, noop) -> dict:
    """VERDICT r7 #4: does span_removal_filter's gram window straggle on
    a viral span, and does the two-phase decomposition win?"""
    from hbacker_spark.operators.incremental import SPAN_W

    def corpus_sql(spam: bool):
        if spam:
            # word-spam: hot docs (30%) are one repeated word, so EVERY
            # gram in them is the SAME key -> that key carries ~30% of
            # all gram rows (the genuinely hot shape).
            w = "CASE WHEN hot THEN 'z' ELSE concat('w', id, '_', i) END"
        else:
            # VERDICT spec: one shared 8-gram per hot doc (30% of docs),
            # spliced at a per-doc offset; all other words unique.
            w = (
                f"CASE WHEN hot AND i >= off AND i < off + {SPAN_W} "
                f"THEN concat('h', i - off) ELSE concat('w', id, '_', i) END"
            )
        return (
            spark.range(N_DOCS)
            .withColumn("hot", F.col("id") % 10 < 3)
            .withColumn("off", (F.col("id") % (DOC_WORDS - SPAN_W)).cast("int"))
            .select(
                F.col("id").alias("doc_id"),
                F.expr(f"transform(sequence(0, {DOC_WORDS - 1}), i -> {w})").alias("words"),
            )
            .repartition(32)
            .localCheckpoint(eager=True)
        )

    results: dict[str, float] = {}
    for tag, spam in (("gramspec", False), ("gramspam", True)):
        grams = _grams(corpus_sql(spam))
        win, two = _dup_window(grams), _dup_twophase(grams)
        # identical outputs before timing anything
        n_win = win.count()
        assert n_win == two.count(), f"{tag}: row counts differ"
        assert win.exceptAll(two).isEmpty(), f"{tag}: dup sets differ"
        t_win = best_of(lambda: noop(win))
        t_two = best_of(lambda: noop(two))
        task_ratio, n_tasks = _stage_task_skew(spark, win, noop)
        results[f"{tag}_window_sec"] = t_win
        results[f"{tag}_twophase_sec"] = t_two
        results[f"{tag}_window_over_twophase"] = round(t_win / t_two, 2)
        results[f"{tag}_dup_rows"] = n_win
        results[f"{tag}_window_task_max_over_median"] = task_ratio
        results[f"{tag}_window_stage_tasks"] = n_tasks

    # Measured findings (r8): the hot gram DOES skew the window stage at
    # the task level in the spam case (one task sorts ~30% of all gram
    # rows — max/median task time visibly elevated), but end-to-end the
    # window still WINS, because per-partition sort is a small constant
    # of the pipeline (gram explode + md5 + shuffle write dominate and
    # they are uniform), while the two-phase rewrite pays a second
    # corpus-wide shuffle for the join-back. So span_removal_filter
    # keeps the window; the two-phase form is the documented escape
    # hatch if a deployment's duplicated-span mass approaches the size
    # of a whole partition's worth of work.
    for tag in ("gramspec", "gramspam"):
        assert results[f"{tag}_window_over_twophase"] <= 3.0, (
            f"{tag}: gram window now loses to the two-phase decomposition by "
            f">3x — adopt the agg+join form in span_removal_filter"
        )
    assert results["gramspec_window_task_max_over_median"] <= 4.0, (
        "VERDICT-spec case (one gram in 30% of docs) should NOT be a hot key: "
        "a single occurrence per doc is ~1/23 of that doc's gram rows"
    )
    return results


def main() -> int:
    # UI on: hot_gram_case reads per-task runtimes via the REST API
    spark = get_spark(
        "skew_smoke",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "5000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = (
        spark.range(N_ROWS)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 2 == 0, F.lit("hot"))
            .otherwise(
                F.concat(F.lit("t"), (F.col("id") % 126 / 2).cast("int").cast("string"))
            )
            .alias("event_type"),
            (F.col("id") % 99991).alias("user_id"),
            (F.col("id") % 1000 / 7.0).alias("value"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)  # timings measure the operators, not the generator
    )

    def best_of(fn, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return round(best, 3)

    def noop(d):
        d.write.format("noop").mode("overwrite").save()

    aggs = {
        "n_events": F.count(F.lit(1)),
        "total_value": F.sum(F.round(F.col("value"), 2).cast("decimal(12,2)")),
    }
    plain_df = df.groupBy("event_type").agg(*[e.alias(n) for n, e in aggs.items()])
    salted_df = salted_agg(df, ["event_type"], aggs, salt_buckets=16, salt_source="event_id")
    # equality at adversarial skew (the r4 query proves it at sf0.1)
    assert sorted(map(tuple, plain_df.collect())) == sorted(map(tuple, salted_df.collect()))

    t_plain = best_of(lambda: noop(plain_df))
    t_salted = best_of(lambda: noop(salted_df))

    w = Window.partitionBy("event_type")
    win_df = df.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(F.round(F.col("value"), 2).cast("decimal(12,2)")).over(w).alias("tv"),
    )
    dec_df = df.join(
        F.broadcast(
            df.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value"), 2).cast("decimal(12,2)")).alias("tv"),
            )
        ),
        "event_type",
    ).select("event_id", "n", "tv")
    t_window = best_of(lambda: noop(win_df))
    t_dec = best_of(lambda: noop(dec_df))

    gram_results = hot_gram_case(spark, best_of, noop)

    out = {
        "rows": N_ROWS,
        "hot_key_mass": 0.5,
        "plain_agg_sec": t_plain,
        "salted_agg_sec": t_salted,
        "salted_over_plain": round(t_salted / t_plain, 2),
        "hot_window_sec": t_window,
        "agg_bcast_join_sec": t_dec,
        "window_over_decomposed": round(t_window / t_dec, 2),
        **gram_results,
    }
    print(json.dumps(out))
    assert t_salted / t_plain <= SALTED_MAX_RATIO, (
        f"salted_agg regressed: {t_salted}s vs plain {t_plain}s — "
        "the two-phase pass should cost bounded overhead"
    )
    assert t_window / t_dec >= WINDOW_MIN_RATIO, (
        f"hot-key window ({t_window}s) no longer loses to the "
        f"decomposition ({t_dec}s) — re-measure before trusting the "
        "SCALE_NOTES rewrite guidance"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
