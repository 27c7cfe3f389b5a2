#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The driver captures only a bounded tail of stdout (~2 KB — round 1's
full 66-query line got truncated to `parsed: null`), so the printed line
carries the headline-query timings plus the total over ALL queries, and
the COMPLETE per-query map is written to BENCH_FULL.json beside this
script — committed with the round, auditable by the judge.

Execution goes to the JVM-side noop sink so timings measure the full plan
(scan → shuffle → agg) without driver-side row transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hbacker_spark.registry import load_all_queries  # noqa: E402
from hbacker_spark.session import get_spark  # noqa: E402

WARMUP_QUERY = "q6_forecast_revenue"


def warm_python_workers(spark) -> None:
    """Spin up the Python/Arrow worker pool before timing starts.

    The JVM warmup query never touches mapInPandas, so without this the
    alphabetically-first Arrow query (ann_ivf_cosine_topk) absorbs the
    whole ~6s daemon/worker cold start — measured 5.0s cold vs 1.0s
    steady-state for an identical plan.
    """
    import pandas as pd

    def ident(it):
        for pdf in it:
            yield pdf

    spark.range(1000).toDF("id").mapInPandas(ident, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

# Headline set for the size-bounded stdout line: the TPC-H core, the
# heavy hitters from VERDICT r1's plan audit, and one representative per
# operator family. Everything else is still timed and in BENCH_FULL.json.
HEADLINE = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "topk_orders_per_customer",
    "window_running_total",
    "percentile_totalprice",
    "range_join_event_pairs",
    "asof_purchase_to_click",
    "dedup_exact_keepers",
    "ngram_jaccard_pairs",
    "minhash_lsh_candidates",
    "simhash_fingerprints",
    "dedup_cluster_resolution",
    "embedding_near_dup_pairs",
    "embedding_dedup_clusters",
    "contamination_ngram_overlap",
    "knn_cosine_top10",
    "ann_lsh_cosine_topk",
    "ann_ivf_cosine_topk",
    "ann_near_dup_pairs",
    "tfidf_top_terms",
    "text_quality_stats",
    "pipeline_clean_corpus",
    "pack_token_budget",
    "multimodal_features",
    "merge_upsert_segment_boost",
    "stream_session_windows",
    "stream_join_attribution_shadow",
    "s1_version_limited_scan",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q13_customer_order_distribution",
    "q18_large_volume_customers",
    "q21_sole_returner",
    "semantic_keeper_by_quality",
    "fingerprint_containment_pairs",
    "copurchase_triangle_count",
    "copurchase_bfs_reachable",
    "copurchase_pagerank",
    "ann_dedup_clusters",
    "snapshot_fingerprint_by_nation",
    # round-5 signatures: the single-pass CMS rewrite and the
    # distributed-rank family's fact-scale demonstrations
    "cms_heavy_hitters",
    "orders_median_price_distributed",
    "nucleus_docs_global",
)


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def calibrate(spark) -> float:
    """Fixed synthetic kernel timed in the SAME session (VERDICT r9 #4):
    a 2x10^8-row codegen agg whose plan never changes across rounds, so
    the ratio of two rounds' calibration_sec measures the MACHINE (load
    contention, CPU steal), not the code. Cross-round query ratios can
    then be load-normalized: ratio_normalized = ratio_measured /
    (calib_now / calib_then). Min of 3 — same discipline as queries."""
    df = spark.range(200_000_000).selectExpr(
        "sum(id * (id % 7)) as s", "count(if(id % 13 = 0, 1, null)) as c"
    )
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_noop(df)
        times.append(time.perf_counter() - t0)
    return round(min(times), 3)


def _default_runner() -> str:
    """Self-identifying runner stamp (VERDICT r10 #3a): an unset
    SPARK_GRAFT_BENCH_RUNNER used to record "unspecified", which made
    third-party passes unattributable; now it defaults to effective
    user + a short host hash, so any two artifacts are distinguishable
    without anyone remembering to set the env var."""
    import getpass
    import hashlib
    import socket

    try:
        user = getpass.getuser()
    except Exception:  # noqa: BLE001 — no passwd entry in some containers
        user = f"uid{os.getuid()}" if hasattr(os, "getuid") else "unknown"
    host = hashlib.sha256(socket.gethostname().encode()).hexdigest()[:8]
    return f"{user}@{host}"


def load_avg() -> float | None:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return None


def steal_jiffies() -> int | None:
    """Cumulative host CPU-steal jiffies from /proc/stat (field 8).

    r13 instrument note: this VM shows bursty steal under load (~2.2
    cores averaged over a loaded session, 0 when idle), which is the
    mechanism behind most phantom per-query deltas. Sampling the
    counter at start/mid/end lets a reader attribute an inflated pass
    to the host instead of re-auditing plans. Annotation only — no
    timing methodology depends on it."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        return int(parts[8]) if parts[0] == "cpu" and len(parts) > 8 else None
    except (OSError, ValueError, IndexError):
        return None


def prior_committed_queries() -> dict[str, float]:
    """Per-query seconds from the committed round artifact, used ONLY
    to decide whether a query needs extra warmup reps (VERDICT r12
    task 3a) — never to alter a measured value."""
    try:
        with open(Path(__file__).resolve().parent / "BENCH_FULL.json") as fh:
            return dict(json.load(fh).get("queries") or {})
    except (OSError, ValueError):
        return {}


def provenance() -> dict:
    """Who/where/under-what-load this pass ran (VERDICT r9 #4): two
    rounds of judge time went to one BENCH_FULL.json holding both the
    builder's idle pass and the driver's loaded pass with no way to
    tell them apart. ``runner`` comes from SPARK_GRAFT_BENCH_RUNNER
    when set, else a self-identifying user@hosthash stamp;
    ``load_avg_start`` is the 1-minute load average when the pass
    began — a concurrent-load hint readable after the fact."""
    return {
        "runner": os.environ.get("SPARK_GRAFT_BENCH_RUNNER", _default_runner()),
        "load_avg_start": load_avg(),
    }


def main() -> None:
    # One JVM hosts all ~73 query executions in local mode; the 8g
    # default heap GC-thrashes late in the run (iterative queries
    # measured 3x slower at position ~20 than isolated). Overridable.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark("hbacker_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()

    # Warm the JVM / codegen / parquet footer caches AND the Python
    # worker pool once; not timed.
    run_noop(specs[WARMUP_QUERY].fn(spark, sf_dir))
    warm_python_workers(spark)
    prov = provenance()
    prov["calibration_sec"] = calibrate(spark)
    steal_start = steal_jiffies()

    # min of REPS runs per query: single-JVM GC/JIT noise swings a
    # query 2-4x between otherwise identical passes (measured 70s vs
    # 105s whole-run totals on identical code); the min is the
    # reproducible steady-state cost of the plan.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    # Uniform warmup discipline (VERDICT r5 #3): any query whose FIRST
    # pass exceeds ~1s gets min-of-HEAVY_REPS instead of a hand-kept
    # per-query allowlist. Two judge rounds traced "regressions" (q5
    # 2.4x, bloom 4.67s-vs-1.06s) to first-execution broadcast-build /
    # scan warmup with unchanged plans; the rule now self-applies to
    # any NEW heavy query instead of repeating that false-alarm cycle.
    heavy_threshold = float(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_SEC", "1.0"))
    heavy_reps = max(reps, int(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_REPS", "4")))
    # Iteration aid: SPARK_GRAFT_BENCH_ONLY="a,b,c" times just those
    # queries (substring match allowed) without touching the committed
    # BENCH_FULL.json contract — the full artifact is only written for
    # unfiltered runs, so a targeted loop can't masquerade as a round
    # artifact.
    only = [s for s in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if s]
    names = sorted(
        n for n in specs if not only or any(o in n for o in only)
    )
    from hbacker_spark.operators.rank import release_rank_blocks

    # r13 (VERDICT r12 task 3a): the first-pass>1s escalation rule had a
    # blind spot for sub-second queries — window_running_total's 2.75x
    # plan-identical "regression" got only 2 passes. Any query whose
    # min-of-reps drifts >1.3x from the prior COMMITTED artifact now
    # also escalates to min-of-heavy_reps, resolving warmup/burst
    # outliers in-run. Reference values never replace measurements.
    prior = prior_committed_queries()
    drift_factor = float(os.environ.get("SPARK_GRAFT_BENCH_DRIFT_FACTOR", "1.3"))

    timings: dict[str, float] = {}
    all_times: dict[str, list[float]] = {}
    calib_mid = None
    steal_mid = None
    for i, name in enumerate(names):
        if calib_mid is None and i >= len(names) // 2:
            # mid-pass machine-state sample (VERDICT r10 #3b): a burst
            # calibration at t=0 cannot see contention that builds up
            # DURING a 2-3 minute pass — the r10 driver run calibrated
            # FASTER than the builder's yet ran 1.13x slower overall
            calib_mid = calibrate(spark)
            steal_mid = steal_jiffies()
        times: list[float] = []
        while True:
            t0 = time.perf_counter()
            run_noop(specs[name].fn(spark, sf_dir))
            times.append(time.perf_counter() - t0)
            # rank-routed queries pin range-bucket checkpoint blocks;
            # free them at the query boundary so the single JVM never
            # accumulates dead blocks across the ~190-query run
            release_rank_blocks(spark)
            target = heavy_reps if times[0] > heavy_threshold else reps
            if len(times) >= target:
                ref = prior.get(name)
                drifted = ref and ref > 0 and (
                    min(times) > drift_factor * ref or min(times) * drift_factor < ref
                )
                if drifted and len(times) < heavy_reps:
                    target = heavy_reps
                else:
                    break
        all_times[name] = times
        timings[name] = round(min(times), 3)

    # Median-of-3 for the top-20 heaviest queries (VERDICT r10 #3c):
    # min-of-reps is the steady-state PLAN cost, but cross-round
    # comparisons of the heavy tail kept producing phantom ~1.9x
    # "regressions" from one loaded pass; the within-session median is
    # the robust central tendency the round-over-round ratio should
    # use. Heavy queries already run >= 4 reps, so the median needs no
    # extra passes; top up to 3 reps if a top-20 query somehow ran 2.
    top20 = sorted(timings, key=timings.get, reverse=True)[:20]
    median3: dict[str, float] = {}
    for name in top20:
        times = all_times[name]
        while len(times) < 3:
            t0 = time.perf_counter()
            run_noop(specs[name].fn(spark, sf_dir))
            times.append(time.perf_counter() - t0)
            release_rank_blocks(spark)
        median3[name] = round(sorted(times)[len(times) // 2], 3)

    total = round(sum(timings.values()), 3)
    prov["calibration_mid_sec"] = calib_mid
    prov["load_avg_end"] = load_avg()
    steal_end = steal_jiffies()
    # steal annotation (r13 "not yet optimized" item): cumulative host
    # steal jiffies over each half of the pass — nonzero deltas mark a
    # window whose per-query deltas are environment, not code.
    if steal_start is not None and steal_end is not None:
        prov["steal_jiffies_first_half"] = (
            None if steal_mid is None else steal_mid - steal_start
        )
        prov["steal_jiffies_second_half"] = (
            None if steal_mid is None else steal_end - steal_mid
        )
    full = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # robust cross-round comparator for the heavy tail (r10 #3c):
        # within-session (upper) median of >=3 reps, top-20 heaviest
        "queries_median3_top20": median3,
        "sf": sf,
        "n_queries": len(timings),
        "reps": reps,
        **prov,
        # Bench honesty (VERDICT r3 #8): alternating identical
        # mini-benches on this VM show ±25% run-to-run variance even
        # with min-of-reps; treat cross-round deltas under ~1.3x as
        # environment noise — only structural plan changes (shuffles /
        # broadcasts / scans / checkpoints) are reliably measurable.
        "variance_note": (
            "per-query value = min of {} passes, escalated to min of {} "
            "passes for any query whose first pass exceeds {}s (uniform "
            "first-pass-warmup rule, no per-query allowlist); single-VM "
            "run-to-run variance is +/-25%, so round-over-round deltas "
            "< ~1.3x are noise, not regressions".format(
                reps, heavy_reps, heavy_threshold
            )
        ),
    }
    if not only:  # targeted runs never overwrite the round artifact
        # Per-runner artifacts (VERDICT r11 #6 — ending the overwrite
        # saga): each pass writes its OWN file keyed by the
        # self-identifying runner stamp, so a driver pass and a builder
        # pass coexist instead of clobbering; BENCH_FULL.json stays the
        # merged pointer the driver/judge read — it carries the full
        # payload of THIS pass plus the index of every runner artifact
        # present, so any pass is recoverable from its own file.
        repo = Path(__file__).resolve().parent
        safe_runner = re.sub(r"[^A-Za-z0-9_.@-]", "_", prov["runner"])
        runner_artifact = f"BENCH_FULL.{safe_runner}.json"
        (repo / runner_artifact).write_text(json.dumps(full, indent=1) + "\n")
        full["artifact"] = runner_artifact
        full["runner_artifacts"] = sorted(
            p.name for p in repo.glob("BENCH_FULL.*.json")
        )
        (repo / "BENCH_FULL.json").write_text(json.dumps(full, indent=1) + "\n")

    line = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        # r14: targeted runs (SPARK_GRAFT_BENCH_ONLY) print EVERY timed
        # query — they exist for A/B and scaling receipts, where the
        # HEADLINE filter hides the numbers the run was for. The
        # driver's full-run line is byte-identical to before (no only
        # => HEADLINE filter exactly as always).
        "queries": {
            n: timings[n] for n in (timings if only else HEADLINE) if n in timings
        },
        "sf": sf,
        "n_queries": len(timings),
        "full": "BENCH_FULL.json",
        **prov,
    }
    print(json.dumps(line))


def normalized_ratio(now: dict, then: dict) -> float | None:
    """The documented cross-round comparison formula (SCALE_NOTES.md):
    ratio of totals, divided by the calibration drift between the two
    sessions — so machine slowdown doesn't read as a code regression.
    Uses the mean of start/mid calibration when both exist. Returns
    None when either artifact predates the calibration stamp."""
    # compare LIKE sample kinds only: the mid-pass sample runs in a
    # fully warmed JVM and is systematically faster than the start
    # sample (measured 0.13 vs 0.24 in one session), so mixing a
    # start-only r<=10 artifact with a start+mid r11 one would fold
    # that warmup bias into "machine drift". A calibration can also
    # only round to 0.0 if the kernel ran sub-millisecond — treat <=0
    # as unusable rather than skewing the mean.
    c_now, c_then = [], []
    for k in ("calibration_sec", "calibration_mid_sec"):
        a, b = now.get(k), then.get(k)
        if a is not None and a > 0 and b is not None and b > 0:
            c_now.append(a)
            c_then.append(b)
    if not c_now or not now.get("value") or not then.get("value"):
        return None
    # r13 (VERDICT r12 "what's wrong" #1): a start calibration taken at
    # elevated load (r12: 0.404 start vs 0.09 mid — a 4.5x intra-session
    # swing) used to fold straight into the mean and overcorrect the
    # ratio. Drop a start sample that reads >2x its session's mid sample
    # (both sessions must drop it to keep the comparison like-for-like),
    # then use the minimum of the surviving samples per session — the
    # least-contended observation of the same fixed kernel is the best
    # estimate of the machine's clean speed.
    if len(c_now) == 2 and (c_now[0] > 2 * c_now[1] or c_then[0] > 2 * c_then[1]):
        c_now, c_then = c_now[1:], c_then[1:]
    drift = min(c_now) / min(c_then)
    return round((now["value"] / then["value"]) / drift, 3)


if __name__ == "__main__":
    main()
