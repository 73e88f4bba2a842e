#!/usr/bin/env python
"""One-shot sf1-scale validation (VERDICT r9 "Next round" #6).

The SCALING.md curves extrapolate from 1x-8x copies of sf0.1; this script
checks those extrapolations at a real 10x step (~sf1) for the most
expensive headline queries.  All points are measured in THE SAME session
so ratios are free of session drift.

r14 criterion rework (VERDICT r13 #4): the old pass gate was the single
x10/x8 quotient of single-rep timings, which false-flagged dedup_simhash
on an anomalously FAST x10 denominator at 1-2 s magnitudes where session
noise dominates (every absolute r13 point was faster than r12, yet the
x12/x10 quotient read 1.526).  Each step is now the MEDIAN of REPS
interleaved runs, and the gate is the least-squares growth exponent
fitted over ALL measured steps (log t vs log f): a linear operator fits
e ~ 1.0, and EXP_BOUND = 1.8 restates the old slack exactly
(log 1.5 / log 1.25 — a per-step ratio of 1.5 at a 1.25x step).  A
single noisy step now bends the fit instead of owning a quotient.

Prints one JSON object {query: {"x8": s, ..., "exponent": e, "ok": b}}
and exits 1 if any query exceeds EXP_BOUND.

Scratch data lives under /tmp (scale_curve.build); driver inputs are
never touched.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import reset_session_state
from comlake_core_spark.session import get_spark
from comlake_core_spark.workloads import REGISTRY
from scripts.scale_curve import CUSTOM_OPS, build

#: growth-exponent pass bound: log(1.5)/log(1.25) = 1.81… truncated — the
#: old PASS_RATIO=1.5 slack for super-linear tails (LSH pair volume),
#: restated as the per-decade exponent the multi-step fit estimates
EXP_BOUND = 1.8

#: interleaved reps per (query, step); median reported.  3 keeps the full
#: sweep under ~35 min on an idle local[32] box.
REPS = int(os.environ.get("SPARK_GRAFT_SF1_REPS", "3"))

#: the top-10 most expensive BENCH_r09 queries (plus the two-level IVF
#: twin) — the ones whose 100x behavior the curves are meant to predict —
#: extended in r11 with the next cost tier: the four names the r10 bench
#: regressed in-session (VERDICT r10 #7), so their scale behavior is on
#: record independent of session position
QUERIES = [
    "kneser_ney_logprob_docs",
    "train_test_ngram_leakage",
    "embedding_knn_graph_ivf",
    "embedding_knn_graph_ivf2",
    "dedup_containment_prefix",
    "market_basket_lift",
    "pretrain_pipeline_v2",
    "dedup_incremental_batch",
    "hybrid_search_rrf",
    "minhash_estimate_calibration",
    # r11 additions (VERDICT r10 #7)
    "dedup_graph_triangles",
    "agg_rollup_flag_status",
    "sparse_cosine_topk_docs",
    "dedup_simhash",
    "text_pmi_bigrams",
    # r14 additions (VERDICT r13 #1): the global_row_number rank
    # workloads whose bench medians previously excluded their own range
    # shuffle + eager localCheckpoint — every point here times
    # fn()+force, so these are their honest build-inclusive sf1 records
    "dsir_importance_resampling",
    "curriculum_order_docs",
    "shard_assign_balanced",
    "orders_rfm_segmentation",
]

#: names measured one step PAST x10: the knn-ivf pair (steepest r10
#: ratios — confirm the curve flattens under the MEMORY_AND_DISK pin),
#: the r12 additions (minhash_estimate_calibration, dedup_simhash), and
#: — new in r14 (VERDICT r13 #2/#5) — dedup_containment_prefix: its x10
#: step IS the cap-regime boundary (x8's df ceiling equals max_df=200,
#: so the cap first binds at x10 and the x10/x8 quotient mixes regime
#: entry with growth); the x12 point shows whether the capped-postings
#: premium flattens once the regime is fully entered.
EXTRA_STEP = {
    "embedding_knn_graph_ivf": 12,
    "embedding_knn_graph_ivf2": 12,
    "minhash_estimate_calibration": 12,
    "dedup_simhash": 12,
    "dedup_containment_prefix": 12,
}


def fit_exponent(points: dict[int, float]) -> float | None:
    """Least-squares slope of log(median_sec) on log(factor) — the
    growth exponent over every measured step.  None when fewer than two
    usable (positive-time) points exist."""
    xs = [math.log(f) for f, t in sorted(points.items()) if t > 0]
    ys = [math.log(t) for f, t in sorted(points.items()) if t > 0]
    if len(xs) < 2:
        return None
    mx = sum(xs) / len(xs)
    my = sum(ys) / len(ys)
    denom = sum((x - mx) ** 2 for x in xs)
    if denom == 0:
        return None
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main() -> None:
    spark = get_spark("sf1-validate")
    spark.sparkContext.setLogLevel("ERROR")
    ops = {n: (CUSTOM_OPS.get(n) or REGISTRY[n].fn) for n in QUERIES}
    out: dict[str, dict] = {}
    factors = sorted({8, 10} | set(EXTRA_STEP.values()))
    dirs = {f: build(spark, f) for f in factors}
    for name, fn in ops.items():
        # warm the plan shape at tiny scale (JVM/codegen, not data)
        fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
        steps = [8, 10] + ([EXTRA_STEP[name]] if name in EXTRA_STEP else [])
        # interleave reps across steps (A/B discipline: step-order bias
        # and slow session drift land evenly on every step instead of
        # compounding into one quotient)
        samples: dict[int, list[float]] = {f: [] for f in steps}
        for _ in range(REPS):
            for f in steps:
                # r14: reset session state before every timed rep, exactly
                # like bench.py's per-rep discipline (this script claims to
                # extend the bench's methodology to sf1 and must share its
                # session conditions).  Without it, each rep's materialized
                # frames (cache blocks and — since the r14 checkpoint sweep
                # — localCheckpoint blocks, which are spill-only, NOT
                # LRU-evictable) linger until a JVM GC happens to run the
                # ContextCleaner, and late queries in the sweep time GC/spill
                # churn instead of their own plan: the unreset r14 sweep
                # measured pretrain_pipeline_v2 x8 reps of [10.3, 45.4, 10.6]
                # and containment x12 reps of [125, 92, 124] vs 74-101 in the
                # r14-entry record.
                reset_session_state(spark)
                t0 = time.time()
                fn(spark, dirs[f]).write.mode("overwrite").format("noop").save()
                samples[f].append(time.time() - t0)
        row: dict = {}
        meds: dict[int, float] = {}
        for f in steps:
            s = sorted(samples[f])
            meds[f] = s[len(s) // 2]
            row[f"x{f}"] = round(meds[f], 2)
            row[f"reps_x{f}"] = [round(v, 2) for v in samples[f]]
        # continuity columns for cross-round comparison with r10-r13
        row["ratio"] = round(meds[10] / meds[8], 3) if meds.get(8) else None
        if name in EXTRA_STEP:
            f = EXTRA_STEP[name]
            row[f"ratio_{f}_10"] = (
                round(meds[f] / meds[10], 3) if meds.get(10) else None
            )
        e = fit_exponent(meds)
        row["exponent"] = round(e, 3) if e is not None else None
        row["ok"] = e is not None and e <= EXP_BOUND
        out[name] = row
        print(f"{name}: {row}", flush=True)
    print(json.dumps(out))
    sys.exit(0 if all(r["ok"] for r in out.values()) else 1)


if __name__ == "__main__":
    main()
