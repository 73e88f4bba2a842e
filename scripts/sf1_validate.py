#!/usr/bin/env python
"""One-shot sf1-scale validation (VERDICT r9 "Next round" #6).

The SCALING.md curves extrapolate from 1x-8x copies of sf0.1; this script
checks those extrapolations at a real 10x step (~sf1) for the ten most
expensive headline queries.  Both the 8x and 10x points are measured in
THE SAME session so the ratio is free of session drift; a linear operator
should show t10/t8 ~ 1.25, and anything past PASS_RATIO (1.5 — the
verdict's slack for super-linear tails like LSH pair volume) is flagged
for diagnosis in SCALING.md.

Prints one JSON object {query: {"x8": s, "x10": s, "ratio": r, "ok": b}}
and exits 1 if any query exceeds PASS_RATIO.

Scratch data lives under /tmp (scale_curve.build); driver inputs are
never touched.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from comlake_core_spark.session import get_spark
from comlake_core_spark.workloads import REGISTRY
from scripts.scale_curve import CUSTOM_OPS, build

PASS_RATIO = 1.5

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
]

#: the knn-ivf pair had the steepest x10/x8 ratios in BENCH_SF1_r10
#: (1.35 / 1.42) — extend THEM one more step to confirm the curve
#: flattens under the MEMORY_AND_DISK checkpoint pin (VERDICT r10 #6);
#: r12 extends the next-steepest BENCH_SF1_r11 names the same way
#: (minhash_estimate_calibration 1.181, dedup_simhash 1.183 — VERDICT
#: r11 #5).  Linear behavior at x12/x10 is 1.2, PASS_RATIO slack still
#: applies.
EXTRA_STEP = {
    "embedding_knn_graph_ivf": 12,
    "embedding_knn_graph_ivf2": 12,
    "minhash_estimate_calibration": 12,
    "dedup_simhash": 12,
}


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
        row = {}
        steps = [8, 10] + ([EXTRA_STEP[name]] if name in EXTRA_STEP else [])
        for f in steps:
            t0 = time.time()
            fn(spark, dirs[f]).write.mode("overwrite").format("noop").save()
            row[f"x{f}"] = round(time.time() - t0, 2)
        row["ratio"] = round(row["x10"] / row["x8"], 3) if row["x8"] else None
        row["ok"] = row["ratio"] is not None and row["ratio"] <= PASS_RATIO
        if name in EXTRA_STEP:
            f = EXTRA_STEP[name]
            row[f"ratio_{f}_10"] = round(row[f"x{f}"] / row["x10"], 3) if row["x10"] else None
            row["ok"] = row["ok"] and (
                row[f"ratio_{f}_10"] is not None and row[f"ratio_{f}_10"] <= PASS_RATIO
            )
        out[name] = row
        print(f"{name}: {row}", flush=True)
    print(json.dumps(out))
    sys.exit(0 if all(r["ok"] for r in out.values()) else 1)


if __name__ == "__main__":
    main()
