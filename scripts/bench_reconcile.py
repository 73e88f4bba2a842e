#!/usr/bin/env python
"""Reconcile the four r5→r6 per-query bench regressions (VERDICT r6 #2 /
r7 "Next round" #3): events_burst_detection 2.06×, hybrid_search_rrf
1.70×, sparse_cosine_topk_docs 1.69×, embedding_centroid_drift 1.43×.

Method: fresh session, sf0.1, 4 reps per query, each suspect timed
IMMEDIATELY after its family canary — the ratio (suspect median /
canary median) is the session-pressure-free number.  If the ratio here
matches the r6 BENCH_DETAIL ratio, the r5→r6 raw delta was session
drift (the canary moved too); if the isolated ratio reproduces the raw
regression, it is a real plan change to chase.

Shares force()/reset_session_state() and the family→canary mapping with
bench.py (review r8 #6) so the two measurements run under identical
session conditions.

Writes BENCH_RECONCILE_r08.json (committed artifact — COVERAGE.md cites
it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import FAMILY_CANARY, force, reset_session_state
from comlake_core_spark.session import get_spark
from comlake_core_spark.workloads import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 4

SUSPECTS = [
    "events_burst_detection",
    "hybrid_search_rrf",
    "sparse_cosine_topk_docs",
    "embedding_centroid_drift",
]
# suspect → its family canary, derived from the SAME first-tag mapping
# bench.py uses — no second hand-maintained copy
PAIRS = [(s, FAMILY_CANARY[REGISTRY[s].tags[0]]) for s in SUSPECTS]


def main() -> None:
    spark = get_spark("comlake-reconcile")
    spark.sparkContext.setLogLevel("ERROR")
    warm = "/root/testdata/sf0.001"
    names = sorted({n for p in PAIRS for n in p})
    for n in names:
        force(REGISTRY[n].fn(spark, warm))

    def med(name: str) -> tuple[float, list[float]]:
        samples = []
        for _ in range(REPS):
            reset_session_state(spark)
            df = REGISTRY[name].fn(spark, SF_DIR)
            t0 = time.perf_counter()
            force(df)
            samples.append(time.perf_counter() - t0)
        samples.sort()
        return samples[len(samples) // 2], [round(s, 3) for s in samples]

    out = {"sf_dir": SF_DIR, "reps": REPS, "pairs": []}
    for suspect, canary in PAIRS:
        cm, cs = med(canary)
        sm, ss = med(suspect)
        out["pairs"].append(
            {
                "suspect": suspect,
                "canary": canary,
                "suspect_median": round(sm, 3),
                "canary_median": round(cm, 3),
                "ratio": round(sm / cm, 3),
                "suspect_samples": ss,
                "canary_samples": cs,
            }
        )
        print(f"{suspect}: {sm:.3f}s  (canary {canary} {cm:.3f}s, ratio {sm/cm:.2f})")

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH_RECONCILE_r08.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
