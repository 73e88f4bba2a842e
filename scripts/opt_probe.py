#!/usr/bin/env python
"""Optimization probe (guide §1): per-workload build/exec timing + plan capture.

Usage:
  python scripts/opt_probe.py NAME [NAME...]            # time fn() and noop force, 3 reps
  python scripts/opt_probe.py --explain NAME [NAME...]  # also write plans/r14/<name>_<tag>.txt
  SPARK_GRAFT_OPT_TAG=before|after selects the plan-file suffix (default: probe)

Mirrors bench.py's methodology exactly (same session factory, same
reset_session_state between reps, same noop force, warmup at sf0.001) so
numbers here are comparable with BENCH_DETAIL medians.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import force, reset_session_state
from comlake_core_spark.session import get_spark
from comlake_core_spark.workloads import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"
TAG = os.environ.get("SPARK_GRAFT_OPT_TAG", "probe")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_explain = "--explain" in sys.argv
    reps = int(os.environ.get("SPARK_GRAFT_OPT_REPS", "3"))
    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for name in args:
        force(REGISTRY[name].fn(spark, WARM_DIR))  # warmup: codegen+workers

    for name in args:
        if do_explain:
            df = REGISTRY[name].fn(spark, SF_DIR)
            os.makedirs(PLANS_DIR, exist_ok=True)
            with open(os.path.join(PLANS_DIR, f"{name}_{TAG}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        builds, execs = [], []
        for _ in range(reps):
            reset_session_state(spark)
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, SF_DIR)
            t1 = time.perf_counter()
            force(df)
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            spark.sparkContext.setJobDescription(None)
        builds.sort(); execs.sort()
        bm, em = builds[len(builds) // 2], execs[len(execs) // 2]
        print(f"{name:40s} build={bm:7.3f} exec={em:7.3f} total={bm+em:7.3f}  "
              f"(spread b=[{builds[0]:.3f},{builds[-1]:.3f}] e=[{execs[0]:.3f},{execs[-1]:.3f}])",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
