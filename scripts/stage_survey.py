#!/usr/bin/env python
"""Stage-level hotspot survey (guide §1/§2.5): run each named workload once
at $SPARK_GRAFT_SF_DIR under a job group and report the top stages by total
executor runtime, with task counts — a stage with high runtime and 1 task on
a 32-core session is a serial hotspot (usually a single-file scan feeding
per-row compute before any exchange).

Usage: python scripts/stage_survey.py NAME [NAME...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import force
from comlake_core_spark.session import get_spark
from comlake_core_spark.workloads import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TOP = int(os.environ.get("SPARK_GRAFT_SURVEY_TOP", "6"))


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("stage-survey")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    st = sc.statusTracker()
    store = spark._jsc.sc().statusStore()
    for name in names:
        force(REGISTRY[name].fn(spark, "/root/testdata/sf0.001"))  # warm
    for name in names:
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        force(REGISTRY[name].fn(spark, SF_DIR))
        el = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        rows = []
        seen = set()
        for jid in sorted(st.getJobIdsForGroup(name)):
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                if sid in seen:
                    continue
                seen.add(sid)
                try:
                    sd = store.lastStageAttempt(sid)
                except Exception:
                    continue
                rows.append((sd.executorRunTime(), sd.numCompleteTasks(), sid))
        rows.sort(reverse=True)
        total_ms = sum(r[0] for r in rows)
        print(f"{name}: wall={el:.2f}s stages={len(rows)} task_ms_total={total_ms}", flush=True)
        for ms, nt, sid in rows[:TOP]:
            flag = "  <-- SERIAL" if nt <= 1 and ms > 200 else ""
            print(f"    stage {sid}: task_ms={ms} tasks={nt}{flag}")
    spark.stop()


if __name__ == "__main__":
    main()
