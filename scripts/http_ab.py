#!/usr/bin/env python
"""Interleaved A/B of the HTTP serving tier between two source trees
(VERDICT r8 "Next round" #5: attribute the r6→r8 find_rps drop, 12,976 →
9,485, which single-shot runs could not separate from co-tenant load).

Each TRIAL boots the serving tier from one tree in a FRESH subprocess
(PYTHONPATH pinned to that tree), hammers POST /find on the snapshot path
only, and prints req/s; trees alternate A,B,A,B,… so machine-load drift
cancels.  Output: one JSON line with per-trial series and medians.

Usage: python scripts/http_ab.py TREE_A TREE_B [trials_per_tree]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

WORKER_SRC = r"""
import io, json, os, sys
sys.path.insert(0, sys.argv[1])
from comlake_core_spark.catalog import Catalog
from comlake_core_spark.server import ComlakeServer
from comlake_core_spark.serving import ServingTier
from comlake_core_spark.session import get_serving_spark
from comlake_core_spark.store import LocalStore
import tempfile

root = tempfile.mkdtemp(prefix="httpab-")
# serving entry point: bounded checkpoint-block reclamation (VERDICT r14 #3)
spark = get_serving_spark("http-ab")
spark.sparkContext.setLogLevel("ERROR")
primary = ComlakeServer(
    spark, LocalStore(os.path.join(root, "cas")), Catalog(spark, os.path.join(root, "cat")),
    port=0, reuse_port=True, snapshot_export=os.path.join(root, "find.snap"),
)
tier = ServingTier(primary, n_workers=8)
port = tier.start()
try:
    cid = primary.store.add(io.BytesIO(b"name,size\nlake,3\ncore,9\n"))
    primary.catalog.upsert_content(cid, "text/csv")
    for i in range(100):
        primary.catalog.add_dataset(
            {"file": cid, "description": f"d{i}", "source": "bench",
             "topics": ["t"], "length": str(i)}
        )
    primary._invalidate_snapshot()
    primary._snapshot()
    # load generation = http_bench.py's --client mode (HEAD's copy; the
    # client protocol is tree-independent)
    import subprocess as sp
    import time

    find_body = json.dumps(["==", [".", ["$"], "cid"], "Qm"]).encode()
    secs = os.environ.get("SPARK_GRAFT_HTTP_SECS", "4")

    def hammer(port, body):
        procs = []
        t0 = time.monotonic()
        for _ in range(16):
            p = sp.Popen(
                [sys.executable, sys.argv[2], "--client", str(port), "POST", "/find", secs],
                stdin=sp.PIPE, stdout=sp.PIPE)
            p.stdin.write(body); p.stdin.close(); procs.append(p)
        total = 0
        for p in procs:
            total += int(p.stdout.read().strip() or 0); p.wait()
        return total / (time.monotonic() - t0)

    hammer(port, find_body)  # warm
    print("RPS", round(hammer(port, find_body), 1), flush=True)
finally:
    tier.stop()
    spark.stop()
"""


def run_trial(tree: str, client_script: str) -> float:
    env = dict(os.environ)
    # PYTHONPATH pins the tree for EVERY process in the trial: the
    # serving-tier worker subprocesses (`python -m comlake_core_spark.
    # serving`) inherit the environment, and they serve most of the
    # snapshot-path traffic — sys.path.insert in the primary alone would
    # leave workers importing whatever the cwd resolves to, making both
    # trials measure the same worker code (review r9 #3)
    prior = env.get("PYTHONPATH")
    env["PYTHONPATH"] = tree + (os.pathsep + prior if prior else "")
    out = subprocess.run(
        [sys.executable, "-c", WORKER_SRC, tree, client_script],
        capture_output=True, text=True, env=env, timeout=600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RPS "):
            return float(line.split()[1])
    raise RuntimeError(f"trial in {tree} produced no RPS line:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    client_script = os.path.join(os.path.dirname(os.path.abspath(__file__)), "http_bench.py")
    series: dict[str, list[float]] = {tree_a: [], tree_b: []}
    for i in range(trials):
        for tree in (tree_a, tree_b):
            rps = run_trial(tree, client_script)
            series[tree].append(rps)
            print(f"trial {i} {tree}: {rps}", file=sys.stderr, flush=True)
    print(json.dumps({
        "a": {"tree": tree_a, "series": series[tree_a], "median": statistics.median(series[tree_a])},
        "b": {"tree": tree_b, "series": series[tree_b], "median": statistics.median(series[tree_b])},
        "secs_per_trial": os.environ.get("SPARK_GRAFT_HTTP_SECS", "4"),
        "endpoint": "POST /find (snapshot path)",
    }))


if __name__ == "__main__":
    main()
