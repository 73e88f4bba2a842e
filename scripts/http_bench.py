#!/usr/bin/env python
"""HTTP serving-layer throughput probe, mirroring the reference's wrk
evaluation (BASELINE.md: thesis/main/eval.tex:90-107 — find 5575.89 req/s,
file download 6238.30 req/s, no-op control 29788.50 req/s on an i5-8250U).

Boots the real ComlakeServer in-process on a LocalStore + Catalog seeded
with datasets, then hammers three endpoints with keep-alive client threads:

  find     POST /find  ["==",[".",["$"],"cid"],"Qm"]   (the wrk find.lua predicate)
  get      GET  /file/{cid}                            (small-file download)
  control  GET  /nope                                  (404 route — no-op control)

Prints one JSON line {endpoint: req_per_sec}. The /find predicate is served
by the driver-resident snapshot fast path (server.py snapshot_safe) — the
architectural analogue of the reference answering /find from PostgreSQL
rather than its data plane."""

from __future__ import annotations

import http.client
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from comlake_core_spark.catalog import Catalog
from comlake_core_spark.server import ComlakeServer
from comlake_core_spark.session import get_spark
from comlake_core_spark.store import LocalStore

N_THREADS = 8
DURATION = 5.0  # seconds per endpoint


def hammer(port: int, method: str, path: str, body: bytes | None) -> float:
    stop = time.monotonic() + DURATION
    counts = [0] * N_THREADS

    def worker(i: int) -> None:
        conn = http.client.HTTPConnection("127.0.0.1", port)
        headers = {"Content-Type": "application/json"} if body else {}
        while time.monotonic() < stop:
            conn.request(method, path, body, headers)
            resp = conn.getresponse()
            resp.read()
            counts[i] += 1
        conn.close()

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(N_THREADS)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return sum(counts) / (time.monotonic() - t0)


def main() -> None:
    root = tempfile.mkdtemp(prefix="comlake-httpbench-")
    spark = get_spark("http-bench")
    srv = ComlakeServer(
        spark, LocalStore(os.path.join(root, "cas")), Catalog(spark, os.path.join(root, "cat")), port=0
    )
    srv.start()
    try:
        # seed: one small file + 100 datasets over it
        import io

        cid = srv.store.add(io.BytesIO(b"name,size\nlake,3\ncore,9\n"))
        srv.catalog.upsert_content(cid, "text/csv")
        for i in range(100):
            srv.catalog.add_dataset(
                {"file": cid, "description": f"d{i}", "source": "bench", "topics": ["t"]}
            )
        srv._invalidate_snapshot()

        find_body = json.dumps(["==", [".", ["$"], "cid"], "Qm"]).encode()
        # dynamic-extra predicate: not snapshot_safe → one Spark job/request
        find_spark_body = json.dumps(["==", [".", ["$"], "description"], ["+", "d", "1"]]).encode()
        warm = hammer(srv.port, "POST", "/find", find_body)  # builds snapshot, warms sockets
        out = {
            "find_rps": round(hammer(srv.port, "POST", "/find", find_body), 1),
            "find_spark_fallback_rps": round(hammer(srv.port, "POST", "/find", find_spark_body), 1),
            "get_rps": round(hammer(srv.port, "GET", f"/file/{cid}", None), 1),
            "control_rps": round(hammer(srv.port, "GET", "/nope", None), 1),
            "threads": N_THREADS,
            "warm_find_rps": round(warm, 1),
        }
        print(json.dumps(out))
    finally:
        srv.stop()
        spark.stop()


if __name__ == "__main__":
    main()
