"""Multi-process read-scaling tier for the HTTP serving layer.

VERDICT r2 "Next round" #3: the single-process serving layer is GIL-bound at
~1/6 of the reference's published /find throughput (BASELINE.md:
thesis/main/eval.tex:90-107, 5,575.89 req/s on wrk's find.lua predicate).
The serving tier is stateless glue, and the reference's own scaling answer
is "run more instances" (thesis/main/meth.tex:89-94) — this module applies
that answer on one box:

- The PRIMARY (server.ComlakeServer, owns Spark + the single-writer
  catalog) binds the public port with SO_REUSEPORT and exports its
  driver-resident /find snapshot to a JSON file (atomic tmp+rename).
- N WORKER processes (this module's ``main``; no Spark, no JVM) bind the
  SAME public port with SO_REUSEPORT — the kernel load-balances incoming
  connections across all N+1 processes — and serve the read hot paths
  locally:
    POST /find   snapshot-safe predicates via the fuzz-pinned pure-Python
                 interpreter over the exported snapshot (same eval as the
                 primary's fast path, byte-identical responses)
    GET  /file/{cid}, GET /dir/{cid}   straight from the shared
                 content-addressed store directory
    404 control  locally
  Everything else — mutations, snapshot-unsafe /find, /schema, /extract —
  is PROXIED over a keep-alive connection to the primary's private port,
  preserving single-writer catalog semantics and full API coverage on
  every connection.
- Consistency: any catalog mutation makes the primary DELETE the export
  before acknowledging; a worker that finds no export file proxies /find
  to the primary (which rebuilds, re-exports, and answers), so workers
  never serve stale snapshot reads.  The export file is re-read on mtime
  change only (one stat() per request).

This is the same read-replica tiering the reference gets from PostgreSQL
(catalog) + IPFS gateways (content): one writer, N stateless readers over
shared storage.  On a cluster the workers run behind one VIP on many boxes;
SO_REUSEPORT is the one-box degenerate case.
"""

from __future__ import annotations

import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from comlake_core_spark.qast.compiler import QastError
from comlake_core_spark.server import (
    FIXED_KEYS,
    duckdb_find_safe,
    find_static_status,
    normalize_find_ast,
    snapshot_matcher,
    snapshot_safe,
)
from comlake_core_spark.store.local import LocalStore


class SnapshotReader:
    """mtime-cached reader of the primary's snapshot export.

    ``get()`` returns the list of MERGED row dicts (extras with fixed
    columns shadowing, prebuilt by the primary's export), or None when the
    export is absent (primary invalidated it — callers must proxy)."""

    def __init__(self, path: str):
        self.path = path
        self._stamp: tuple[int, int] | None = None
        self._snap: list | None = None
        self._lock = threading.Lock()

    def get(self) -> list | None:
        try:
            st = os.stat(self.path)
        except FileNotFoundError:
            return None
        stamp = (st.st_mtime_ns, st.st_size)
        with self._lock:
            if stamp != self._stamp:
                try:
                    with open(self.path) as f:
                        self._snap = json.load(f)
                except (FileNotFoundError, json.JSONDecodeError):
                    # lost a race with invalidation/replace; proxy this one
                    return None
                self._stamp = stamp
            return self._snap


def _make_worker_handler(
    store: LocalStore, snap: SnapshotReader, primary_port: int, duck=None
):
    proxy_local = threading.local()
    # residual-/find memo: predicates no worker tier serves proxy to the
    # single Spark-owning primary, which caps their throughput at ONE
    # process no matter how many workers run (the 0.36×-of-baseline tier,
    # VERDICT r9 #4).  Workers memoize the primary's verbatim response
    # keyed on the committed catalog version tokens — the same
    # immutable-version protocol DuckFinder's result cache uses — so the
    # steady state serves from worker memory and scales with worker count.
    from collections import OrderedDict

    find_memo: "OrderedDict[tuple, tuple[int, str, bytes]]" = OrderedDict()
    find_memo_lock = threading.Lock()
    _MALFORMED_BODY = json.dumps({"error": "malformed query"}).encode()

    class WorkerHandler(BaseHTTPRequestHandler):
        # same socket discipline as the primary (server.py): keep-alive,
        # one buffered write per response, no Nagle
        protocol_version = "HTTP/1.1"
        wbufsize = -1
        disable_nagle_algorithm = True

        def log_message(self, *args):  # quiet
            pass

        def _send(self, status: int, payload, raw: bool = False):
            body = payload if raw else json.dumps(payload).encode()
            ctype = "application/octet-stream" if raw else "application/json"
            self._send_raw(status, ctype, body)

        def _send_raw(self, status: int, ctype: str, body: bytes):
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> bytes:
            length = int(self.headers.get("Content-Length") or 0)
            return self.rfile.read(length)

        def _proxy(self, body: bytes | None = None, memo_key: tuple | None = None):
            """Forward the request verbatim to the primary's private port
            over a per-thread keep-alive connection; relay the response.
            With ``memo_key``, a bounded Content-Length 200/400 response
            is also stored in the worker's version-scoped /find memo."""
            import http.client

            if body is None:
                body = self._body()
            conn = getattr(proxy_local, "conn", None)
            if conn is None:
                conn = http.client.HTTPConnection("127.0.0.1", primary_port)
                proxy_local.conn = conn
            headers = {}
            ctype = self.headers.get("Content-Type")
            if ctype:
                headers["Content-Type"] = ctype
            try:
                conn.request(self.command, self.path, body or None, headers)
                resp = conn.getresponse()
                status = resp.status
                rtype = resp.getheader("Content-Type", "application/json")
                chunked = resp.getheader("Content-Length") is None
                if not chunked:
                    payload = resp.read()
            except (ConnectionError, http.client.HTTPException, OSError):
                proxy_local.conn = None
                return self._send(502, {"error": "primary unavailable"})
            if chunked:
                # streamed upstream (e.g. /extract): relay in bounded
                # chunks — the worker must not re-buffer what the primary
                # deliberately streamed
                self.send_response(status)
                self.send_header("Content-Type", rtype)
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                try:
                    while True:
                        piece = resp.read(65536)
                        if not piece:
                            break
                        self.wfile.write(b"%x\r\n%s\r\n" % (len(piece), piece))
                    self.wfile.write(b"0\r\n\r\n")
                except (ConnectionError, http.client.HTTPException, OSError):
                    proxy_local.conn = None
                    self.close_connection = True
                return
            # memoize 200s and the QastError 400 (deterministic by
            # construction); a "failed query" 400 may be a transient
            # primary-side failure the worker cannot distinguish, so those
            # keep proxying — the primary's own deterministic negative
            # cache still answers them without a Spark job (review r10 #2)
            if (
                memo_key is not None
                and len(payload) <= 1_000_000
                and (status == 200 or (status == 400 and payload == _MALFORMED_BODY))
            ):
                with find_memo_lock:
                    find_memo[memo_key] = (status, rtype, payload)
                    find_memo.move_to_end(memo_key)
                    while len(find_memo) > 128:
                        find_memo.popitem(last=False)
            self._send_raw(status, rtype, payload)

        def _find_memo_key(self, ast) -> tuple | None:
            """(dataset version, content version, canonical AST) — version
            tokens are immutable, so a mutation changes the key and stale
            hits are impossible (the consistency class of DuckFinder).

            The key is read BEFORE proxying, so a mutation committing
            mid-flight can store the primary's NEWER-version response
            under the older key: readers still resolving the old pointer
            then see fresher data than the pointer promises.  That race
            direction is fresh-over-stale and self-heals once the new
            pointer is visible — do NOT "fix" it by re-reading the
            pointer after the proxy returns, which would flip it into
            serving STALE data under the new key (ADVICE r10 #4)."""
            if duck is None:
                return None
            try:
                from comlake_core_spark.catalog.pointer import current_pointer

                return (
                    current_pointer(duck.root, "dataset")[0],
                    current_pointer(duck.root, "content")[0],
                    json.dumps(ast, sort_keys=True, default=str),
                )
            except Exception:
                return None

        def do_POST(self):
            if self.path == "/find":
                body = self._body()
                try:
                    ast = json.loads(body.decode())
                except (json.JSONDecodeError, UnicodeDecodeError):
                    return self._send(400, {"error": "malformed query"})
                # same pre-pass as the primary's op_find: literal-cast
                # folding + the deterministic-analysis-error 400 class
                ast = normalize_find_ast(ast)
                static = find_static_status(ast)
                if static is not None:
                    return self._send(*static)
                if snapshot_safe(ast):
                    entries = snap.get()
                    if entries is not None:
                        try:
                            match = snapshot_matcher(ast)
                            hits = [merged for merged in entries if match(merged)]
                        except QastError:
                            return self._send(400, {"error": "malformed query"})
                        return self._send(200, hits)
                # middle tier: snapshot-unsafe predicates (and over-cap
                # catalogs, whose export the primary never writes) run as
                # one DuckDB query over the shared catalog parquet, right
                # here in the worker — Spark-free, so fallback throughput
                # scales with worker count (VERDICT r8 #2)
                if duck is not None and duckdb_find_safe(ast):
                    try:
                        # encoded-bytes path: repeats of a (version, AST)
                        # pair send the SAME cached byte string — no SQL
                        # render, no per-request re-serialization of a
                        # many-row hit list (VERDICT r12 #6)
                        return self._send_raw(
                            200, "application/json", duck.find_encoded(ast)
                        )
                    except Exception:
                        pass  # Spark path on the primary decides
                # residual tier: memoized proxy to the primary
                key = self._find_memo_key(ast)
                if key is not None:
                    with find_memo_lock:
                        hit = find_memo.get(key)
                        if hit is not None:
                            find_memo.move_to_end(key)
                    if hit is not None:
                        return self._send_raw(*hit)
                return self._proxy(body, memo_key=key)
            if self.path in ("/dir", "/file", "/cp", "/dataset", "/update") or self.path.startswith(
                "/extract/"
            ):
                return self._proxy()
            return self._send(404, {"error": "unsupported"})

        def do_GET(self):
            if self.path.startswith("/file/"):
                cid = self.path[len("/file/") :]
                try:
                    with store.fetch(cid) as f:
                        return self._send(200, f.read(), raw=True)
                except (OSError, ValueError):
                    return self._send(404, {"error": "content not found"})
            if self.path.startswith("/dir/"):
                entries = store.ls(self.path[len("/dir/") :])
                if entries is None:
                    return self._send(400, {"error": "not a directory"})
                return self._send(200, entries)
            if self.path.startswith("/schema/"):
                return self._proxy(b"")
            return self._send(404, {"error": "unsupported"})

    return WorkerHandler


class _ReusePortServer(ThreadingHTTPServer):
    allow_reuse_port = True


def main(argv: list[str]) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="comlake serving-tier read worker")
    ap.add_argument("--port", type=int, required=True, help="shared public port (SO_REUSEPORT)")
    ap.add_argument("--cas", required=True, help="content store root directory")
    ap.add_argument("--snapshot", required=True, help="primary's snapshot export path")
    ap.add_argument("--primary-port", type=int, required=True, help="primary private port")
    ap.add_argument(
        "--catalog",
        default=None,
        help="catalog root directory: enables the worker-local DuckDB /find "
        "fallback for snapshot-unsafe predicates and over-cap catalogs",
    )
    args = ap.parse_args(argv)

    duck = None
    if args.catalog:
        from comlake_core_spark.findsql import DuckFinder

        duck = DuckFinder(args.catalog)
    handler = _make_worker_handler(
        LocalStore(args.cas), SnapshotReader(args.snapshot), args.primary_port, duck=duck
    )
    httpd = _ReusePortServer(("127.0.0.1", args.port), handler)
    print("READY", flush=True)  # parent waits for this before benchmarking
    httpd.serve_forever()


class ServingTier:
    """Primary ComlakeServer + N SO_REUSEPORT read workers on one port.

    The primary must be constructed with ``reuse_port=True`` and a
    ``snapshot_export`` path; ``start()`` boots the public + private
    listeners and the worker processes (plain subprocesses — no JVM or
    Spark state is inherited), and blocks until every worker is bound."""

    def __init__(self, primary, n_workers: int = 4):
        if not primary.reuse_port or primary.snapshot_export is None:
            raise ValueError("primary needs reuse_port=True and a snapshot_export path")
        # Workers re-open the content store by filesystem root, so only a
        # LocalStore primary can be fronted; an IpfsStore (no .root, daemon
        # behind HTTP) would crash start() or silently serve the wrong
        # backend.  Fail at construction with a clear message instead.
        if not isinstance(primary.store, LocalStore):
            raise ValueError(
                "ServingTier requires a LocalStore-backed primary (workers "
                f"re-open the store by root path); got {type(primary.store).__name__}"
            )
        self.primary = primary
        self.n_workers = n_workers
        self.procs: list = []

    def start(self) -> int:
        import subprocess

        port = self.primary.start()
        private_port = self.primary.start_private()
        cas_root = self.primary.store.root
        catalog_root = getattr(self.primary.catalog, "root", None)
        for _ in range(self.n_workers):
            proc = subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "comlake_core_spark.serving",
                    "--port",
                    str(port),
                    "--cas",
                    cas_root,
                    "--snapshot",
                    self.primary.snapshot_export,
                    "--primary-port",
                    str(private_port),
                ]
                + (["--catalog", catalog_root] if catalog_root else []),
                stdout=subprocess.PIPE,
                text=True,
            )
            self.procs.append(proc)
        for proc in self.procs:
            line = proc.stdout.readline()
            if line.strip() != "READY":
                raise RuntimeError(f"serving worker failed to start: {line!r}")
        return port

    def stop(self) -> None:
        for proc in self.procs:
            proc.terminate()
        for proc in self.procs:
            proc.wait(timeout=10)
        self.procs = []
        self.primary.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
