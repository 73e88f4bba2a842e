"""HTTP serving layer: the reference's 10-endpoint API over the Spark engine.

Routes and behaviors mirror the reference exactly (routing
reference src/comlake/core/main.clj:28-50; handlers
reference src/comlake/core/HttpHandler.java:100-229; error bodies are
``{"error": reason}`` with HTTP 400, unknown routes 404 "unsupported"):

  POST /dir            create empty directory            → {"cid"}
  POST /file           upload bytes (Content-Type=MIME)  → {"cid"}
  POST /cp             {src, dest, path}                 → {"cid"}
  POST /dataset        dataset metadata JSON             → {"id"}
  POST /update         revision JSON (requires parent)   → {"id"}
  POST /find           qast JSON                         → [rows]
  GET  /dir/{cid}      list directory                    → {name: cid}
  GET  /file/{cid}     download bytes                    → octet-stream
  GET  /schema/{cid}   inferred JSON Schema (blocks)     → schema JSON
  POST /extract/{cid}  qast JSON                         → [matching rows]

Implementation notes:
- stdlib ThreadingHTTPServer: the serving tier is stateless glue over the
  engine (the reference scales it by running more instances,
  thesis/main/meth.tex:89-94 — same story here); Spark does the heavy work.
- schema inference runs in a background executor keyed (memoized) by cid,
  exactly the reference's memoized-future design (metadata.clj:67-76);
  GET /schema blocks on the future (HttpHandler.java:203-216).
- find results flatten extras into the row with fixed keys winning
  (PostgreSQL.java:163-172).
"""

from __future__ import annotations

import json
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from pyspark.sql import SparkSession

from comlake_core_spark.catalog import Catalog, MissingMetadata
from comlake_core_spark.extract.reader import UnsupportedType, extract
from comlake_core_spark.extract.schema_infer import cached_schema
from comlake_core_spark.qast.compiler import QastError
from comlake_core_spark.store.base import ContentStore

FIXED_KEYS = ("id", "cid", "type", "description", "source", "topics", "parent")


class ComlakeServer:
    def __init__(self, spark: SparkSession, store: ContentStore, catalog: Catalog, port: int = 8090):
        self.spark = spark
        self.store = store
        self.catalog = catalog
        self.port = port
        self._schema_futures: dict[str, Future] = {}
        self._schema_lock = threading.Lock()
        self._pool = ThreadPoolExecutor(max_workers=4, thread_name_prefix="schema-infer")
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------------
    # engine operations (one method per endpoint)
    # ------------------------------------------------------------------

    def _infer_async(self, cid: str, mime: str | None) -> Future:
        """Memoized background inference (reference metadata.clj:67-76)."""
        with self._schema_lock:
            fut = self._schema_futures.get(cid)
            if fut is None:
                fut = self._pool.submit(self._infer, cid, mime)
                self._schema_futures[cid] = fut
            return fut

    def _infer(self, cid: str, mime: str | None) -> str | None:
        if mime not in ("text/csv", "application/json"):
            return None
        return cached_schema(self.spark, self.store, self.catalog, cid, mime)

    def op_mkdir(self) -> tuple[int, dict]:
        cid = self.store.mkdir()
        self.catalog.upsert_content(cid, "inode/directory")
        return 200, {"cid": cid}

    def op_save(self, body: bytes, mime: str | None) -> tuple[int, dict]:
        if not body:
            return 400, {"error": "empty data"}
        import io

        cid = self.store.add(io.BytesIO(body))
        self.catalog.upsert_content(cid, mime or "application/octet-stream")
        self._infer_async(cid, mime)
        return 200, {"cid": cid}

    def op_cp(self, args: dict) -> tuple[int, dict]:
        cid = self.store.cp(args.get("src"), args.get("dest"), args.get("path"))
        if cid is None:
            return 400, {"error": "dest is not a directory"}
        self.catalog.upsert_content(cid, "inode/directory")
        return 200, {"cid": cid}

    def op_add_dataset(self, meta: dict) -> tuple[int, dict]:
        try:
            return 200, {"id": self.catalog.add_dataset(meta)}
        except MissingMetadata as exc:
            return 400, {"error": {"missing-metadata": exc.args[0]}}

    def op_update(self, meta: dict) -> tuple[int, dict]:
        if "parent" not in meta:
            return 400, {"error": "missing parent"}
        parent = meta.pop("parent")
        new_id = self.catalog.update_dataset(parent, meta)
        if new_id is None:
            return 400, {"error": None}
        return 200, {"id": new_id}

    def op_find(self, ast: Any) -> tuple[int, Any]:
        try:
            rows = self.catalog.find(ast).collect()
        except QastError:
            return 400, {"error": "malformed query"}
        out = []
        for r in rows:
            d = dict(r.asDict())
            extra = d.pop("extra", None) or {}
            merged = {**extra, **{k: d.get(k) for k in FIXED_KEYS}}
            out.append(merged)
        return 200, out

    def op_ls(self, cid: str) -> tuple[int, Any]:
        entries = self.store.ls(cid)
        if entries is None:
            return 400, {"error": "not a directory"}
        return 200, entries

    def op_get(self, cid: str) -> tuple[int, bytes] | tuple[int, dict]:
        try:
            with self.store.fetch(cid) as f:
                return 200, f.read()
        except (OSError, ValueError):
            return 404, {"error": "content not found"}

    def op_schema(self, cid: str) -> tuple[int, Any]:
        mime = self.catalog.get_type(cid)
        schema = self._infer_async(cid, mime).result()
        if schema is None:
            return 400, {"error": "unsupported data type"}
        return 200, json.loads(schema)

    def op_extract(self, cid: str, ast: Any) -> tuple[int, Any]:
        mime = self.catalog.get_type(cid)
        try:
            rows = extract(self.spark, self.store, cid, ast, mime).collect()
        except QastError:
            return 400, {"error": "malformed query"}
        except (UnsupportedType, OSError):
            return 400, {"error": "failed query"}
        return 200, [r.asDict(recursive=True) for r in rows]

    # ------------------------------------------------------------------
    # HTTP plumbing
    # ------------------------------------------------------------------

    def _make_handler(server: "ComlakeServer"):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _send(self, status: int, payload, raw: bool = False):
                body = payload if raw else json.dumps(payload).encode()
                ctype = "application/octet-stream" if raw else "application/json"
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> bytes:
                length = int(self.headers.get("Content-Length") or 0)
                return self.rfile.read(length)

            def _json_body(self):
                try:
                    return json.loads(self._body().decode())
                except (json.JSONDecodeError, UnicodeDecodeError):
                    return None

            def do_POST(self):
                if self.path == "/dir":
                    return self._send(*server.op_mkdir())
                if self.path == "/file":
                    return self._send(*server.op_save(self._body(), self.headers.get("Content-Type")))
                if self.path == "/cp":
                    args = self._json_body()
                    if not isinstance(args, dict):
                        return self._send(400, {"error": "malformed request"})
                    return self._send(*server.op_cp(args))
                if self.path == "/dataset":
                    meta = self._json_body()
                    if not isinstance(meta, dict):
                        return self._send(400, {"error": "malformed request"})
                    return self._send(*server.op_add_dataset(meta))
                if self.path == "/update":
                    meta = self._json_body()
                    if not isinstance(meta, dict):
                        return self._send(400, {"error": "malformed request"})
                    return self._send(*server.op_update(meta))
                if self.path == "/find":
                    ast = self._json_body()
                    if ast is None:
                        return self._send(400, {"error": "malformed query"})
                    return self._send(*server.op_find(ast))
                if self.path.startswith("/extract/"):
                    ast = self._json_body()
                    if ast is None:
                        return self._send(400, {"error": "malformed query"})
                    return self._send(*server.op_extract(self.path[len("/extract/") :], ast))
                return self._send(404, {"error": "unsupported"})

            def do_GET(self):
                if self.path.startswith("/dir/"):
                    return self._send(*server.op_ls(self.path[len("/dir/") :]))
                if self.path.startswith("/file/"):
                    status, payload = server.op_get(self.path[len("/file/") :])
                    if status == 200:
                        return self._send(status, payload, raw=True)
                    return self._send(status, payload)
                if self.path.startswith("/schema/"):
                    return self._send(*server.op_schema(self.path[len("/schema/") :]))
                return self._send(404, {"error": "unsupported"})

        return Handler

    def start(self) -> int:
        handler = self._make_handler()
        self._httpd = ThreadingHTTPServer(("127.0.0.1", self.port), handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
        self._pool.shutdown(wait=False)
