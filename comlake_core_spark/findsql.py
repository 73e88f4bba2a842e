"""DuckDB-backed /find fallback executor (VERDICT r8 "Next round" #2).

The serving layer's /find has three tiers:

1. driver-resident snapshot + fuzz-pinned Python interpreter — the hot
   path for snapshot-safe predicates over catalogs under the row cap;
2. THIS module — snapshot-unsafe predicates and over-cap catalogs run as
   one vectorized DuckDB query over the catalog's current parquet
   snapshot (the same files Spark reads), via the compiler-pinned SQL
   renderer (qast/sqlgen.py).  No Spark job, no driver collect: ~1 ms a
   request instead of the ~100 ms Spark-job floor (the 10.7 req/s cliff
   measured in BENCH_HTTP_r08);
3. the Spark path — the semantics of record, serving whatever the
   ``duckdb_find_safe`` gate (server.py) does not admit, and the fallback
   when DuckDB errors at runtime (e.g. a Java-only regex construct RE2
   rejects).

Being Spark-free, this tier also runs INSIDE the SO_REUSEPORT read
workers (serving.py), so fallback throughput scales with worker count
exactly like the snapshot path — on a cluster these are the stateless
read replicas over shared catalog storage.

Consistency: the catalog's committed version is re-resolved per request
from the token files (one readdir — the same protocol Spark readers use,
catalog/pointer.py); the joined table is re-materialized only when the
(dataset, content) version pair changes, and a small per-(version, AST)
result cache makes repeated predicates O(1).  Stale reads are impossible:
version tokens are immutable and the cache key includes them.

Reference parity: the rendered query IS the reference's own design — it
compiled qast to a PostgreSQL WHERE over the catalog (qast.clj:52-65,
PostgreSQL.java:51-54); here the "PostgreSQL" is an embedded columnar
engine over the catalog parquet.
"""

from __future__ import annotations

import json
import threading
from collections import OrderedDict
from typing import Any

from comlake_core_spark.catalog.pointer import current_pointer
from comlake_core_spark.qast.sqlgen import qast_to_sql_predicate

#: fixed-column kinds of the merged catalog row, in response order —
#: the sqlgen form of the type knowledge catalog.find's resolver takes
#: from the joined() schema (catalog.py)
FIND_KINDS = {
    "id": "num",
    "cid": "str",
    "type": "str",
    "description": "str",
    "source": "str",
    "topics": "arr",
    "parent": "num",
}

_FIXED = tuple(FIND_KINDS)


def _dyn_field(name: str) -> str:
    """Merged-extras lookup with dataset extras winning — the SQL form of
    joined()'s map_zip_with coalesce merge (catalog.py: dataset wins;
    extras values are never NULL, so COALESCE ≡ key-presence priority)."""
    q = "'" + name.replace("'", "''") + "'"
    return f"COALESCE((d_extra[{q}])[1], (c_extra[{q}])[1])"


def render_find_where(ast: Any) -> str:
    """qast → DuckDB WHERE clause over the joined catalog table, with the
    compiler's find-path semantics: partial-match regex (qast.clj:35) and
    compile_predicate's truthiness wrapper on non-boolean roots (a row
    whose arithmetic root is 0 is KEPT — bare SQL WHERE would cast-drop
    it; review r9 #1).  Raises QastError on malformed ASTs, like the
    compiler."""
    return qast_to_sql_predicate(
        ast, kinds=FIND_KINDS, regex_mode="partial", dynamic=_dyn_field
    )


def _as_map(m: Any) -> dict:
    """DuckDB 1.x returns MAP(VARCHAR,VARCHAR) as {'key': [...], 'value':
    [...]}; newer versions return a plain dict.  Normalize both."""
    if not m:
        return {}
    if (
        isinstance(m, dict)
        and set(m.keys()) == {"key", "value"}
        and isinstance(m.get("key"), list)
    ):
        # 1.x columnar encoding — distinguished STRUCTURALLY from a real
        # extras map whose keys happen to be {'key','value'}: extras
        # values are always strings, never lists (review r9 #4)
        return dict(zip(m["key"], m["value"]))
    return dict(m)


class DuckFinder:
    """One per process: holds an in-memory DuckDB with the joined catalog
    materialized per committed version, plus a bounded (version, AST)
    result cache.  Thread-safe: each request executes on its own cursor;
    re-materialization is serialized under a lock."""

    def __init__(
        self,
        catalog_root: str,
        cache_entries: int = 128,
        cache_max_rows: int = 10_000,
    ):
        self.root = catalog_root
        self.cache_entries = cache_entries
        self.cache_max_rows = cache_max_rows
        self._lock = threading.Lock()
        self._con = None
        self._versions: tuple[int, int] | None = None
        self._cache: OrderedDict[tuple, list] = OrderedDict()

    _EMPTY_SQL = (
        "CREATE OR REPLACE TABLE find_joined AS SELECT "
        "CAST(NULL AS BIGINT) AS id, CAST(NULL AS VARCHAR) AS cid, "
        'CAST(NULL AS VARCHAR) AS "type", CAST(NULL AS VARCHAR) AS description, '
        "CAST(NULL AS VARCHAR) AS source, CAST(NULL AS VARCHAR[]) AS topics, "
        "CAST(NULL AS BIGINT) AS parent, "
        "CAST(NULL AS MAP(VARCHAR,VARCHAR)) AS d_extra, "
        "CAST(NULL AS MAP(VARCHAR,VARCHAR)) AS c_extra WHERE FALSE"
    )

    def _refresh(self) -> tuple[int, int]:
        """Ensure find_joined reflects the current committed catalog;
        returns the (dataset, content) version pair served."""
        key = (
            current_pointer(self.root, "dataset")[0],
            current_pointer(self.root, "content")[0],
        )
        if key == self._versions:
            return key
        with self._lock:
            # re-resolve INSIDE the lock: a thread that read a stale
            # pointer before blocking must not re-materialize an older
            # version over a newer one (and poison the cache under the
            # newer key) — the committed version is whatever the tokens
            # say NOW (review r9 #2)
            dver, ddir = current_pointer(self.root, "dataset")
            cver, cdir = current_pointer(self.root, "content")
            key = (dver, cver)
            if key == self._versions:
                return key
            import duckdb

            if self._con is None:
                self._con = duckdb.connect()
            if ddir is None or cdir is None:
                self._con.execute(self._EMPTY_SQL)
            else:
                dq = ddir.replace("'", "''")
                cq = cdir.replace("'", "''")
                self._con.execute(
                    "CREATE OR REPLACE TABLE find_joined AS "
                    'SELECT d.id, c.cid, c."type", d.description, d.source, '
                    "d.topics, d.parent, d.extra AS d_extra, c.extra AS c_extra "
                    f"FROM read_parquet('{dq}/*.parquet') d "
                    f"JOIN read_parquet('{cq}/*.parquet') c ON d.file = c.cid"
                )
            self._cache.clear()
            self._versions = key
        return key

    def find(self, ast: Any) -> list[dict]:
        """Evaluate the qast predicate over the current catalog; returns
        the merged response rows (extras flattened, fixed keys winning —
        byte-equivalent to the snapshot and Spark paths).  Raises
        QastError on malformed ASTs and duckdb.Error on constructs DuckDB
        cannot execute (callers fall back to the Spark path)."""
        entry = self._find_entry(ast)
        return entry[0]

    def find_encoded(self, ast: Any) -> bytes:
        """``find`` returning the response as ENCODED JSON bytes, cached
        alongside the rows: the serving tier sends the same byte string
        for every repeat of a (version, AST) pair, so the steady state
        skips both the SQL render and the per-request re-serialization
        of a many-row hit list (BENCH_HTTP r12: the fallback tier's
        ~100-row responses re-encoded per request were the gap to the
        snapshot tier).  Same exceptions as ``find``."""
        entry = self._find_entry(ast)
        # the None-check-and-fill runs under the lock (ADVICE r13): the
        # bare mutation was benign under CPython (an idempotent write of
        # equal bytes) but inconsistent with the locking discipline every
        # other _cache access follows
        with self._lock:
            if entry[1] is None:
                entry[1] = json.dumps(entry[0]).encode()
            return entry[1]

    def _find_entry(self, ast: Any) -> list:
        """[rows, encoded_bytes|None] cache entry for the predicate —
        cache hits return before any rendering or cursor work (the
        renderer still gates malformed ASTs on every MISS: only 200
        results are ever stored, so a malformed AST can never hit)."""
        key = self._refresh()
        ckey = (key, json.dumps(ast, sort_keys=True, default=str))
        with self._lock:
            hit = self._cache.get(ckey)
            if hit is not None:
                self._cache.move_to_end(ckey)
                return hit
        where = render_find_where(ast)  # QastError before any I/O
        cur = self._con.cursor()
        try:
            rows = cur.execute(f"SELECT * FROM find_joined WHERE {where}").fetchall()
        finally:
            cur.close()
        hits = []
        for r in rows:
            fixed = dict(zip(_FIXED, r[:7]))
            merged = _as_map(r[8])  # content extras first ...
            merged.update(_as_map(r[7]))  # ... dataset extras win ...
            merged.update(fixed)  # ... fixed keys win over both
            hits.append(merged)
        entry = [hits, None]
        if len(hits) <= self.cache_max_rows:
            with self._lock:
                cached = self._cache.get(ckey)
                if cached is not None:
                    entry = cached  # a racing miss won; share its bytes
                else:
                    self._cache[ckey] = entry
                self._cache.move_to_end(ckey)
                while len(self._cache) > self.cache_entries:
                    self._cache.popitem(last=False)
        return entry
