"""The /find DuckDB middle tier (VERDICT r8 #2): gate classification,
row-for-row parity with the Spark path across the snapshot-unsafe predicate
regimes, over-cap catalog routing, worker-tier serving, and a hypothesis
fuzz pinning DuckDB == Spark over the merged catalog row."""

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from comlake_core_spark.catalog import Catalog
from comlake_core_spark.findsql import DuckFinder
from comlake_core_spark.server import ComlakeServer, duckdb_find_safe, snapshot_safe
from comlake_core_spark.store import LocalStore

FIXED = ("id", "cid", "type", "description", "source", "topics", "parent")


@pytest.fixture(scope="module")
def rich_server(spark, tmp_path_factory):
    """A catalog exercising every extras regime: numeric strings, malformed
    numbers, the literal string "false", empty strings, JSON objects,
    missing fields, a parent revision, and two content rows."""
    root = tmp_path_factory.mktemp("duckfind")
    srv = ComlakeServer(
        spark, LocalStore(str(root / "cas")), Catalog(spark, str(root / "cat")), port=0
    )
    import io

    cid1 = srv.store.add(io.BytesIO(b"a,b\n1,2\n"))
    cid2 = srv.store.add(io.BytesIO(b"x\ny\n"))
    srv.catalog.upsert_content(cid1, "text/csv")
    srv.catalog.upsert_content(cid2, "text/plain")
    lengths = ["0", "3", "9", "abc", "false", "", "2.5", "-7"]
    ids = []
    for i, ln in enumerate(lengths):
        meta = {
            "file": cid1 if i % 2 == 0 else cid2,
            "description": f"d{i}",
            "source": "s" if i < 4 else "t",
            "topics": ["t", f"t{i % 3}"],
            "length": ln,
            "props": json.dumps({"nested": f"x{i}", "n": str(i), "deep": {"k": "v"}}),
        }
        if i >= 6:
            del meta["props"]  # some rows miss the JSON field entirely
        if i == 7:
            del meta["length"]
        ids.append(srv.catalog.add_dataset(meta))
    srv.catalog.update_dataset(ids[0], {"description": "d0-rev"})
    srv._invalidate_snapshot()
    yield srv
    srv.stop()


def _spark_find(srv, ast):
    rows = srv.catalog.find(ast).collect()
    out = []
    for r in rows:
        d = dict(r.asDict(recursive=True))
        extra = d.pop("extra", None) or {}
        out.append({**extra, **{k: d.get(k) for k in FIXED}})
    return sorted(out, key=lambda d: d["id"])


# every snapshot-unsafe-but-duckdb-safe regime, plus snapshot-safe shapes
# (the over-cap catalog serves those through DuckDB too)
DUCK_PREDICATES = [
    # '+' / arithmetic with extras operands (the measured 10.7 req/s cliff)
    [">", ["+", [".", ["$"], "length"], 1], 2],
    [">", ["+", [".", ["$"], "length"], [".", ["$"], "length"]], 5],
    ["==", ["-", [".", ["$"], "length"]], -3],
    [">", ["*", [".", ["$"], "length"], 2], 4],
    ["==", ["/", [".", ["$"], "length"], 0], 0],  # div-by-zero → NULL → no hits
    ["==", ["%", [".", ["$"], "length"], 2], 1],
    # extras under boolean truthiness (the "false" string drops)
    ["&", [".", ["$"], "length"]],
    ["|", [".", ["$"], "length"], False],
    ["!", [".", ["$"], "length"]],
    ["!", [".", ["$"], "nosuchfield"]],
    # multi-segment JSON paths (valid, missing-key, missing-field, deep,
    # and into a non-JSON fixed string column → NULL, like get_json_object)
    ["==", [".", ["$"], "props", "nested"], "x1"],
    ["==", [".", ["$"], "props", "nope"], "x"],
    ["==", [".", ["$"], "props", "deep", "k"], "v"],
    ["<", [".", ["$"], "props", "n"], 4],
    ["~", [".", ["$"], "props", "nested"], "x[0-9]"],
    ["&", [".", ["$"], "props", "deep"]],
    # NON-BOOLEAN ROOTS (review r9 #1): compile_predicate's truthiness
    # keeps every non-null value — including 0 — where a bare SQL WHERE
    # would cast-drop it; these pin qast_to_sql_predicate's wrapper
    ["%", [".", ["$"], "id"], 2],            # 0 for even ids — still kept
    ["-", [".", ["$"], "length"], 3],        # 0 at length=3 — still kept
    ["*", [".", ["$"], "length"], 0],        # 0 everywhere parseable
    ["+", [".", ["$"], "length"], [".", ["$"], "nosuchfield"]],  # all-null root
    [".", ["$"], "length"],                  # bare extras root ("false" drops)
    [".", ["$"], "topics"],                  # array root: non-null → kept
    "hello",                                 # literal root: every row
    0,                                       # numeric 0 literal: truthy (non-null)
    # snapshot-safe shapes (over-cap catalogs route these here too)
    ["==", [".", ["$"], "type"], "text/csv"],
    [">", [".", ["$"], "length"], 2],
    ["==", [".", ["$"], "length"], "9"],
    ["~", [".", ["$"], "length"], "[0-9]+"],
    ["&&", [".", ["$"], "topics"], ["t1", "zz"]],
    ["==", [".", ["$"], "parent"], 1],
    ["==", [".", ["$"], "length"], [".", ["$"], "length"]],
    ["|", ["==", [".", ["$"], "source"], "t"], ["<", [".", ["$"], "length"], 1]],
]


def test_gate_is_wider_than_snapshot_safe():
    for ast in DUCK_PREDICATES:
        assert duckdb_find_safe(ast), ast
    # snapshot-safe ⊆ duckdb-safe on the whole matrix
    for ast in DUCK_PREDICATES:
        if snapshot_safe(ast):
            assert duckdb_find_safe(ast), ast
    # mixed known-kind comparisons and non-string nested paths stay out
    assert not duckdb_find_safe(["==", [".", ["$"], "id"], "1"])
    assert not duckdb_find_safe(["==", [".", ["$"], "topics", "x"], "v"])
    assert not duckdb_find_safe(["==", [".", ["$"], "id", "x"], "v"])
    # nested path into a FIXED string column errors on the Spark path
    # (PG `->` on text errors too) — not this tier's to serve
    assert not duckdb_find_safe(["==", [".", ["$"], "description", "k"], "v"])
    assert not duckdb_find_safe(["&&", [".", ["$"], "length"], ["a"]])
    assert not duckdb_find_safe(["$"])
    assert not duckdb_find_safe([])
    # unknown head = array literal (qast.clj:56): safe, like snapshot_safe
    assert duckdb_find_safe(["nope-op", 1]) == snapshot_safe(["nope-op", 1])


def test_duckdb_find_matches_spark_find(rich_server):
    for ast in DUCK_PREDICATES:
        got = rich_server._duck_find(ast)
        assert got is not None, ast
        assert sorted(got, key=lambda d: d["id"]) == _spark_find(rich_server, ast), ast


def test_duckdb_route_serves_unsafe_predicates_end_to_end(rich_server):
    """op_find answers snapshot-unsafe predicates from the DuckDB tier
    (Spark is never consulted — proven by parity plus the route's cache)."""
    ast = [">", ["+", [".", ["$"], "length"], 1], 2]
    assert not snapshot_safe(ast) and duckdb_find_safe(ast)
    status, hits = rich_server.op_find(ast)
    assert status == 200
    assert sorted(hits, key=lambda d: d["id"]) == _spark_find(rich_server, ast)
    # served from DuckDB: the finder exists and cached the result
    assert rich_server._duck is not None
    assert any(True for _ in rich_server._duck._cache)


def test_duckdb_serves_over_cap_catalog(rich_server):
    """A catalog past snapshot_max_rows serves snapshot-SAFE predicates
    through DuckDB, not a per-request Spark job (the r8 over-cap cliff)."""
    rich_server.snapshot_max_rows = 2  # catalog has 9 datasets
    rich_server._invalidate_snapshot()
    try:
        ast = ["==", [".", ["$"], "type"], "text/csv"]
        assert snapshot_safe(ast)
        status, hits = rich_server.op_find(ast)
        assert status == 200
        assert rich_server._find_snap is ComlakeServer._OVER_CAP
        assert sorted(hits, key=lambda d: d["id"]) == _spark_find(rich_server, ast)
    finally:
        rich_server.snapshot_max_rows = 200_000
        rich_server._invalidate_snapshot()


def test_duckdb_sees_mutations_immediately(rich_server):
    """The finder re-resolves the catalog version per request: a dataset
    added after a cached result is visible on the next find."""
    ast = ["&", [".", ["$"], "fresh"]]
    assert duckdb_find_safe(ast)
    before = rich_server._duck_find(ast)
    assert before == []
    import io

    cid = rich_server.store.add(io.BytesIO(b"fresh\n"))
    rich_server.catalog.upsert_content(cid, "text/plain")
    new_id = rich_server.catalog.add_dataset(
        {"file": cid, "description": "f", "source": "s", "topics": [], "fresh": "yes"}
    )
    after = rich_server._duck_find(ast)
    assert [d["id"] for d in after] == [new_id]


def test_malformed_ast_still_400_through_fallback(rich_server):
    # render + compile both reject; the endpoint answers 400 either way
    status, err = rich_server.op_find(["%", [".", ["$"], "length"], 2, 3])
    assert status == 400 and err == {"error": "malformed query"}


def test_duckdb_runtime_error_falls_back_to_spark(rich_server):
    """A Java-regex construct RE2 rejects (backreference) passes the gate,
    errors inside DuckDB, and lands on the Spark path with the right
    answer instead of a 500."""
    ast = ["~", [".", ["$"], "description"], r"(d)\1"]
    assert duckdb_find_safe(ast)
    status, hits = rich_server.op_find(ast)
    assert status == 200
    assert sorted(hits, key=lambda d: d["id"]) == _spark_find(rich_server, ast)


# ---------------------------------------------------------------------------
# hypothesis: random predicates over the extras regimes; whatever the gate
# admits must match Spark row-for-row
# ---------------------------------------------------------------------------

_efield = st.sampled_from(
    [[".", ["$"], f] for f in ("length", "nosuchfield")]
    + [[".", ["$"], "props", "n"], [".", ["$"], "props", "nested"]]
)
_num = st.sampled_from([0, 1, 2, 3, 9, -7, 2.5])


def _arith(depth):
    if depth == 0:
        return st.one_of(_efield, _num)
    sub = _arith(depth - 1)
    return st.one_of(
        _efield,
        _num,
        st.tuples(st.sampled_from(["+", "-", "*", "/", "%"]), sub, sub).map(list),
        st.tuples(st.just("-"), sub).map(list),
    )


def _pred():
    a = _arith(1)
    cmp = st.tuples(st.sampled_from(["==", "!=", "<", "<=", ">", ">="]), a, a).map(list)
    truthy = st.tuples(st.sampled_from(["&", "|"]), st.one_of(_efield, cmp), st.one_of(_efield, cmp)).map(list)
    neg = st.tuples(st.just("!"), st.one_of(_efield, cmp)).map(list)
    # NON-BOOLEAN roots (review r9 #1): arithmetic/field/literal-rooted
    # predicates take compile_predicate's truthiness wrapper — 0 is
    # truthy, null drops — which the renderer must mirror exactly
    return st.one_of(cmp, truthy, neg, a)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_pred(), min_size=2, max_size=6))
def test_fuzz_duckdb_equals_spark(rich_server, preds):
    for ast in preds:
        if not duckdb_find_safe(ast):
            continue
        got = rich_server._duck_find(ast)
        assert got is not None, ast
        assert sorted(got, key=lambda d: d["id"]) == _spark_find(rich_server, ast), ast


def test_pointer_module_matches_catalog(rich_server):
    from comlake_core_spark.catalog.pointer import current_pointer

    for table in ("dataset", "content"):
        assert current_pointer(rich_server.catalog.root, table) == rich_server.catalog._current_pointer(table)


def test_spark_tier_result_cache_and_invalidation(rich_server):
    """The last-resort Spark tier memoizes results per (catalog versions,
    AST): a repeat of a mixed-kind predicate is served from the cache,
    and a mutation (which, like every server mutation path, invalidates
    the snapshot AND the version memo) changes the key so the next find
    reflects the new data — the same single-writer consistency class as
    the snapshot export."""
    ast = ["==", [".", ["$"], "id"], "1"]  # mixed known kinds → Spark tier
    assert not snapshot_safe(ast) and not duckdb_find_safe(ast)
    rich_server._spark_find_cache.clear()
    rich_server._invalidate_snapshot()
    status, first = rich_server.op_find(ast)
    assert status == 200 and len(rich_server._spark_find_cache) == 1
    status, again = rich_server.op_find(ast)
    assert again == first
    (key,) = rich_server._spark_find_cache
    import io

    cid = rich_server.store.add(io.BytesIO(b"cache-inv\n"))
    rich_server.catalog.upsert_content(cid, "text/plain")
    rich_server._invalidate_snapshot()  # what op_save does after mutating
    status, after = rich_server.op_find(ast)
    assert status == 200 and after == first  # same predicate, same rows
    # but served under a NEW version key — the old entry is unreachable
    newest = [k for k in rich_server._spark_find_cache if k != key]
    assert newest and newest[0][1] > key[1]  # content version advanced


def test_spark_tier_marks_uncacheable_keys(rich_server):
    """A Spark-tier query whose result cannot be memoized (here: an
    execution error) records a nocache marker so concurrent followers
    fan out instead of serializing one full Spark job at a time behind
    the single-flight guard."""
    rich_server._spark_find_cache.clear()
    rich_server._spark_find_nocache.clear()
    ast = ["==", [".", ["$"], "parent"], ""]  # ANSI cast abort → failed query
    status, err = rich_server.op_find(ast)
    assert status == 400 and err == {"error": "failed query"}
    assert len(rich_server._spark_find_nocache) == 1
    assert not rich_server._spark_find_cache
    # and the marked key no longer takes the single-flight path (no
    # inflight entry is ever created for it)
    status, _ = rich_server.op_find(ast)
    assert status == 400 and not rich_server._spark_find_inflight
