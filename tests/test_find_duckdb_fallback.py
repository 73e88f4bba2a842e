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
from comlake_core_spark.server import (
    ComlakeServer,
    duckdb_find_safe,
    find_static_status,
    normalize_find_ast,
    snapshot_safe,
)
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
    """A Java-regex construct RE2 rejects at parse time (\\Z) passes the
    convergence gate (RE2 can't read it differently — it can't read it at
    all), errors inside DuckDB, and lands on the Spark path with the
    right answer instead of a 500."""
    ast = ["~", [".", ["$"], "description"], r"d\Z"]
    assert duckdb_find_safe(ast)
    status, hits = rich_server.op_find(ast)
    assert status == 200
    assert sorted(hits, key=lambda d: d["id"]) == _spark_find(rich_server, ast)


def test_divergent_regex_rejected_statically(rich_server):
    """Constructs that PARSE in both engines with different readings —
    backreference-vs-octal, inline flags, unknown POSIX classes, Java
    class intersection — are refused by the gate so the Spark reading is
    the only one ever served (ADVICE r9 #1)."""
    for pat in (r"(d)\1", "(?i)abc", "[[:ascii:]]", "[a-z&&b]", "a$b"):
        ast = ["~", [".", ["$"], "description"], pat]
        assert not duckdb_find_safe(ast), pat
        status, hits = rich_server.op_find(ast)  # Spark path still serves it
        assert status == 200
        assert sorted(hits, key=lambda d: d["id"]) == _spark_find(rich_server, ast)
    # convergent spellings still take the DuckDB tier
    assert duckdb_find_safe(["~", [".", ["$"], "description"], "[[:alpha:]]+$"])
    # \s re-spells for RE2 (Java's includes \x0B, RE2's doesn't) and
    # [\b] (Java error / Python backspace) is refused — review r10 #3/#4
    from comlake_core_spark.qast.regex_dialect import to_python_re, to_re2

    assert duckdb_find_safe(["~", [".", ["$"], "description"], r"d\s?"])
    assert "x0B" in to_re2(r"a\sb", "partial")
    assert to_re2(r"[\b]", "partial") is None
    assert to_python_re(r"[\b]", "partial") is None
    assert not snapshot_safe(["~", [".", ["$"], "description"], r"[\b]"])


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


#: numeric-ish string literals, the parse-edge zoo: Spark's ANSI
#: toLongExact/double-cast semantics must survive the fold verbatim
_numish = st.sampled_from(
    ["1", "3", " 9", "+2", "-7", "0003", "2.5", ".5", "1e2", "1.5e-1",
     "9223372036854775807"]
)
_numside = st.one_of(
    st.sampled_from([[".", ["$"], "id"], [".", ["$"], "parent"]]),
    st.sampled_from([0, 1, 3, 2.5]),
    st.tuples(st.sampled_from(["+", "-", "*", "/"]),
              st.just([".", ["$"], "id"]), st.sampled_from([1, 2, 2.0])).map(list),
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.sampled_from(["==", "!=", "<", "<=", ">", ">="]),
    _numside,
    _numish,
    st.booleans(),
)
def test_fuzz_normalize_preserves_spark_semantics(rich_server, op, numside, lit, flip):
    """normalize_find_ast's literal fold must be Catalyst's own constant
    fold verbatim: the Spark path run on the ORIGINAL ast and on the
    NORMALIZED ast must return identical rows (or both fail), and when
    the fold fires, the served op_find answer must match Spark's."""
    ast = [op, lit, numside] if flip else [op, numside, lit]
    norm = normalize_find_ast(ast)
    try:
        want = _spark_find(rich_server, ast)
    except Exception:
        # original errors (e.g. bigint side vs decimal literal) → the
        # fold must NOT have fired, and the endpoint answers 400
        assert norm == ast, ast
        assert rich_server.op_find(ast)[0] == 400
        return
    assert _spark_find(rich_server, norm) == want, (ast, norm)
    status, hits = rich_server.op_find(ast)
    assert status == 200
    assert sorted(hits, key=lambda d: d["id"]) == want, (ast, norm)


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
    # a multi-operand mixed chain: each PAIR coerces independently in
    # Spark ("1" acts as a number against id and as a string against
    # "1"), so normalize_find_ast deliberately leaves it alone and it
    # lands on the Spark tier (the 2-operand form is normalized and
    # snapshot-served — test_mixed_literal_normalization)
    ast = ["==", [".", ["$"], "id"], "1", "1"]
    assert normalize_find_ast(ast) == ast
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


def test_failed_queries_negative_cached(rich_server):
    """ADVICE r9 #3: a deterministic 400 is memoized under its
    version-scoped key, so a client retrying one bad query answers from
    memory instead of re-running a full Spark job per retry."""
    rich_server._spark_find_cache.clear()
    rich_server._spark_find_err_cache.clear()
    ast = ["==", [".", ["$"], "parent"], ""]  # ANSI cast abort
    status, err = rich_server.op_find(ast)
    assert status == 400 and len(rich_server._spark_find_err_cache) == 1
    # second call must not reach Spark: poison catalog.find to prove it
    real = rich_server.catalog.find
    rich_server.catalog.find = lambda *_: (_ for _ in ()).throw(AssertionError("spark reached"))
    try:
        status, again = rich_server.op_find(ast)
    finally:
        rich_server.catalog.find = real
    assert status == 400 and again == err


# ---------------------------------------------------------------------------
# VERDICT r9 #4: the two former residual classes
# ---------------------------------------------------------------------------


def test_mixed_literal_normalization(rich_server):
    """A 2-operand comparison of a numeric node against a string LITERAL
    folds the literal exactly like Catalyst's ANSI constant fold, making
    the predicate single-kind (snapshot/DuckDB-servable). Unfoldable
    literals and string COLUMNS against numbers stay on the Spark path."""
    # folded: bigint side → toLongExact syntax
    assert normalize_find_ast(["==", [".", ["$"], "id"], "1"]) == [
        "==", [".", ["$"], "id"], 1]
    assert normalize_find_ast(["<", " +42 ", [".", ["$"], "parent"]]) == [
        "<", 42, [".", ["$"], "parent"]]
    # folded: double side (arithmetic / float literal)
    assert normalize_find_ast([">", ["/", [".", ["$"], "id"], 2], "1.5"]) == [
        ">", ["/", [".", ["$"], "id"], 2], 1.5]
    # NOT folded: decimal syntax against a BIGINT side (toLongExact rejects
    # '5.0'; DuckDB's cast would round — the class that cannot be served
    # off-Spark), underscores, overflow, empty
    for lit in ("5.0", "1_0", "9223372036854775808", "", "abc"):
        ast = ["==", [".", ["$"], "id"], lit]
        assert normalize_find_ast(ast) == ast, lit
        assert not snapshot_safe(ast) and not duckdb_find_safe(ast)
    # NOT folded: string COLUMN vs number (per-row error depends on data)
    ast = ["==", [".", ["$"], "description"], 5]
    assert normalize_find_ast(ast) == ast
    # NOT folded: multi-operand chain (pairwise coercion)
    ast = ["<", 1, "2", "10"]
    assert normalize_find_ast(ast) == ast
    # end-to-end: the folded form is snapshot-servable and matches Spark
    ast = ["==", [".", ["$"], "id"], "1"]
    norm = normalize_find_ast(ast)
    assert snapshot_safe(norm)
    status, hits = rich_server.op_find(ast)
    assert status == 200
    assert sorted(hits, key=lambda d: d["id"]) == _spark_find(rich_server, ast)


def test_nested_fixed_path_static_400(rich_server):
    """A nested path under a fixed scalar column AnalysisExceptions on
    the Spark path no matter where it sits in the predicate — the static
    gate answers the same 400 without a Spark job on both the primary
    and the read workers."""
    for ast in (
        ["==", [".", ["$"], "description", "x"], "v"],
        ["==", [".", ["$"], "id", "x"], 1],
        ["|", True, ["==", [".", ["$"], "parent", "deep", "er"], 1]],
    ):
        assert find_static_status(ast) == (400, {"error": "failed query"})
        # parity with what Spark itself produces (the AnalysisException
        # fires while BUILDING the plan — before any execution)
        with pytest.raises(Exception):
            rich_server.catalog.find(ast).collect()
        assert rich_server.op_find(ast) == (400, {"error": "failed query"})
    # malformed ASTs keep their QastError body (compile-before-analysis)
    bad = ["%", [".", ["$"], "id", "x"], 1, 2]  # wrong arity + nested fixed
    assert find_static_status(bad) == (400, {"error": "malformed query"})
    # dynamic extras paths and plain fixed columns are untouched
    assert find_static_status(["==", [".", ["$"], "props", "n"], "1"]) is None
    assert find_static_status(["==", [".", ["$"], "id"], 1]) is None
