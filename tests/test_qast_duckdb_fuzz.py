"""sqllogictest-style cross-engine fuzzing: randomized qast expressions
evaluated by the pure-Python interpreter (qast/interp.py) AND by DuckDB via
the SQL renderer (qast/sqlgen.py), results compared exactly.

Together with tests/test_qast_property.py (Spark compiler vs interpreter)
this closes a three-implementation triangle — compiler ≡ interpreter ≡
DuckDB — the reference's dual-backend regression strategy
(thesis/main/eval.tex:199-205) extended by one more independent engine.
This leg runs WITHOUT Spark, so it affords an order of magnitude more
examples per run than the Spark leg.
"""

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from comlake_core_spark.qast.interp import eval_qast
from comlake_core_spark.qast.sqlgen import qast_to_sql

ROW = {"a": 7, "b": -3, "x": 2.5, "s": "hello", "t": "world", "flag": True, "z": None}
KINDS = {"a": "num", "b": "num", "x": "num", "s": "str", "t": "str", "flag": "bool", "z": "num"}

nums = st.one_of(st.integers(min_value=-50, max_value=50), st.just(None))
small_nums = st.integers(min_value=-9, max_value=9)  # 0 included: both sides must null out


def num_field():
    return st.sampled_from(
        [[".", ["$"], "a"], [".", ["$"], "b"], [".", ["$"], "x"], [".", ["$"], "z"]]
    )


def num_expr(depth: int):
    if depth == 0:
        return st.one_of(nums, num_field())
    sub = num_expr(depth - 1)
    return st.one_of(
        nums,
        num_field(),
        st.tuples(st.sampled_from(["+", "-", "*"]), sub, sub).map(lambda t: [t[0], t[1], t[2]]),
        st.tuples(st.just("%"), sub, small_nums).map(lambda t: [t[0], t[1], t[2]]),
        st.tuples(st.just("/"), sub, sub).map(lambda t: [t[0], t[1], t[2]]),
        st.tuples(st.just("-"), sub).map(lambda t: [t[0], t[1]]),
    )


# an empty JSON array is NOT a valid qast expression (both engines raise),
# so generated array literals have at least one element
int_arrays = st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=5)


def bool_expr(depth: int):
    n = num_expr(min(depth, 2))
    if depth == 0:
        return st.tuples(st.sampled_from(["==", "!=", "<", "<=", ">", ">="]), n, n).map(
            lambda t: [t[0], t[1], t[2]]
        )
    sub = bool_expr(depth - 1)
    return st.one_of(
        st.tuples(st.sampled_from(["==", "<", ">="]), n, n, n).map(lambda t: [t[0], *t[1:]]),
        st.tuples(st.sampled_from(["&", "|"]), sub, sub).map(lambda t: [t[0], t[1], t[2]]),
        st.tuples(st.just("!"), sub).map(lambda t: [t[0], t[1]]),
        st.tuples(
            st.just("~"),
            st.sampled_from([[".", ["$"], "s"], [".", ["$"], "t"]]),
            st.sampled_from(["h.*", ".*o", "w?orld", "[hw]ello"]),
        ).map(lambda t: [t[0], t[1], t[2]]),
        st.tuples(st.just("&&"), int_arrays, int_arrays).map(lambda t: [t[0], t[1], t[2]]),
    )


ASTS = st.one_of(num_expr(3), bool_expr(3))

_CON = duckdb.connect()
_CON.sql(
    "CREATE VIEW row1 AS SELECT 7 AS a, -3 AS b, CAST(2.5 AS DOUBLE) AS x, "
    "'hello' AS s, 'world' AS t, TRUE AS flag, CAST(NULL AS INTEGER) AS z"
)


def duck_eval(ast, mode="full"):
    sql = qast_to_sql(ast, KINDS, regex_mode=mode)
    return _CON.sql(f"SELECT {sql} FROM row1").fetchone()[0]


def norm(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float)):
        if isinstance(v, float) and math.isnan(v):
            return "nan"
        return float(v)
    return v


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(ASTS)
def test_interpreter_matches_duckdb(ast):
    expected = eval_qast(ast, ROW, regex_mode="full")
    got = duck_eval(ast, "full")
    if isinstance(expected, float) and isinstance(got, float):
        assert got == pytest.approx(expected, rel=1e-12), (ast, got, expected)
    else:
        assert norm(got) == norm(expected), (ast, got, expected)


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.sampled_from([[".", ["$"], "s"], [".", ["$"], "t"]]),
    st.sampled_from(["h.*", "ell", "^w", "o$", "l+", "xyz"]),
)
def test_partial_regex_matches_duckdb(field, pat):
    ast = ["~", field, pat]
    assert duck_eval(ast, "partial") == eval_qast(ast, ROW, regex_mode="partial")


def test_renderer_examples():
    # spot-pins: rendered SQL stays human-auditable
    assert qast_to_sql(["==", [".", ["$"], "a"], 7], KINDS) == '("a" = 7)'
    assert (
        qast_to_sql(["&", ["<", 1, 2], [".", ["$"], "flag"]], KINDS)
        == '(COALESCE((1 < 2), FALSE) AND COALESCE("flag", FALSE))'
    )
    assert qast_to_sql(["%", 7, 0], KINDS) == "(7 % NULLIF(0, 0))"


def test_missing_field_renders_null():
    assert eval_qast([".", ["$"], "nope"], ROW) is None
    assert duck_eval([".", ["$"], "nope"]) is None
