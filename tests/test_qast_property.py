"""Property-based divergence testing: the Spark qast compiler vs the pure-
Python reference interpreter (qast/interp.py) on randomized typed ASTs —
the dual-backend regression strategy the reference's thesis describes
(eval.tex:199-205), automated with hypothesis.

ASTs are generated TYPED (numeric/string/bool/array subtrees) because the
language itself is dynamically typed but both backends must agree wherever
an expression is well-typed; mixing types exercises engine coercion corners
that the reference leaves undefined.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from comlake_core_spark.qast.compiler import compile_qast, default_resolver
from comlake_core_spark.qast.interp import eval_qast

# fixed row visible to both backends
ROW = {"a": 7, "b": -3, "x": 2.5, "s": "hello", "t": "world", "flag": True, "z": None}

nums = st.one_of(st.integers(min_value=-50, max_value=50), st.just(None))
small_nums = st.integers(min_value=1, max_value=9)
strs = st.sampled_from(["hello", "world", "foo", ""])


def num_field():
    return st.sampled_from([[".", ["$"], "a"], [".", ["$"], "b"], [".", ["$"], "z"]])


def num_expr(depth: int):
    if depth == 0:
        return st.one_of(nums, num_field())
    sub = num_expr(depth - 1)
    return st.one_of(
        nums,
        num_field(),
        st.tuples(st.sampled_from(["+", "-", "*"]), sub, sub).map(lambda t: [t[0], t[1], t[2]]),
        st.tuples(st.just("%"), sub, small_nums).map(lambda t: [t[0], t[1], t[2]]),
        st.tuples(st.just("-"), sub).map(lambda t: [t[0], t[1]]),
    )


def bool_expr(depth: int):
    n = num_expr(min(depth, 2))
    if depth == 0:
        base = st.tuples(st.sampled_from(["==", "!=", "<", "<=", ">", ">="]), n, n).map(
            lambda t: [t[0], t[1], t[2]]
        )
        return base
    sub = bool_expr(depth - 1)
    return st.one_of(
        st.tuples(st.sampled_from(["==", "<", ">="]), n, n, n).map(lambda t: [t[0], *t[1:]]),
        st.tuples(st.sampled_from(["&", "|"]), sub, sub).map(lambda t: [t[0], t[1], t[2]]),
        st.tuples(st.just("!"), sub).map(lambda t: [t[0], t[1]]),
        st.tuples(st.just("~"), st.sampled_from([[".", ["$"], "s"], [".", ["$"], "t"]]),
                  st.sampled_from(["h.*", ".*o", "w?orld", "[hw]ello"])).map(lambda t: [t[0], t[1], t[2]]),
    )


ASTS = st.lists(st.one_of(num_expr(2), bool_expr(2)), min_size=5, max_size=20)


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return float(v)
        return v
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return float(v) if abs(v) < 1e15 else v
    return v


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(ASTS)
def test_compiler_matches_interpreter(spark, asts):
    df = spark.createDataFrame(
        [tuple(ROW.values())],
        "a int, b int, x double, s string, t string, flag boolean, z int",
    )
    resolver = default_resolver(df.schema)
    cols = [compile_qast(ast, resolver=resolver, regex_mode="full").alias(f"c{i}") for i, ast in enumerate(asts)]
    spark_row = df.select(*cols).first()
    for i, ast in enumerate(asts):
        expected = eval_qast(ast, ROW, regex_mode="full")
        got = spark_row[f"c{i}"]
        if isinstance(expected, float) and isinstance(got, float):
            assert got == pytest.approx(expected, rel=1e-12), (ast, got, expected)
        else:
            assert normalize(got) == normalize(expected), (ast, got, expected)


@pytest.fixture(scope="module")
def spark_for_props(spark):
    return spark
