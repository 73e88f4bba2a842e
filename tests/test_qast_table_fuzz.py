"""Predicate fuzzing against a REAL table: randomized qast predicates are
compiled by the Spark compiler and filtered over orders.parquet, while the
SQL renderer runs the same predicates as DuckDB WHERE clauses on the same
file — selected-row COUNTS must agree exactly.

This closes the gap the row1-based fuzz (test_qast_duckdb_fuzz.py) leaves
open: real column types (DECIMAL totalprice, BIGINT keys, VARCHAR status),
real NULL-free-but-typed data, and the compile_predicate truthiness path
that production find/extract actually use. All predicates per example are
evaluated in ONE Spark pass (each becomes a conditional-count aggregate
column), so 20 predicates cost one scan, not twenty."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from comlake_core_spark.qast.compiler import compile_predicate, default_resolver
from comlake_core_spark.qast.sqlgen import qast_to_sql

SF_PARQUET = "/root/testdata/sf0.001/orders.parquet"
KINDS = {
    "o_orderkey": "num",
    "o_custkey": "num",
    "o_totalprice": "num",
    "o_orderstatus": "str",
    "o_orderpriority": "str",
}

num_fields = st.sampled_from(
    [[".", ["$"], c] for c in ("o_orderkey", "o_custkey", "o_totalprice")]
)
num_lits = st.one_of(
    st.integers(min_value=0, max_value=2000),
    st.integers(min_value=50_000, max_value=400_000),
)
str_fields = st.sampled_from([[".", ["$"], c] for c in ("o_orderstatus", "o_orderpriority")])
str_lits = st.sampled_from(["O", "F", "P", "1-URGENT", "3-MEDIUM", "5-LOW", "nope"])


def cmp_pred():
    num_cmp = st.tuples(
        st.sampled_from(["==", "!=", "<", "<=", ">", ">="]), num_fields, num_lits
    ).map(lambda t: [t[0], t[1], t[2]])
    str_cmp = st.tuples(st.sampled_from(["==", "!="]), str_fields, str_lits).map(
        lambda t: [t[0], t[1], t[2]]
    )
    regex = st.tuples(
        st.just("~"), str_fields, st.sampled_from(["1.*", ".*URGENT", "[OF]", "2-.*"])
    ).map(lambda t: [t[0], t[1], t[2]])
    return st.one_of(num_cmp, str_cmp, regex)


def preds(depth: int):
    if depth == 0:
        return cmp_pred()
    sub = preds(depth - 1)
    return st.one_of(
        cmp_pred(),
        st.tuples(st.sampled_from(["&", "|"]), sub, sub).map(lambda t: [t[0], t[1], t[2]]),
        st.tuples(st.just("!"), sub).map(lambda t: [t[0], t[1]]),
    )


PREDS = st.lists(preds(2), min_size=3, max_size=20)

_CON = duckdb.connect()
_CON.sql(f"CREATE VIEW orders AS SELECT * FROM '{SF_PARQUET}'")


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(PREDS)
def test_predicate_counts_match_duckdb(spark, asts):
    df = spark.read.parquet(SF_PARQUET)
    resolver = default_resolver(df.schema)
    aggs = [
        F.sum(
            F.when(compile_predicate(ast, resolver=resolver, regex_mode="partial"), 1).otherwise(0)
        ).alias(f"c{i}")
        for i, ast in enumerate(asts)
    ]
    spark_counts = df.agg(*aggs).first()
    for i, ast in enumerate(asts):
        where = qast_to_sql(ast, KINDS, regex_mode="partial")
        duck_n = _CON.sql(f"SELECT COUNT(*) FROM orders WHERE {where}").fetchone()[0]
        assert spark_counts[f"c{i}"] == duck_n, (ast, where, spark_counts[f"c{i}"], duck_n)


def test_predicate_fuzz_is_nontrivial(spark):
    # sanity that the grammar actually selects rows sometimes (a fuzz that
    # always counts 0 proves nothing)
    df = spark.read.parquet(SF_PARQUET)
    ast = ["&", [">", [".", ["$"], "o_totalprice"], 100_000], ["~", [".", ["$"], "o_orderpriority"], "1.*"]]
    resolver = default_resolver(df.schema)
    n = df.filter(compile_predicate(ast, resolver=resolver, regex_mode="partial")).count()
    assert n > 0
