"""Join + aggregate fuzzing: randomized qast predicates over a REAL
orders ⋈ customer join, executed by Spark (compile_predicate on the joined
frame) and by DuckDB (qast_to_sql in the WHERE clause of the same join),
with a random GROUP BY and exact-decimal measures compared per group.

This composes every verified piece — the Spark compiler, the SQL renderer,
the join, and the aggregate — into whole random QUERIES, which is where
engines actually diverge (predicate placement around joins, null handling
through group-by, empty-group semantics). Grammar mirrors the engine-
agreement discipline: decimal sums cast to double, integer counts."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from comlake_core_spark.qast.compiler import compile_predicate, default_resolver
from comlake_core_spark.qast.sqlgen import qast_to_sql

SF = "/root/testdata/sf0.001"
KINDS = {
    "o_totalprice": "num",
    "o_orderstatus": "str",
    "o_orderpriority": "str",
    "c_acctbal": "num",
    "c_mktsegment": "str",
    "c_nationkey": "num",
}

num_fields = st.sampled_from([[".", ["$"], c] for c in ("o_totalprice", "c_acctbal", "c_nationkey")])
num_lits = st.one_of(
    st.integers(min_value=-1000, max_value=10_000),
    st.integers(min_value=50_000, max_value=400_000),
)
str_cmp = st.tuples(
    st.sampled_from(["==", "!="]),
    st.sampled_from([[".", ["$"], "o_orderstatus"], [".", ["$"], "c_mktsegment"]]),
    st.sampled_from(["O", "F", "BUILDING", "MACHINERY", "nope"]),
).map(lambda t: [t[0], t[1], t[2]])
num_cmp = st.tuples(
    st.sampled_from(["<", "<=", ">", ">=", "==", "!="]), num_fields, num_lits
).map(lambda t: [t[0], t[1], t[2]])


def preds(depth):
    if depth == 0:
        return st.one_of(num_cmp, str_cmp)
    sub = preds(depth - 1)
    return st.one_of(
        num_cmp,
        str_cmp,
        st.tuples(st.sampled_from(["&", "|"]), sub, sub).map(lambda t: [t[0], t[1], t[2]]),
        st.tuples(st.just("!"), sub).map(lambda t: [t[0], t[1]]),
    )


GROUPS = ["o_orderstatus", "o_orderpriority", "c_mktsegment", "c_nationkey"]

_CON = duckdb.connect()
_CON.sql(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
_CON.sql(f"CREATE VIEW customer AS SELECT * FROM '{SF}/customer.parquet'")


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(preds(2), st.sampled_from(GROUPS))
def test_join_agg_fuzz_matches_duckdb(spark, ast, group_col):
    od = spark.read.parquet(f"{SF}/orders.parquet")
    cu = spark.read.parquet(f"{SF}/customer.parquet")
    joined = od.join(cu, od["o_custkey"] == cu["c_custkey"])
    resolver = default_resolver(joined.schema)
    out = (
        joined.filter(compile_predicate(ast, resolver=resolver, regex_mode="partial"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("s"),
        )
    )
    got = {r[group_col]: (r["n"], r["s"]) for r in out.collect()}

    where = qast_to_sql(ast, KINDS, regex_mode="partial")
    sql = f"""
        SELECT {group_col}, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS s
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE {where}
        GROUP BY {group_col}
    """
    exp = {r[0]: (r[1], r[2]) for r in _CON.sql(sql).fetchall()}
    assert got == exp, (ast, group_col, got, exp)
