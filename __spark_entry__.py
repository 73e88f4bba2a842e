"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual workload registry lives in ``comlake_core_spark.workloads``;
this file is the thin adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _registry():
    from comlake_core_spark.workloads import REGISTRY

    return REGISTRY


def _ordered_names():
    """Registry names with the curated DRIVER_WINDOW first (the driver
    verifies the first 50 queries() entries per round; the window rotates
    each round so every workload eventually gets a driver-green row —
    see workloads.DRIVER_WINDOW)."""
    from comlake_core_spark.workloads import ordered_names

    return ordered_names()


def _apply_session_confs(spark: SparkSession) -> None:
    """Session confs the workloads assume; the driver builds its own bare
    SparkSession, so the engine's session.py defaults must be re-applied
    here (VERDICT r1 #3: parquet TIMESTAMP_NTZ breaks withWatermark)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: multi-join revenue rollup
    (customer ⋈ orders ⋈ lineitem ⋈ nation with broadcast dims)."""
    _apply_session_confs(spark)
    return _registry()["join_revenue_by_nation"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §7 Phase 4
    extensions). Each callable takes (spark, sf_dir) and returns a DataFrame."""

    def make(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _apply_session_confs(spark)
            return _registry()[name].fn(spark, sf_dir)

        run.__name__ = f"query_{name}"
        return run

    return {name: make(name) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    registry = _registry()
    return {
        name: registry[name].oracle
        for name in _ordered_names()
        if registry[name].oracle is not None
    }
