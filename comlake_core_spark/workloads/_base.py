"""Workload dataclass, REGISTRY, the @workload decorator, and shared helpers."""
from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from comlake_core_spark.session import tables

@dataclass
class Workload:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)



REGISTRY: dict[str, Workload] = {}



def workload(name: str, oracle: str | None, *tags: str):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Workload(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco



def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    loaded = tables(spark, sf_dir, names)
    missing = [n for n in names if n not in loaded]
    if missing:
        raise FileNotFoundError(f"tables {missing} not found under {sf_dir!r}")
    return [loaded[n] for n in names]



def dec(col, p: int = 12, s: int = 2):
    """Exact-decimal cast for engine-agreement on sums (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")
