#!/usr/bin/env python
"""Faithful simulation of the external driver's CORRECTNESS gate.

The local mirror (tests/test_driver_contract.py) canonicalizes by repr,
which is stricter in some ways but MISSES the one failure class the driver
has actually produced: its canonicalizer calls pandas ``sort_values`` over
every result column, which raises ``TypeError: unhashable type:
'numpy.ndarray'`` on ARRAY-typed output columns (CORRECTNESS_r04
``array_functions``).  This script replicates that exact canonicalization
(toPandas → sort_values on all columns → value hash) for the first-50
window at the driver's sf0.01, so a shape that would go red under the
driver is caught before the round ends.

Usage: python scripts/driver_sim.py [names...]   (default: DRIVER_WINDOW)
"""

from __future__ import annotations

import hashlib
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from comlake_core_spark.session import get_spark
from comlake_core_spark.workloads import DRIVER_WINDOW, REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    """Driver-style canonical form: sorted column order, sort_values over
    every column (this is where ARRAY columns explode), stable string
    render, sha256."""
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    rendered = df.round(6).to_csv(index=False) if len(df) else ",".join(cols)
    return len(df), cols, hashlib.sha256(rendered.encode()).hexdigest()


def main() -> None:
    names = sys.argv[1:] or list(DRIVER_WINDOW)
    spark = get_spark("driver-sim")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    ok = bad = 0
    for name in names:
        wl = REGISTRY[name]
        try:
            sdf = wl.fn(spark, SF_DIR)
            spdf = sdf.toPandas()
            s_rows, s_cols, s_hash = _canon(spdf)
            o_rows = o_cols = o_hash = None
            if wl.oracle is not None:
                odf = con.sql(wl.oracle).df()
                o_rows, o_cols, o_hash = _canon(odf)
            status = (
                "PASS"
                if wl.oracle is None or (s_rows == o_rows and s_cols == o_cols and s_hash == o_hash)
                else "HASH-DIFF" if (s_rows == o_rows and s_cols == o_cols) else "SHAPE-DIFF"
            )
        except Exception:
            status = "ERROR"
            print(f"{name}: ERROR\n{traceback.format_exc()}")
        if status == "PASS":
            ok += 1
        else:
            bad += 1
            if status != "ERROR":
                print(f"{name}: {status} spark=({s_rows},{s_cols[:4]}...) oracle=({o_rows},{o_cols[:4] if o_cols else None}...)")
        print(f"{name}: {status}", flush=True)
    print(f"\n{ok} pass / {bad} fail of {len(names)}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
