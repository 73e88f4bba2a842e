"""Vectorized (Arrow-batched) Pandas UDFs.

NOTE: no ``from __future__ import annotations`` here — pyspark infers the
UDF eval type from *resolved* type hints, so the annotations must be real
objects at decoration time.

These are the engine's only Python-side row computations; everything else is
JVM built-ins. Each UDF documents why a column expression can't express it.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_simhash_udf(bits: int = 64):
    """64-bit SimHash: per-token stable FNV-1a hash, ±1 vote per bit, sign →
    signature bit.  A 64-way per-row bit reduction is the documented
    'genuinely needs a UDF' case (64 chained column expressions would blow
    up codegen); Arrow batching keeps transfer columnar."""

    @pandas_udf("long")
    def simhash_udf(texts: pd.Series) -> pd.Series:
        fnv_offset = np.uint64(14695981039346656037)
        fnv_prime = np.uint64(1099511628211)
        bit_idx = np.arange(bits, dtype=np.uint64)
        out = np.zeros(len(texts), dtype=np.int64)
        for row_i, text in enumerate(texts):
            votes = np.zeros(bits, dtype=np.int64)
            for tok in (text or "").lower().split():
                h = fnv_offset
                for ch in tok.encode("utf-8"):
                    h = np.uint64((h ^ np.uint64(ch)) * fnv_prime)
                bitvals = (h >> bit_idx) & np.uint64(1)
                votes += np.where(bitvals.astype(bool), 1, -1)
            sig = np.uint64(0)
            one = np.uint64(1)
            for b in range(bits):
                if votes[b] > 0:
                    sig |= one << np.uint64(b)
            out[row_i] = np.int64(sig)
        return pd.Series(out)

    return simhash_udf
