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


def _fnv1a64(token: str) -> int:
    """Stable 64-bit FNV-1a (unsigned) of a token."""
    h = 14695981039346656037
    for ch in token.encode("utf-8"):
        h = ((h ^ ch) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def make_simhash_udf(bits: int = 64):
    """64-bit SimHash: per-token stable FNV-1a hash, ±1 vote per bit, sign →
    signature bit.  A 64-way per-row bit reduction is the documented
    'genuinely needs a UDF' case (64 chained column expressions would blow
    up codegen); Arrow batching keeps transfer columnar.

    Vectorization: token hashes are computed once per *unique* token in the
    batch (the vocabulary is far smaller than the token stream), expanded to
    a ±1 bit matrix, and each document's signature is a numpy sum over its
    token rows — no per-character work in the document loop."""

    @pandas_udf("long")
    def simhash_udf(texts: pd.Series) -> pd.Series:
        token_lists = [(t or "").lower().split() for t in texts]
        vocab: dict[str, int] = {}
        for toks in token_lists:
            for tok in toks:
                if tok not in vocab:
                    vocab[tok] = len(vocab)
        if vocab:
            hashes = np.fromiter(
                (_fnv1a64(tok) for tok in vocab), dtype=np.uint64, count=len(vocab)
            )
            # votes[v, b] = +1 if bit b of hash(v) set else -1
            bit_idx = np.arange(bits, dtype=np.uint64)
            votes = np.where(
                ((hashes[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(bool), 1, -1
            ).astype(np.int64)
        out = np.zeros(len(texts), dtype=np.int64)
        weights = np.uint64(1) << np.arange(bits, dtype=np.uint64)
        for row_i, toks in enumerate(token_lists):
            if not toks:
                continue
            idx = np.fromiter((vocab[t] for t in toks), dtype=np.int64, count=len(toks))
            tally = votes[idx].sum(axis=0)
            out[row_i] = np.int64(weights[tally > 0].sum())
        return pd.Series(out)

    return simhash_udf


def make_hyperplane_bucket_udf(planes_t: "np.ndarray"):
    """Random-hyperplane LSH bucket id from an embedding: one
    (batch × dim) @ (dim × n_planes) matmul per Arrow batch against a
    driver-computed ±1 codebook, sign bits packed into a long.  A per-plane
    column-expression formulation needs n_planes × dim literal nodes in the
    plan (slow to analyze, interpreted at runtime); the codebook-in-closure
    matmul keeps both plan and runtime O(1)."""
    weights = (1 << np.arange(planes_t.shape[1])).astype(np.int64)

    @pandas_udf("long")
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        bits = (np.vstack(vecs.to_numpy()) @ planes_t) >= 0  # (batch, n_planes)
        return pd.Series(bits @ weights)

    return bucket_udf


def make_cosine_pair_udf():
    """Exact cosine over candidate pairs (the LSH verify step), vectorized:
    einsum dot + norms over the whole Arrow batch."""

    @pandas_udf("double")
    def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        av, bv = np.vstack(a.to_numpy()), np.vstack(b.to_numpy())
        num = np.einsum("ij,ij->i", av, bv)
        den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            return pd.Series(np.where(den == 0.0, 0.0, num / den))

    return cosine_udf


def make_weighted_mean_udaf():
    """Pandas grouped-agg UDF (UDAF surface): weight-averaged value.
    Series→scalar signature; Spark runs it per group with Arrow transfer."""

    @pandas_udf("double")
    def wmean(value: pd.Series, weight: pd.Series) -> float:
        # math.fsum = exact (correctly-rounded) sum of the double products,
        # independent of the nondeterministic row order the shuffle hands
        # each group — so the result is run-to-run stable and an exact-
        # decimal SQL oracle agrees to ~1 ulp (the workload rounds both
        # sides to 4 decimals, leaving ~6 orders of magnitude of margin).
        import math

        prod = (value * weight).to_numpy()
        return float(math.fsum(prod) / math.fsum(weight.to_numpy()))

    return wmean
