"""Winnowing substring fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003) — the position-robust k-gram sketch behind substring-level
near-dup detection (operators/dedup/spans.py builds the pair join on it).
Map-only: transform over a sequence of positions, windowed array_min;
no shuffle, no Python workers."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def winnow_fingerprints(
    text: Column | str, k: int = 8, w: int = 4, hasher: str = "xxhash64"
) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): hash every character k-gram of the normalized text, then
    keep the minimum hash of each window of w consecutive k-grams, distinct.
    Guarantee: any match of at least w+k-1 normalized characters between two
    documents yields at least one shared fingerprint, so the selected set is
    a position-robust sketch for substring-level near-dup detection —
    stronger than the whole-document md5 `fingerprint` (one edit anywhere
    changes that) and finer-grained than MinHash over word shingles.

    Entirely JVM-side — `transform` over a `sequence` of positions with
    `xxhash64` k-gram hashing, then windowed `array_min` — so at 100 TB this
    is a map-only job: no shuffle, no Python workers. (We take the per-window
    min *value* rather than the paper's rightmost-min tiebreak; the coverage
    guarantee is unchanged.)

    The normalized text and the gram array are bound ONCE via the
    expression-level let `transform(array(x), f)[0]`: Catalyst does no
    common-subexpression elimination across lambda bodies, so inlining the
    gram array into the window lambda would re-evaluate it (regex included)
    per window position — O(n^2) per document instead of O(n*w).

    ``hasher``: 'xxhash64' (default — fastest, a JVM intrinsic) or 'md5'
    (first 15 hex chars of md5 as a base-16 long; slower but md5 has an
    identical twin in DuckDB, so an md5-mode run is SQL-oracle-checkable
    end to end — same selection logic, swapped hash primitive)."""
    c = F.col(text) if isinstance(text, str) else text
    empty = F.array().cast("array<bigint>")
    if hasher == "xxhash64":
        gram_hash = lambda g: F.xxhash64(g)  # noqa: E731
    elif hasher == "md5":
        gram_hash = lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")  # noqa: E731
    else:
        raise ValueError(f"unknown hasher {hasher!r}")

    def _bind(col: Column, f) -> Column:
        return F.transform(F.array(col), f)[0]

    def _grams(nm: Column) -> Column:
        n = F.length(nm)
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: gram_hash(nm.substr(i, F.lit(k))),
            ),
        ).otherwise(empty)

    def _select(g: Column) -> Column:
        m = F.size(g)
        return (
            F.when(
                m >= w,
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), m - w + 1),
                        lambda j: F.array_min(F.slice(g, j, w)),
                    )
                ),
            )
            .when(m > 0, F.array(F.array_min(g)))
            .otherwise(empty)
        )

    norm = F.regexp_replace(F.lower(c), r"[^a-z0-9]+", "")
    return _bind(norm, lambda nm: _bind(_grams(nm), _select))
