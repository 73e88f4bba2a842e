"""Embedding-distribution drift between corpus snapshots: per-label
centroid cosine, exact-decimal so a SQL oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.session import sql_ident


def centroid_drift(
    df: DataFrame,
    split: Column,
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
    quantize: int = 9,
) -> DataFrame:
    """Embedding-distribution drift between two corpus snapshots: per
    label, the cosine between the split-0 and split-1 centroids (plus
    both counts).  The monitor a training pipeline runs on every refresh
    — a label whose centroid swings (cosine well below 1) means the new
    crawl changed what that class LOOKS like, so downstream thresholds
    (dedup radii, quality cutoffs, retrieval calibrations) need
    re-validation before the refresh ships.

    Determinism (the oracle requirement): per-dimension component sums
    are exact decimals on the ``quantize`` grid, centroids divide once
    in float64, and the three dot products fold rounded products through
    exact decimal addition — no float reassociation anywhere, so the
    cosine hash-matches a SQL oracle.

    Scale shape: ONE map-combined aggregate with 64 decimal-sum columns
    (no explode — shuffle volume is #labels × #splits rows of 64 sums),
    then a #labels-row self-join.  At 100 TB the whole reduction is the
    cost of one scan."""

    # Wide generated expressions are built as SQL strings through ONE
    # F.expr each (r14): the Column-API construction of 64-dim sums,
    # 130 pivot picks, 128 divisions and 64 product structs cost ~32k
    # py4j round trips — 3.3 s of pure driver latency per run (cProfile:
    # 32,458 socket recv calls inside fn()).  One parsed SQL string per
    # output column is the identical expression tree at ~200 round trips.
    q = quantize
    vq = sql_ident(vec_col)  # ADVICE r14: quote the interpolated identifier

    def comp(i: int) -> str:
        return f"round(cast(element_at({vq}, {i + 1}) as double), {q})"

    g = df.groupBy(F.col(label_col).alias("label"), split.alias("_par")).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.expr(f"sum(cast({comp(i)} as decimal(20,{q}))) as _s{i}")
            for i in range(dim)
        ],
    )

    # pivot the two splits side-by-side with ONE #labels-row aggregate
    # instead of a self-join of two filters of g (r14, guide §3.3): the
    # join shape duplicated g's 64-sum subtree in the logical plan and
    # re-analyzed ~130 aliased columns per side — 3.3 s of constant
    # driver time per run at any data size (the r14-entry A/B pinned the
    # build as plan analysis: 100× data moved it 3.28 → 3.60 s only).
    # max(when) over the (label, split) rows carries each split's exact
    # decimal sums unchanged, so centroids, products, and the cosine are
    # bit-identical; labels missing either split drop exactly as the
    # inner join dropped them.
    def pick(par: int, col: str, out: str) -> str:
        return f"max(case when _par = {par} then {col} end) as {out}"

    wide = g.groupBy("label").agg(
        F.expr(pick(0, "_n", "n_a")),
        F.expr(pick(1, "_n", "n_b")),
        *[F.expr(pick(0, f"_s{i}", f"_sa{i}")) for i in range(dim)],
        *[F.expr(pick(1, f"_s{i}", f"_sb{i}")) for i in range(dim)],
    ).filter("n_a is not null and n_b is not null")
    joined = wide.selectExpr(
        "label",
        "n_a",
        "n_b",
        *[f"cast(_sa{i} as double) / n_a as _a{i}" for i in range(dim)],
        *[f"cast(_sb{i} as double) / n_b as _b{i}" for i in range(dim)],
    )

    # Dot products fold through F.sum over exploded per-dimension terms:
    # a CHAINED decimal `+` hits Spark's 38-digit precision cap after a
    # few dozen adds and silently sheds scale (allowPrecisionLoss), while
    # an aggregate sum widens precision without touching scale — the only
    # exact way to add 64 decimals in one expression tree.
    def term(i: int) -> str:
        def p(x: str, y: str) -> str:
            return f"cast(round(_{x}{i} * _{y}{i}, {q}) as decimal(20,{q}))"

        return (
            f"struct({p('a', 'b')} as ab, {p('a', 'a')} as aa, {p('b', 'b')} as bb)"
        )

    terms = ", ".join(term(i) for i in range(dim))
    prods = joined.select(
        "label", "n_a", "n_b", F.expr(f"explode(array({terms}))").alias("_p")
    )
    dots = prods.groupBy("label").agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.sum("_p.ab").cast("double").alias("_ab"),
        F.sum("_p.aa").cast("double").alias("_aa"),
        F.sum("_p.bb").cast("double").alias("_bb"),
    )
    return dots.select(
        "label",
        "n_a",
        "n_b",
        F.round(
            F.col("_ab") / (F.sqrt("_aa") * F.sqrt("_bb")), quantize
        ).alias("drift_cosine"),
    )

