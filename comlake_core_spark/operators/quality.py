"""Data-quality constraint checking over lake tables.

The reference validates only request shapes at its HTTP boundary
(SURVEY.md §2.3 — schema of /dataset bodies); it has no data-level
constraint surface. At 100 TB ingest, declarative expectations are what
stand between a bad upstream drop and a poisoned corpus, so this module
adds the two shapes that cover most of them:

- `check(df, rules)`: row-level predicates (non-null, ranges, domains,
  regex shapes). ALL rules are evaluated in ONE scan — each rule becomes
  a conditional count in a single aggregate (map-side combined), and the
  one-row result is unpivoted to (rule, n_violations) rows. Adding a rule
  adds a column to the agg, not a pass over the data.
- `fk_violations(fact, key, dim, dim_key)`: referential integrity via
  LEFT ANTI join — one shuffle (or broadcast when the dim is small
  enough), counting fact rows whose key has no match.

A row violates a rule when its predicate is not TRUE (null predicate =
violation — an unknown can't prove validity). Violation COUNTS, not
violating rows, are the output: counts aggregate safely at any scale and
are what a pipeline gate thresholds on; sampling actual offenders is a
follow-up filter with the same predicate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass(frozen=True)
class Rule:
    """A named row-level expectation: `pred` must be TRUE for valid rows."""

    name: str
    pred: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Rule:
    return Rule(f"range_{col}", F.col(col).between(lo, hi))


def in_domain(col: str, values: tuple) -> Rule:
    return Rule(f"domain_{col}", F.col(col).isin(*values))


def matches(col: str, pattern: str) -> Rule:
    return Rule(f"shape_{col}", F.col(col).rlike(pattern))


def unique_key(df: DataFrame, *cols: str) -> DataFrame:
    """(rule, n_violations) for key uniqueness: counts rows BEYOND the
    first per key — one map-side-combined aggregation on the key."""
    dupes = (
        df.groupBy(*cols)
        .agg((F.count(F.lit(1)) - 1).alias("_extra"))
        .agg(F.sum("_extra").alias("n_violations"))
    )
    return dupes.select(
        F.lit("unique_" + "_".join(cols)).alias("rule"),
        F.coalesce(F.col("n_violations"), F.lit(0)).cast("long").alias("n_violations"),
    )


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule, n_violations) for every rule, in one scan of df."""
    aggs = [
        F.coalesce(
            F.sum(F.when(~F.coalesce(r.pred, F.lit(False)), F.lit(1)).otherwise(F.lit(0))),
            F.lit(0),
        ).alias(r.name)
        for r in rules
    ]
    one_row = df.agg(*aggs)
    stack_args = ", ".join(f"'{r.name}', `{r.name}`" for r in rules)
    return one_row.selectExpr(
        f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
    ).select("rule", F.col("n_violations").cast("long"))


def observed_check(df: DataFrame, rules: list[Rule], name: str = "dq"):
    """Attach the rule counters to a DataFrame as OBSERVED metrics:
    returns (df', observation). Unlike check(), this adds NO extra pass —
    the counters ride along with whatever action the pipeline runs next
    (the write, the aggregate, anything), and observation.get yields
    {rule_name: n_violations, "_rows": n} afterwards.

    This is the production shape for inline gating at 100 TB: the ingest
    job writes its output once, and the violation counts come out of the
    SAME scan for free; check() remains the standalone audit that scans
    on demand."""
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("_rows")] + [
        F.coalesce(
            F.sum(F.when(~F.coalesce(r.pred, F.lit(False)), F.lit(1)).otherwise(F.lit(0))),
            F.lit(0),
        ).alias(r.name)
        for r in rules
    ]
    return df.observe(obs, *metrics), obs


def fk_violations(fact: DataFrame, key: str, dim: DataFrame, dim_key: str) -> DataFrame:
    """(rule, n_violations) for the foreign key fact[key] → dim[dim_key]."""
    orphans = fact.join(
        dim.select(F.col(dim_key).alias(key)).distinct(), key, "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
        F.lit(f"fk_{key}").alias("rule"), F.col("n_violations").cast("long")
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style column statistics in ONE scan: per column the row
    count, null count, exact distinct count, and min/max (cast to double
    — the profiler targets numeric columns; engine-portable string
    formatting of extremes does not exist). The long (column-per-row)
    shape is what a catalog stats table stores and what a cost-based
    optimizer consumes.

    Plan: one aggregate pass computes every per-column statistic
    (count-distincts expand internally but still read the input once);
    the wide row is then exploded to the long shape map-side. At 100 TB
    swap exact distinct for approx_count_distinct and this is exactly
    Spark's own ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS —
    the exact form is kept because it is oracle-checkable."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"_n_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"_dist_{c}"),
            F.min(F.col(c)).cast("double").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("double").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_n_{c}").cast("long").alias("n_rows"),
                F.col(f"_nulls_{c}").cast("long").alias("n_nulls"),
                F.col(f"_dist_{c}").cast("long").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(entries).alias("_s")).select("_s.*")


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 3,
    quantize: int = 1_000_000,
) -> DataFrame:
    """Robust per-group outlier detection: median absolute deviation
    (|x - median| > k * MAD), the heavy-tail-safe alternative to the
    stddev z-score (one extreme value inflates a stddev but barely moves
    a median — on power-law event values the z-score masks exactly the
    outliers it should flag). Returns one row per group:
    (group, n, med_value, mad_value, n_outliers).

    Exactness bridge: values are quantized to integers (× `quantize`)
    before the medians, so every interpolated median is an exact
    half-integer and the outlier comparison 2*|2x - 2*med| > 3*(4*MAD)
    is pure integer arithmetic — bit-identical across engines, with no
    float-boundary flips (the raw rule would compare against
    k*MAD in floating point, where a 1-ulp median difference between
    engines flips boundary rows).

    Plan: ONE hash shuffle on the group key; both median windows and the
    final aggregate reuse that partitioning (Spark's subset rule elides
    the later exchanges). The exact per-group median needs the group
    sorted in one task — at 100 TB with huge groups switch the medians
    to percentile_approx (mergeable sketch, no full sort) and keep this
    exact form as its oracle at test scale."""
    w = Window.partitionBy(group_col)
    vq = F.round(F.col(value_col) * quantize, 0).cast("long")
    med2 = (2 * F.percentile(F.col("_vq"), 0.5).over(w)).cast("long")
    with_med = df.select(F.col(group_col), vq.alias("_vq")).withColumn("_med2", med2)
    dev2 = F.abs(2 * F.col("_vq") - F.col("_med2"))
    mad4 = (2 * F.percentile(F.col("_dev2"), 0.5).over(w)).cast("long")
    with_mad = with_med.withColumn("_dev2", dev2).withColumn("_mad4", mad4)
    return with_mad.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.max("_med2") / F.lit(2.0 * quantize), 6).alias("med_value"),
        F.round(F.max("_mad4") / F.lit(4.0 * quantize), 6).alias("mad_value"),
        F.sum(
            F.when(2 * F.col("_dev2") > F.lit(k) * F.col("_mad4"), 1).otherwise(0)
        ).cast("long").alias("n_outliers"),
    )


def lr_quality_logit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
    weight_scale: int = 1000,
    weights: dict[int, int] | None = None,
) -> DataFrame:
    """Linear quality classifier over hashed token features — the
    fasttext/logistic-regression document scorer every web-corpus
    pipeline runs (CCNet's LM filter, GPT-3's WebText-vs-CommonCrawl
    classifier, Gopher/RefinedWeb quality gates): score each document by
    a dot product of token-feature weights, admit those above a
    threshold. The reference has no model-based surface at all
    (SURVEY.md §2.4); this is the Spark-shaped version of its missing
    "quality filter" stage.

    The model here is a FIXED weight table derived from the feature hash
    itself (md5(bucket) → integer in [-weight_scale, +weight_scale]) —
    the engine-side contract is identical to serving a trained model
    (broadcast weight lookup, map-side dot product); swapping in real
    trained weights changes one expression. Everything is INTEGER: the
    logit is a sum of integer weights over tokens and the per-token mean
    is integer-micro division (`div`), so Spark and the DuckDB oracle
    agree bit-for-bit (no float sums, no sigmoid boundary — monotone in
    the logit, so thresholding the logit IS thresholding the
    probability).

    Plan: tokenize → explode → bucket hash → weight lookup are all
    map-side codegen'd expressions (md5/conv are JVM intrinsics; no UDF,
    no join — the "weight table" is a pure hash function); ONE
    map-combined hash aggregate on the doc id. Shuffle volume = one row
    per document. At 100 TB this is the cheapest possible shape: a
    single pass, no state, embarrassingly parallel."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    exploded = df.select(F.col(id_col), F.explode(toks).alias("_term"))
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("_term")), 1, 8), 16, 10).cast("long"),
        F.lit(buckets),
    )
    if weights is not None:
        # a REAL trained model: integer weights per bucket, baked into the
        # plan as a literal array indexed by the bucket id (O(buckets)
        # literals — broadcast-sized by construction); absent buckets
        # weigh 0. Same map-only plan as the hash-derived table.
        table = F.array(
            *[F.lit(int(weights.get(b, 0))) for b in range(buckets)]
        )
        weight = F.element_at(table, (bucket + 1).cast("int")).cast("long")
    else:
        weight = (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("w:"), bucket.cast("string"))), 1, 8),
                16,
                10,
            ).cast("long")
            % F.lit(2 * weight_scale + 1)
            - F.lit(weight_scale)
        )
    return (
        exploded.select(F.col(id_col), weight.alias("_w"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_w").alias("logit_q"),
        )
        .select(
            id_col,
            "n_tokens",
            "logit_q",
            F.expr("(logit_q * 1000000) div n_tokens").alias("avg_logit_micro"),
            (F.col("logit_q") > 0).alias("admit"),
        )
    )


def winsorize_groups(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p: float = 0.05,
    quantize: int = 1_000_000,
) -> DataFrame:
    """Per-group winsorization at the [p, 1-p] nearest-rank quantiles:
    clip values beyond the bounds instead of dropping the rows — the
    robust-preprocessing companion to mad_outliers (detection) for
    features feeding a model where every row must survive but a fat tail
    would dominate the loss.  Returns one summary row per group:
    (group, n, lo_value, hi_value, n_clipped_low, n_clipped_high,
    winsorized_mean).

    Exactness bridge: values quantize to integers, and the bounds use
    NEAREST-RANK (type-1) quantiles — the value at row_number
    ceil(p*n) in sorted order — so there is NO interpolation anywhere:
    interpolated quantiles at general p mix lo + frac*(hi-lo) in
    floating point where the two engines' formula orderings can differ
    by an ulp and flip clip-boundary rows; rank selection is pure
    integer arithmetic, and the oracle states the identical row_number
    formula rather than trusting quantile_disc's convention.  The
    winsorized mean sums exact clipped integers and divides once.

    Plan: ONE hash shuffle on the group key; the rank window, the two
    bound windows (max-of-case over the same partition), and the final
    aggregate all reuse that partitioning.  Same large-group caveat as
    mad_outliers: exact ranks sort the group in one task — at 100 TB
    swap the bounds to percentile_approx and keep this as its oracle."""
    w_ord = Window.partitionBy(group_col).orderBy(F.col("_vq").asc())
    w_all = Window.partitionBy(group_col)
    base = (
        df.select(
            F.col(group_col),
            F.round(F.col(value_col) * quantize, 0).cast("long").alias("_vq"),
        )
        .withColumn("_rn", F.row_number().over(w_ord))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
    )
    k_lo = F.greatest(F.ceil(F.lit(p) * F.col("_n")), F.lit(1))
    k_hi = F.ceil(F.lit(1.0 - p) * F.col("_n"))
    bounded = base.withColumn(
        "_lo", F.max(F.when(F.col("_rn") == k_lo, F.col("_vq"))).over(w_all)
    ).withColumn(
        "_hi", F.max(F.when(F.col("_rn") == k_hi, F.col("_vq"))).over(w_all)
    )
    clipped = F.greatest(F.least(F.col("_vq"), F.col("_hi")), F.col("_lo"))
    return bounded.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.max("_lo") / F.lit(float(quantize)), 6).alias("lo_value"),
        F.round(F.max("_hi") / F.lit(float(quantize)), 6).alias("hi_value"),
        F.sum(F.when(F.col("_vq") < F.col("_lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("_vq") > F.col("_hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_high"),
        F.round(
            F.sum(clipped).cast("double") / F.count(F.lit(1)) / F.lit(float(quantize)),
            6,
        ).alias("winsorized_mean"),
    )


def k_anonymity_audit(
    df: DataFrame,
    levels: dict[str, list[str]],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) across GENERALIZATION levels:
    for each named combination of quasi-identifier columns, how many
    equivalence classes fall below `k` members and how many rows sit in
    them — the privacy check that decides whether a pseudonymized
    release is safe, and the evidence for the standard remedy (climb
    the generalization hierarchy — e.g. nation → region — until every
    class reaches k).  Tokenized direct identifiers (pseudonymize) do
    NOT change this audit: equivalence classes are defined by the
    quasi-identifiers that survive tokenization, which is exactly why
    the audit must run alongside pseudonymization rather than being
    replaced by it.

    `levels` maps a level name → list of quasi-identifier columns.
    Returns one row per level: (level, n_classes, n_below_k,
    rows_at_risk, min_class_size) — rows_at_risk is the re-identifiable
    population at that generalization level.

    Plan per level: one map-combined agg on the QI tuple, then an
    O(classes) rollup; levels union O(levels) summary rows."""
    outs = []
    for name, cols in levels.items():
        classes = df.groupBy(*[F.col(c) for c in cols]).agg(
            F.count(F.lit(1)).alias("_n")
        )
        outs.append(
            classes.agg(
                F.lit(name).alias("level"),
                F.count(F.lit(1)).alias("n_classes"),
                F.sum(F.when(F.col("_n") < k, 1).otherwise(0))
                .cast("bigint")
                .alias("n_below_k"),
                F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
                .cast("bigint")
                .alias("rows_at_risk"),
                F.min("_n").alias("min_class_size"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def calibration_bins(
    scores: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    logit_micro_col: str = "avg_logit_micro",
    label_col: str = "keep",
    temperature: float = 25.0,
    quantize: int = 9,
) -> DataFrame:
    """Reliability table for a document-quality classifier: predicted
    probability (sigmoid of the integer micro-logit, scaled by
    ``temperature``) binned into deciles against an independent binary
    label, with the per-bin calibration gap — the table an ECE
    (expected calibration error) reads off, and the audit that decides
    whether a score threshold can be trusted as a sampling probability
    (e.g. soft quality-weighted sampling a la DataComp) or only as a
    ranking.

    Determinism: the logit is an exact integer, x = micro/(1e6·T) is one
    exact double division, the sigmoid lands on the ``quantize`` grid
    (unigram_logprob's ln discipline applied to exp), per-bin means are
    exact decimal sums, and the label rate is a ratio of integer counts.

    Scale shape: one equi-join on the id (both inputs are per-doc
    rollups of the same corpus scan family) and one ≤10-key map-combined
    aggregate."""
    x = F.col(logit_micro_col).cast("double") / F.lit(1_000_000.0 * temperature)
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-x)), quantize)
    joined = scores.select(F.col(id_col), p.alias("_p")).join(
        labels.select(F.col(id_col), F.col(label_col).cast("long").alias("_y")), id_col
    )
    binned = joined.select(
        F.least(F.floor(F.col("_p") * 10).cast("long"), F.lit(9)).alias("prob_bin"),
        "_p",
        "_y",
    )
    dsum = lambda c: F.sum(F.col(c).cast(f"decimal(20,{quantize})")).cast("double")  # noqa: E731
    return binned.groupBy("prob_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (dsum("_p") / F.count(F.lit(1))).alias("avg_predicted"),
        (F.sum("_y").cast("double") / F.count(F.lit(1))).alias("label_rate"),
    ).select(
        "prob_bin",
        "n_docs",
        "avg_predicted",
        "label_rate",
        F.round(F.abs(F.col("avg_predicted") - F.col("label_rate")), quantize).alias("calibration_gap"),
    )
