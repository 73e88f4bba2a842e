"""Temporal join operators: as-of join and bounded range join.

Spark has no native ASOF JOIN (DuckDB/Pandas do) and naively expressing
either of these as a theta-join plans a BroadcastNestedLoop/cartesian — the
classic 100 TB trap. Both operators here compile to ONE equi-shuffle each:

- ``asof_join``: union both sides with a side marker and run a
  last-non-null window over (key, ts) — the "merge" formulation. State per
  key during the sort is one row; no per-left-row probe, no range explosion.
- ``range_join_points_to_intervals``: quantize time into buckets of the
  maximum interval length, explode each interval to the (≤2 per length)
  buckets it overlaps, equi-join on (key, bucket), then apply the exact
  range predicate. Shuffle volume is |points| + 2|intervals|, never a
  cross product.

The reference has no joins beyond its single catalog equi-join and no
time-series operators at all (SURVEY.md §2.4; qast.clj:31-50 is the whole
operator registry), so both are north-star extensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """As-of join.  direction="backward" (default): for each left row,
    attach the right row with the greatest ``right_ts <= left_ts`` for
    the same ``on`` key (inclusive at equality, like DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts``).  direction="forward": the right
    row with the SMALLEST ``right_ts >= left_ts`` (DuckDB
    ``ON l.ts <= r.ts``) — next-touch attribution, restock-after-stockout,
    first-response-after-alert.

    Right-side (key, ts) pairs should be unique; among exact duplicates the
    surviving row is unspecified (pre-aggregate to make it deterministic).

    how="left" keeps left rows with no prior (resp. later) right row
    (right columns null); how="inner" drops them.

    Plan shape is direction-independent: one shuffle on the key, one
    sorted window pass with one-row running state — the merge
    formulation that survives 100 TB, vs the theta-join's
    broadcast-nested-loop.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    from pyspark.sql import types as T

    lcarry = [c for c in left.columns if c not in (on, left_ts)]
    rcarry = [c for c in right.columns if c not in (on, right_ts)]

    # the whole right payload (match ts + carried columns) travels as ONE
    # struct so last(ignorenulls) picks every field from the SAME right row —
    # per-column carries could mix rows when a right field is legitimately null
    r_struct_type = T.StructType(
        [T.StructField("_asof_ts", right.schema[right_ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in rcarry]
    )
    rs = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias("_asof_ts"), *[F.col(c).alias(c) for c in rcarry]
        ).alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcarry],
    )
    ls = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_type).alias("_r"),
        *[F.col(c) for c in lcarry],
    )
    # right rows sort before left rows at equal ts (_side 0 < 1) → inclusive;
    # forward scans time DESCENDING so "last preceding non-null" is the
    # nearest right row at-or-after the left ts
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        rs.unionByName(ls)
        .select(
            F.col(on),
            F.col("_ts"),
            F.col("_side"),
            F.last("_r", ignorenulls=True).over(w).alias("_r"),
            *[F.col(c) for c in lcarry],
        )
        .filter(F.col("_side") == 1)
        .select(
            F.col(on),
            F.col("_ts").alias(left_ts),
            *[F.col(c) for c in lcarry],
            F.col("_r._asof_ts").alias(f"asof_{right_ts}"),
            *[F.col(f"_r.{c}").alias(c) for c in rcarry],
        )
    )
    if how == "inner":
        out = out.filter(F.col(f"asof_{right_ts}").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    return out


def gapfill_locf(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    measures: dict[str, Column],
    step: str = "1 hour",
) -> DataFrame:
    """Hypertable-style gap filling with last-observation-carried-forward:
    bucket rows to `step`, then for every key emit EVERY bucket between
    that key's first and last observation, carrying the most recent
    non-null value forward into empty buckets (TimescaleDB's
    time_bucket_gapfill + locf shape). Emitted columns: key, bucket_ts,
    one filled value per requested column, and `observed` (false for
    filled rows).

    Scale shape — two keyed shuffles, no driver-side time loop:
    1. the bucket aggregation (map-side combined);
    2. per-key grids built by sequence()+explode — the grid rows are
       O(span/step) per key and are generated from each key's OWN min/max
       (sparse keys don't pay for the global span);
    3. the fill is one last(ignorenulls) window over (key, bucket) — one
       sort within the already-shuffled partitioning, one row of carried
       state per key, same as the as-of merge above.
    The batch semantics are oracle-checked against DuckDB generate_series
    + IGNORE NULLS window in the events_gapfill_locf workload."""
    bucket = F.window(ts_col, step)["start"]
    observed = df.groupBy(F.col(key_col).alias("key"), bucket.alias("bucket_ts")).agg(
        F.count(F.lit(1)).alias("_nobs"),
        *[expr.alias(f"_obs_{name}") for name, expr in measures.items()],
    )
    spans = observed.groupBy("key").agg(
        F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi")
    )
    grid = spans.select(
        "key",
        F.explode(F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))).alias("bucket_ts"),
    )
    joined = grid.join(observed, ["key", "bucket_ts"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = [
        F.last(f"_obs_{name}", ignorenulls=True).over(w).alias(name) for name in measures
    ]
    return joined.select(
        "key", "bucket_ts", *filled, F.col("_nobs").isNotNull().alias("observed")
    )


def scd2_compress(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Change-point compression into SCD-type-2 validity intervals: for each
    key, collapse consecutive rows with the same ``state_col`` into one row
    with ``valid_from`` (first ts of the run), ``valid_to`` (start of the
    next run, null for the current run) and ``n_events`` (run length).

    This is the warehouse slowly-changing-dimension build (and the
    time-series "compress consecutive" shape). The reference has no window
    or aggregate constructs at all (SURVEY.md §2.4) — extension operator.

    Scale shape: ONE shuffle on ``key_col`` serves everything — the lag
    (change detection), the running sum (run numbering), the run
    aggregation (groupBy(key, run) reuses the key partitioning via the
    subset rule), and the lead (valid_to) — so the plan is shuffle once,
    sort within partitions, stream. State per key is one row.
    ``tiebreak_col`` must make (ts, tiebreak) unique per key so run
    numbering is deterministic.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = (
        F.lag(state_col).over(w).isNull()
        | (F.lag(state_col).over(w) != F.col(state_col))
    ).cast("int")
    runs = df.select(
        key_col,
        ts_col,
        state_col,
        F.col(tiebreak_col).alias("_tb"),
        changed.alias("_chg"),
    ).select(
        key_col,
        ts_col,
        state_col,
        F.sum("_chg")
        .over(
            Window.partitionBy(key_col)
            .orderBy(ts_col, "_tb")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("_run"),
    )
    # _chg marks run starts, so within a run (key, _run, state) is constant
    agg = runs.groupBy(key_col, "_run", state_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # order by _run too: two runs of a key can share a valid_from when
    # adjacent equal-ts events carry different states, and a lead ordered
    # only by valid_from would be nondeterministic in both engines
    lead_w = Window.partitionBy(key_col).orderBy("valid_from", "_run")
    return agg.select(
        key_col,
        state_col,
        "valid_from",
        F.lead("valid_from").over(lead_w).alias("valid_to"),
        "n_events",
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    value_decimal: str = "decimal(14,4)",
) -> DataFrame:
    """Last-observation-carried-forward time-weighted average per key over
    each key's own observation span (TimescaleDB ``time_weight('LOCF')``
    shape): Σ value_i · (t_{i+1} − t_i) / (t_n − t_1). Keys with a single
    observation (zero-length span) are dropped.

    Engine-agreement discipline: the weighted sum is computed in exact
    decimal × integer-microseconds arithmetic (associative, so Spark's
    partial-aggregation order can't change it) and only the final division
    happens in double. Scale: one shuffle on the key — the lead window and
    the aggregation share it; the integral is a running fold, never a
    driver loop.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    seq = df.select(
        key_col,
        us.alias("_us"),
        F.col(value_col).cast(value_decimal).alias("_v"),
        F.col(tiebreak_col).alias("_tb"),
    ).select(
        key_col,
        "_us",
        "_v",
        (F.lead("_us").over(Window.partitionBy(key_col).orderBy("_us", "_tb")) - F.col("_us"))
        .alias("_dt"),
    )
    return (
        seq.groupBy(key_col)
        .agg(
            F.sum(F.col("_v") * F.coalesce(F.col("_dt"), F.lit(0))).alias("_num"),
            (F.max("_us") - F.min("_us")).alias("_span_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .filter(F.col("_span_us") > 0)
        .select(
            key_col,
            (F.col("_num").cast("double") / F.col("_span_us").cast("double")).alias(
                "twa_value"
            ),
            "_span_us",
            "n_events",
        )
        .withColumnRenamed("_span_us", "span_us")
    )


def range_join_points_to_intervals(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    max_interval_seconds: int = 3600,
) -> DataFrame:
    """Join point rows to interval rows of the same key with
    ``start_ts <= point_ts < end_ts``, where every interval is at most
    ``max_interval_seconds`` long (the quantization guarantee).

    Each interval explodes to the time buckets it overlaps (≤2 for
    length ≤ bucket width); points map to exactly one bucket, so each
    qualifying (point, interval) pair meets in exactly one bucket — no
    post-join dedup needed. The equi-join on (key, bucket) shuffles
    |points| + 2|intervals| rows; AQE handles hot keys via skew split.
    """
    bucket_w = int(max_interval_seconds)
    p_bucket = (F.unix_timestamp(F.col(point_ts)) / bucket_w).cast("long")
    s_bucket = (F.unix_timestamp(F.col(start_ts)) / bucket_w).cast("long")
    e_bucket = (F.unix_timestamp(F.col(end_ts)) / bucket_w).cast("long")

    iv = intervals.withColumn("_bucket", F.explode(F.sequence(s_bucket, e_bucket)))
    pt = points.withColumn("_bucket", p_bucket)
    cond = (
        (pt[on] == iv[on])
        & (pt["_bucket"] == iv["_bucket"])
        & (pt[point_ts] >= iv[start_ts])
        & (pt[point_ts] < iv[end_ts])
    )
    return pt.join(iv, cond).drop(iv[on]).drop(iv["_bucket"]).drop(pt["_bucket"])
