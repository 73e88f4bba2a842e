"""temporal joins, sessionization, funnel/retention workloads

Split from the monolithic workloads.py (VERDICT r5 "Next round" #6).
Module organization CANNOT move the driver window: registration order is
re-pinned to the original monolith order by _REGISTRATION_ORDER in
workloads/__init__.py, and tests/test_driver_window.py pins the first-50.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.qast.compiler import compile_predicate, default_resolver
from comlake_core_spark.session import tables

from ._base import _t, dec, workload



@workload(
    "events_gapfill_locf",
    """
    WITH obs AS (
      SELECT event_type AS key, date_trunc('hour', ts) AS bucket_ts,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) / COUNT(value) AS v
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT key, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi FROM obs GROUP BY key
    ),
    grid AS (
      SELECT key, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
      FROM spans
    )
    SELECT g.key, g.bucket_ts,
           last_value(o.v IGNORE NULLS) OVER (
             PARTITION BY g.key ORDER BY g.bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value,
           o.v IS NOT NULL AS observed
    FROM grid g LEFT JOIN obs o ON g.key = o.key AND g.bucket_ts = o.bucket_ts
    """,
    "temporal",
    "gapfill",
    "hypertable",
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable gap fill: hourly avg(value) per event type with empty
    hours filled by last-observation-carried-forward (TimescaleDB
    time_bucket_gapfill + locf, re-expressed as bucket-agg → per-key
    sequence grid → one last(ignorenulls) window; see
    operators/temporal.gapfill_locf). The hourly avg uses the exact-
    decimal-sum/count form so carried values hash-match the oracle."""
    from comlake_core_spark.operators.temporal import gapfill_locf

    (ev,) = _t(spark, sf_dir, "events")
    avg_value = F.sum(dec("value", 12, 4)).cast("double") / F.count("value")
    return gapfill_locf(ev, "ts", "event_type", {"avg_value": avg_value})




# ---------------------------------------------------------------------------
# Product/event analytics: funnels and retention cohorts (SURVEY.md §2 —
# beyond-reference training-pipeline analytics over the events hypertable)
# ---------------------------------------------------------------------------


@workload(
    "funnel_view_click_purchase",
    """
    WITH w1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM events
    ), w2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t1 THEN ts END)
                  OVER (PARTITION BY user_id) AS t2
      FROM w1
    ), w3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t2 THEN ts END)
                  OVER (PARTITION BY user_id) AS t3
      FROM w2
    ), per_user AS (
      SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
      FROM w3 GROUP BY user_id
    )
    SELECT COUNT(t1) AS users_view,
           COUNT(t2) AS users_click_after_view,
           COUNT(t3) AS users_purchase_after_click
    FROM per_user
    """,
    "funnel",
    "window",
    "events",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user counts for
    stage k only if stage k's first event happens AT OR AFTER stage k-1's
    first event. Implemented as three chained unbounded window-mins over the
    same user partition, so each stage's anchor time is visible on every row
    of the user without a self-join.

    Scale design: ONE shuffle on user_id; the three Window operators and the
    per-user aggregate all reuse that partitioning (no further exchange —
    plan-pinned in tests). The classic alternative — three self-joins of
    events with step predicates — shuffles the fact table once per stage."""
    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    e = ev.select("user_id", "ts", "event_type")
    e = e.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    e = e.withColumn(
        "t2",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") >= F.col("t1")), F.col("ts"))
        ).over(w),
    )
    e = e.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t2")), F.col("ts")
            )
        ).over(w),
    )
    per_user = e.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return per_user.agg(
        F.count("t1").alias("users_view"),
        F.count("t2").alias("users_click_after_view"),
        F.count("t3").alias("users_purchase_after_click"),
    )




@workload(
    "retention_weekly_cohorts",
    """
    WITH wk AS (
      SELECT user_id, date_trunc('week', ts) AS wk,
             min(date_trunc('week', ts)) OVER (PARTITION BY user_id) AS cohort
      FROM events
    ), act AS (
      SELECT DISTINCT user_id, cohort, wk FROM wk
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cohort, wk) // 7 AS INTEGER) AS week_offset,
           COUNT(*) AS n_active_users
    FROM act GROUP BY 1, 2
    """,
    "retention",
    "cohort",
    "events",
)
def retention_weekly_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users are cohorted by the ISO week of
    their first event; each later active week contributes to that cohort's
    (week_offset, n_active_users) cell. date_trunc('week') lands on Monday
    in both engines, so offsets are exact multiples of 7 days.

    Scale design: the cohort anchor is a window-min over user_id (one
    shuffle); the per-(user, week) dedup is a distinct whose clustering
    requirement is already satisfied by the user_id hash partitioning
    (subset rule — no second full-width shuffle); only the final tiny
    (cohort × offset) aggregate re-shuffles, and that output is bounded by
    weeks², independent of |events|."""
    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    e = ev.select("user_id", F.date_trunc("week", "ts").alias("wk"))
    e = e.withColumn("cohort", F.min("wk").over(w))
    act = e.select("user_id", "cohort", "wk").distinct()
    return act.groupBy(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
        (F.datediff("wk", "cohort") / 7).cast("int").alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("n_active_users"))




@workload(
    "events_sliding_windows",
    """
    WITH hops AS (SELECT 0 AS k UNION ALL SELECT 1),
    w AS (
      SELECT date_trunc('hour', ts) - to_hours(k) AS win_start,
             event_type, value
      FROM events CROSS JOIN hops
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS sum_value
    FROM w GROUP BY 1, 2
    """,
    "time",
    "window",
    "streaming-twin",
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) event-time windows: 2-hour windows advancing every
    hour, so each event lands in exactly two overlapping windows. Built on
    F.window(slideDuration=...) — the SAME expression drives the
    readStream form (streaming/windows.py windowed_counts takes a slide),
    so this is the batch twin of a sliding streaming aggregation. The
    oracle expands the two covering windows explicitly (CROSS JOIN a 2-row
    hop table). Plan: the window fanout is a flat 2x row expansion feeding
    ONE partial-aggregated shuffle on (window, event_type) — fanout happens
    map-side, so shuffled volume is 2x|groups-per-partition|, not
    2x|events|; at a 1000-executor scale the overlap factor (size/slide)
    is the knob that trades window resolution for shuffle volume."""
    (ev,) = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 14, 4)).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )




@workload(
    "scd2_event_type_history",
    r"""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run
      FROM seq
    ),
    agg AS (
      SELECT user_id, event_type, run, MIN(ts) AS vf, COUNT(*) AS n_events
      FROM runs GROUP BY user_id, event_type, run
    )
    SELECT user_id, event_type,
           strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           strftime(lead(vf) OVER (PARTITION BY user_id ORDER BY vf, run),
                    '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           n_events
    FROM agg
    """,
    "temporal",
    "window",
    "scd2",
)
def scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 build: collapse each user's consecutive same-type events
    into validity intervals [valid_from, valid_to) — the warehouse
    slowly-changing-dimension / change-point-compression shape. ONE
    shuffle on user_id serves lag, run numbering, the run aggregation
    (subset rule), and the lead for valid_to."""
    from comlake_core_spark.operators.temporal import scd2_compress

    (ev,) = _t(spark, sf_dir, "events")
    out = scd2_compress(ev, "user_id", "ts", "event_type", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
        "n_events",
    )




@workload(
    "time_weighted_avg_value",
    r"""
    WITH seq AS (
      SELECT user_id, epoch_us(ts) AS us, CAST(value AS DECIMAL(14,4)) AS v,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_us
      FROM events
    )
    SELECT user_id,
           CAST(CAST(SUM(v * COALESCE(next_us - us, 0)) AS VARCHAR) AS DOUBLE)
             / CAST(MAX(us) - MIN(us) AS DOUBLE) AS twa_value,
           CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM seq
    GROUP BY user_id
    HAVING MAX(us) > MIN(us)
    """,
    "temporal",
    "window",
    "twa",
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted average of `value` per user over the user's own
    observation span (TimescaleDB time_weight shape). The integral is an
    exact decimal × integer-microsecond sum (associative ⇒ partial-agg
    order can't change it); only the final division is double. One shuffle
    on user_id shared by the lead window and the aggregation."""
    from comlake_core_spark.operators.temporal import time_weighted_avg

    (ev,) = _t(spark, sf_dir, "events")
    return time_weighted_avg(ev, "user_id", "ts", "value", "event_id")




@workload(
    "events_session_paths",
    r"""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR THEN 1
                  ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    ), paths AS (
      SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sess GROUP BY user_id, sid
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT 20
    """,
    "session-window",
    "sequence",
    "training-data",
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 per-session event-type paths — the behavioural-sequence
    rollup, and on a chat/interaction log the conversation-reconstruction
    step before sessions become training samples.  Same gap rule as
    events_sessionize (its lag/cumsum oracle extended with an ordered
    string_agg); per-user windows, in-group sorted struct collection
    (bounded by session length), TakeOrdered top-N.  See
    streaming/windows.session_paths."""
    from comlake_core_spark.streaming.windows import session_paths

    (ev,) = _t(spark, sf_dir, "events")
    return session_paths(ev, gap="1 hour")




@workload(
    "events_burst_detection",
    """
    WITH w AS (
      SELECT user_id,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                            RANGE BETWEEN 599999999 PRECEDING AND CURRENT ROW)
               AS burst
      FROM events
    )
    SELECT user_id, COUNT(*) AS n_events,
           CAST(MAX(burst) AS BIGINT) AS max_burst_10min
    FROM w GROUP BY user_id
    """,
    "timeseries",
    "window",
    "anomaly",
)
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: each user's maximum event count inside any sliding
    10-minute window (a RANGE frame over microsecond epochs — every event
    anchors a window ending at itself, so the max over anchors IS the max
    over all windows).  The rate-anomaly primitive behind abuse detection
    and crawler-trap pruning.  Per-user windows shuffle once on user_id;
    frame evaluation is a two-pointer pass inside the sorted partition."""
    (ev,) = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-599_999_999, 0)
    )
    bursts = ev.select("user_id", F.count(F.lit(1)).over(w).alias("burst"))
    return bursts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("burst").alias("max_burst_10min"),
    )




@workload(
    "events_dau_wau_stickiness",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1
    ), weekly AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS w,
             COUNT(DISTINCT user_id) AS wau
      FROM events GROUP BY 1
    ), davg AS (
      SELECT CAST(date_trunc('week', d) AS DATE) AS w,
             SUM(dau) AS sdau, COUNT(*) AS ndays
      FROM daily GROUP BY 1
    )
    SELECT w AS week_start, wau,
           ROUND(CAST(sdau AS DOUBLE) / ndays, 9) AS avg_dau,
           ROUND(CAST(sdau AS DOUBLE) / ndays / wau, 9) AS stickiness
    FROM weekly JOIN davg USING (w)
    """,
    "timeseries",
    "engagement",
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per ISO week (the classic engagement ratio):
    daily and weekly distinct-user rollups joined on the week, avg DAU
    over the days the week actually has.  Two count-distinct aggregates
    (partial-agg'd) and a #weeks-row join — the report shape of every
    usage dashboard."""
    (ev,) = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("d")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    weekly = ev.groupBy(F.date_trunc("week", "ts").cast("date").alias("w")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    davg = daily.groupBy(F.date_trunc("week", "d").cast("date").alias("w")).agg(
        F.sum("dau").alias("sdau"), F.count(F.lit(1)).alias("ndays")
    )
    j = weekly.join(davg, "w")
    return j.select(
        F.col("w").alias("week_start"),
        "wau",
        F.round(F.col("sdau").cast("double") / F.col("ndays"), 9).alias("avg_dau"),
        F.round(F.col("sdau").cast("double") / F.col("ndays") / F.col("wau"), 9).alias("stickiness"),
    )




@workload(
    "events_markov_transitions",
    r"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ), tr AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ), tot AS (
      SELECT from_type, SUM(n) AS n_from FROM tr GROUP BY from_type
    )
    SELECT tr.from_type, tr.to_type, tr.n AS n_transitions,
           CAST(tot.n_from AS BIGINT) AS n_from,
           round(CAST(tr.n AS DOUBLE) / tot.n_from, 9) AS p
    FROM tr JOIN tot USING (from_type)
    """,
    "temporal",
    "window",
    "markov",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next_type | type) from lead() pairs ordered by (ts, event_id) —
    the behavioral fingerprint behind next-action prediction and
    anomaly scoring (a transition whose probability collapses between
    snapshots flags instrumentation or bot changes).  One shuffle on
    user_id for the lead window, one map-combined count over
    (from, to) — state space is |event_type|², rows are corpus-sized
    only in the window pass.  Deterministic tie order (ts, event_id)."""
    from comlake_core_spark.session import ensure_parallelism

    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ensure_parallelism(ev).select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    tr = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    tot = tr.groupBy("from_type").agg(F.sum("n_transitions").cast("long").alias("n_from"))
    return tr.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        "n_from",
        F.round(F.col("n_transitions").cast("double") / F.col("n_from"), 9).alias("p"),
    )
