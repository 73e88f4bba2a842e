"""Structured Streaming operators: windowed aggregation, watermarks, session
windows.

The reference has no streaming query model whatsoever — only streamed byte
I/O with back-pressure (reference thesis/main/meth.tex:347-359; SURVEY.md
§2.4) — so this module is pure extension surface, built the Spark way:
the SAME builders apply to batch DataFrames and streaming DataFrames
(F.window / F.session_window are batch+stream operators), which is what
makes the semantics testable against a SQL oracle in batch and then
reusable on readStream unchanged.

Scale notes: streaming state (windows, sessions) is keyed by (key, window)
— state-store size is bounded by watermarking; shuffle partitioning of a
stream is the same shuffle-by-key story as batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """File-source stream over a directory of event parquet files.
    maxFilesPerTrigger=1 gives deterministic micro-batch replay in tests;
    on a production bus this is Kafka's readStream with the same downstream
    plan."""
    reader = spark.readStream.format("parquet").option("maxFilesPerTrigger", 1)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def windowed_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = None,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation; identical
    semantics batch or streaming. With a watermark, late data beyond the
    bound is dropped and window state is reclaimed — the knob that keeps
    state finite on an unbounded stream."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    group_cols = [win] + [F.col(k) for k in (keys or [])]
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    out = df.groupBy(*group_cols).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "5 minutes",
    watermark: str | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Session windows: a session closes after `gap` of inactivity per key.
    F.session_window works on batch and streaming frames; the batch
    semantics equal the classic lag/cumsum SQL sessionization (oracle-
    checked in the workload registry as events_sessionize)."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    out = df.groupBy(F.session_window(ts_col, gap), F.col(key_col)).agg(*aggs)
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *[c for c in out.columns if c != "session_window"],
    )


def run_to_memory(
    stream_df: DataFrame, query_name: str, timeout_sec: int = 60, output_mode: str = "complete"
):
    """Drain a (bounded) stream with availableNow into an in-memory table —
    the test harness for streaming operators. Aggregations replay in
    'complete' mode (nothing evicted before the final emit, so the drained
    table equals the batch answer); row-level stateful ops (dedup) use
    'append'."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q


def running_user_totals(stream_df: DataFrame, key_col: str = "user_id", value_col: str = "value"):
    """Custom stateful streaming operator via applyInPandasWithState: a
    per-key running (count, sum) that survives across micro-batches — the
    canonical 'state Spark's built-ins don't give you' shape (built-in
    streaming aggs can't emit per-batch deltas with custom eviction).

    State is one row per key; the state store scales with distinct keys,
    not events. GroupStateTimeout is off here (totals are eternal) — pass
    watermark + timeout for session-style eviction.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = f"{key_col} long, n_events long, total double"
    state_schema = "n long, total double"

    def update(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total": [total]})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 1 HOUR",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: rows pair when keys match AND
    right_ts ∈ [left_ts + lower, left_ts + upper] — the streaming form of
    the batch bounded range join (operators/temporal.range_join).

    Both sides are watermarked and the join condition bounds event time in
    BOTH directions, which is exactly what lets Spark evict join state:
    a buffered left row can stop waiting once the right watermark passes
    left_ts + upper, and vice versa. State is therefore bounded by
    (rate × interval width + watermark slack) per side, independent of
    stream history — without the time bound, a stream-stream join must
    buffer everything forever. Equality with the batch join on a bounded
    replay is pinned in tests/test_multimodal_streaming.py."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.expr(f"{left_ts} + {lower}"))
        & (F.col(right_ts) <= F.expr(f"{left_ts} + {upper}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])


def streaming_dedup(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("fp",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first row per key, with state evicted
    once the event-time watermark passes — the streaming form of the corpus
    exact-dedup stage (pipeline_clean_corpus). State is bounded by distinct
    keys per watermark horizon, not by stream history, which is what makes
    exact dedup viable on an unbounded ingest feed; duplicates farther apart
    than the watermark are the residual the periodic batch compaction pass
    removes."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(key_cols))


def running_user_totals_exact(stream_df: DataFrame, key_col: str = "user_id", value_col: str = "value"):
    """Exact-state variant of running_user_totals: per-key running
    (count, sum) held as (long, integer ten-thousandths) GroupState — the
    same quantization discipline as streaming/budget.py, which makes the
    final emitted totals bit-identical to a batch DECIMAL(14,4) aggregate
    (integer addition is exact and order/batching-independent, so the
    micro-batch split cannot change the answer). Update mode: each batch
    emits the key's new running row; the LAST emission per key equals the
    batch GROUP BY."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from comlake_core_spark.streaming.budget import _to_ten_thousandths

    def update(key, pdf_iter, state: GroupState):
        n, spent = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            spent += int(sum(_to_ten_thousandths(v) for v in pdf[value_col]))
        state.update((n, spent))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [spent / 10_000.0]}
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, n_events long, total_value double",
        stateStructType="n long, spent long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_paths(
    events: DataFrame,
    gap: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    top_n: int = 20,
) -> DataFrame:
    """Top event-type paths per session — the behavioural-sequence rollup
    (and, on a chat/interaction log, the conversation-reconstruction
    step a training pipeline runs before turning sessions into training
    samples).  Sessions use the same gap rule as sessionize; the path is
    the '>'-joined event types in (ts, tiebreak) order, made total by
    the tiebreak column so re-runs are byte-identical.

    Scale shape: the session assignment is a per-user window (lag +
    running flag-sum — partitioned by user, never global), path assembly
    is one groupBy with an in-group sort of collected structs (bounded
    by session length, not corpus size), and the final top-N is
    TakeOrderedAndProject over the per-path counts (each task forwards
    its local top-N)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    lagged = events.withColumn(
        "_new",
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (F.col(ts_col) >= F.lag(ts_col).over(w) + F.expr(f"INTERVAL {gap}")),
            1,
        ).otherwise(0),
    )
    sess = lagged.withColumn(
        "_sid", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    paths = (
        sess.groupBy(user_col, "_sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col(ts_col), F.col(tiebreak_col), F.col(type_col).alias("_t"))
                        )
                    ),
                    lambda s: s["_t"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(top_n)
    )
