"""streaming-equals-batch oracle workloads

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



# ---------------------------------------------------------------------------
# Session windows, semi/anti joins, rollup (SURVEY.md §2.4 gaps)
# ---------------------------------------------------------------------------


@workload(
    "events_sessionize",
    r"""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR THEN 1
                  ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    )
    SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           user_id,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    "streaming",
    "session-window",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.session_window (batch form; the streaming/ module applies the same
    builder to readStream). Oracle: the classic lag/cumsum sessionization —
    proving the two formulations agree is the semantic test of the
    operator."""
    from comlake_core_spark.streaming.windows import sessionize

    (ev,) = _t(spark, sf_dir, "events")
    out = sessionize(ev, gap="1 hour")
    return out.select(
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
        "user_id",
        "n_events",
    )




@workload(
    "streaming_hourly_events",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
    "streaming",
)
def streaming_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events replayed through Structured Streaming (file source, 3 micro-
    batches, availableNow) into the same hourly windowed agg as the batch
    events_hourly. Oracle-able: with outputMode('complete') the watermark
    never evicts rows before the final emit of a bounded availableNow
    replay, so the streamed aggregate equals the batch aggregate exactly —
    the oracle IS the batch SQL, making the gate a streaming≡batch proof
    (also pytest-pinned in tests/test_multimodal_streaming.py)."""
    import tempfile

    from comlake_core_spark.streaming.windows import read_events_stream, run_to_memory, windowed_agg

    (ev,) = _t(spark, sf_dir, "events")
    stream_dir = tempfile.mkdtemp(prefix="comlake-stream-")
    ev.repartition(3).write.mode("overwrite").parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema
    stream = read_events_stream(spark, stream_dir, schema)
    name = "streaming_hourly_events_wl"
    q = run_to_memory(windowed_agg(stream, keys=["event_type"], watermark="2 hours"), name)
    q.stop()
    out = spark.table(name)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        "n",
    )




@workload(
    "streaming_dedup_users",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_first
    FROM events GROUP BY event_type
    """,
    "streaming",
    "dedup",
)
def streaming_dedup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup proven against batch: events replayed through
    Structured Streaming, dropDuplicatesWithinWatermark on (user_id,
    event_type) emitting each key's FIRST row, then a batch count of the
    drained append-mode sink. The watermark (60 days) exceeds the replay
    span (30 days), so no state is evicted mid-replay and the streamed
    first-occurrence set is exactly the batch DISTINCT — the oracle is
    the batch SQL. At production scale the watermark is the dedup
    horizon: state is bounded by keys-per-horizon, and the residual
    beyond it belongs to the periodic batch compaction
    (pipeline_clean_corpus)."""
    import tempfile

    from comlake_core_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
        streaming_dedup,
    )

    (ev,) = _t(spark, sf_dir, "events")
    stream_dir = tempfile.mkdtemp(prefix="comlake-stream-dedup-")
    ev.repartition(3).write.mode("overwrite").parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema
    stream = read_events_stream(spark, stream_dir, schema)
    deduped = streaming_dedup(
        stream, ts_col="ts", key_cols=("user_id", "event_type"), watermark="60 days"
    )
    name = "streaming_dedup_users_wl"
    q = run_to_memory(deduped, name, output_mode="append")
    q.stop()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_first"))
    )




@workload(
    "streaming_interval_join",
    """
    SELECT p.event_id AS purchase_id,
           COUNT(*) AS n_clicks,
           CAST(SUM(CAST(c.value AS DECIMAL(12,4))) AS DOUBLE) AS click_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR
    GROUP BY p.event_id
    """,
    "streaming",
    "join",
    "range",
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join proven against the batch range join:
    one replayed event stream split into purchase and click legs, joined
    on user with click_ts ∈ [purchase_ts, purchase_ts + 1h], drained in
    append mode and aggregated in batch. The watermark (60 days) exceeds
    the replay span, so no join state is evicted mid-replay and the
    streamed match set is exactly the batch bounded range join — the
    oracle is the batch SQL (the streaming twin of
    range_join_clicks_after_purchase, closed upper bound). At production
    scale the time bound is what keeps join state finite: a buffered row
    expires once the other side's watermark passes its window."""
    import tempfile

    from comlake_core_spark.streaming.windows import (
        interval_join_streams,
        read_events_stream,
        run_to_memory,
    )

    (ev,) = _t(spark, sf_dir, "events")
    stream_dir = tempfile.mkdtemp(prefix="comlake-stream-ij-")
    ev.repartition(3).write.mode("overwrite").parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema
    stream = read_events_stream(spark, stream_dir, schema)
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), "value"
    )
    joined = interval_join_streams(
        purchases,
        clicks,
        key="user_id",
        left_ts="p_ts",
        right_ts="c_ts",
        lower="INTERVAL 0 SECONDS",
        upper="INTERVAL 1 HOUR",
        watermark="60 days",
    )
    name = "streaming_interval_join_wl"
    q = run_to_memory(joined, name, output_mode="append")
    q.stop()
    return (
        spark.table(name)
        .groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.sum(dec("value", 12, 4)).cast("double").alias("click_value"),
        )
    )




@workload(
    "streaming_running_totals",
    """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
    "streaming",
    "stateful",
)
def streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator under the oracle gate: per-user
    running (count, total) via applyInPandasWithState, state held as
    (long, integer ten-thousandths) — integer addition is exact and
    batching-independent, so the LAST update-mode emission per key is
    bit-identical to the batch DECIMAL(14,4) aggregate regardless of how
    the replay slices into micro-batches (same quantization contract as
    streaming/budget.py). State is one row per key — scales with distinct
    users, not stream length."""
    import tempfile

    from comlake_core_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
        running_user_totals_exact,
    )

    (ev,) = _t(spark, sf_dir, "events")
    stream_dir = tempfile.mkdtemp(prefix="comlake-stream-rt-")
    ev.repartition(3).write.mode("overwrite").parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema
    stream = read_events_stream(spark, stream_dir, schema)
    totals = running_user_totals_exact(stream)
    name = "streaming_running_totals_wl"
    q = run_to_memory(totals, name, output_mode="update")
    q.stop()
    # update mode appends each key's successive running rows; the final
    # state per key is the row with the largest n_events
    sink = spark.table(name)
    return (
        sink.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
    )




@workload(
    "streaming_matview_events",
    """
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value,
           CASE WHEN COUNT(value) > 0
                THEN CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) / COUNT(value)
           END AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
    "streaming",
    "materialized-view",
    "incremental",
)
def streaming_matview_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-maintained materialized view under the oracle gate: events
    replay through foreachBatch into IncrementalRollup (batch-id
    idempotence makes replays effectively-once), and the drained view
    must equal the one-shot full-scan aggregate — decimal partial states
    merge associatively, so HOW the stream sliced the data cannot change
    the answer. The streaming sibling of incremental_rollup_events; at
    production scale this is the continuously-maintained dashboard view
    whose refresh cost is O(micro-batch), never O(history)."""
    import tempfile

    from comlake_core_spark.operators.matview import IncrementalRollup
    from comlake_core_spark.streaming.windows import read_events_stream

    (ev,) = _t(spark, sf_dir, "events")
    stream_dir = tempfile.mkdtemp(prefix="comlake-stream-mv-")
    ev.repartition(3).write.mode("overwrite").parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema
    stream = read_events_stream(spark, stream_dir, schema)
    view = IncrementalRollup(
        spark, tempfile.mkdtemp(prefix="rollup_stream_"), keys=["event_type"], measures=["value"]
    )
    q = view.stream_into(stream, tempfile.mkdtemp(prefix="rollup_ckpt_"))
    q.awaitTermination(120)
    q.stop()
    return view.read()




@workload(
    "streaming_sessionize_users",
    r"""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR THEN 1
                  ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    )
    SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           user_id,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    "streaming",
    "session-window",
)
def streaming_sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows through an ACTUAL streaming replay, proven equal to
    the batch lag/cumsum sessionization. Append-mode session aggregation
    only emits a session once the watermark passes its close, so a bounded
    replay would hold back every user's last session — the workload
    demonstrates the production answer: a watermark-advancing sentinel
    event (far-future heartbeat) processed LAST (file modification times
    pin the replay order; the 60-day delay exceeds the data span so
    real-file ordering can never drop data). The sentinel's own session is
    filtered out; every real session then emits exactly once and the
    streamed result equals the batch answer bit-for-bit."""
    import os
    import tempfile

    from comlake_core_spark.streaming.windows import read_events_stream, run_to_memory, sessionize

    (ev,) = _t(spark, sf_dir, "events")
    stream_dir = tempfile.mkdtemp(prefix="comlake-stream-sess-")
    ev.repartition(3).write.mode("overwrite").parquet(stream_dir)
    before = {f for f in os.listdir(stream_dir) if f.endswith(".parquet")}
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel = spark.createDataFrame(
        [(10**9, max_ts, -1, "sentinel", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 130 DAYS")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    sentinel.coalesce(1).write.mode("append").parquet(stream_dir)
    base_t = 1_000_000_000
    for f in sorted(os.listdir(stream_dir)):
        if not f.endswith(".parquet"):
            continue
        t = base_t if f in before else base_t + 1000
        os.utime(os.path.join(stream_dir, f), (t, t))
    schema = spark.read.parquet(stream_dir).schema
    stream = read_events_stream(spark, stream_dir, schema)
    sess = sessionize(stream, gap="1 hour", watermark="60 days")
    name = "streaming_sessionize_users_wl"
    q = run_to_memory(sess, name, output_mode="append", timeout_sec=120)
    q.stop()
    return (
        spark.table(name)
        .filter(F.col("user_id") >= 0)
        .select(
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "user_id",
            "n_events",
        )
    )




@workload(
    "streaming_neardup_index",
    r"""
    WITH sh AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' ')
             )) AS grams
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents)
    ), sized AS (SELECT id, grams, len(grams) AS gc FROM sh)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
    FROM sized a JOIN sized b
      ON a.id < b.id
     AND a.gc >= CAST(ceil(b.gc * 0.8) AS BIGINT)
     AND b.gc >= CAST(ceil(a.gc * 0.8) AS BIGINT)
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
    """,
    "streaming",
    "dedup",
    "incremental",
)
def streaming_neardup_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup detection against a PERSISTENT signature index
    under the oracle gate — the continuous-ingest form of
    dedup_incremental_batch (VERDICT r6 "Next round" #5).  The corpus
    replays as a real file-source stream (3 micro-batches,
    maxFilesPerTrigger=1, availableNow); each batch bands its MinHash
    signatures against the on-disk index (new×old) plus an ordered
    within-batch self-join (new×new) — old×old is NEVER recomputed — and
    appends its bands/shingles/pairs idempotently under _batch=<id>/.
    Because every doc lands in some batch, the union of per-batch pair
    tables covers every near-dup pair exactly once (cross-batch pairs
    when the later doc arrives, within-batch pairs ordered), so after
    least/greatest normalization the streamed result must equal the
    batch ALL-PAIRS answer — the oracle brute-forces exact Jaccard over
    all pairs (same exactness-preserving size-ratio prefilter as
    dedup_minhash_lsh), so equality simultaneously proves 100% LSH
    recall (64 hashes x 16 bands at 0.8) AND the index's exactly-once
    accumulation.  See streaming/neardup.StreamingNearDupIndex."""
    import tempfile

    from comlake_core_spark.streaming.neardup import StreamingNearDupIndex

    (docs,) = _t(spark, sf_dir, "documents")
    stream_dir = tempfile.mkdtemp(prefix="comlake-stream-nd-")
    docs.repartition(3).write.mode("overwrite").parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .option("maxFilesPerTrigger", 1)
        .schema(schema)
        .load(stream_dir)
    )
    idx = StreamingNearDupIndex(
        tempfile.mkdtemp(prefix="comlake-nd-index-"),
        k_shingle=3,
        num_hashes=64,
        bands=16,
        threshold=0.8,
    )
    q = idx.stream_into(stream, tempfile.mkdtemp(prefix="comlake-nd-ckpt-"))
    # fail loudly on timeout: stopping a still-running availableNow stream
    # would return a PARTIAL index that nondeterministically fails (or
    # worse, passes) the oracle gate (ADVICE r7 #4)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming_neardup_index: availableNow stream did not finish "
            "within 300s; refusing to return a partial pairs table"
        )
    q.stop()
    return idx.pairs(spark).select(
        F.least("new_id", "match_id").alias("id_a"),
        F.greatest("new_id", "match_id").alias("id_b"),
        "jaccard",
    )
