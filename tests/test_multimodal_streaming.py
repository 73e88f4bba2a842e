"""Multimodal plumbing + Structured Streaming equivalence tests."""

import os

import pytest
from pyspark.sql import functions as F

from comlake_core_spark.operators import multimodal
from comlake_core_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    sessionize,
    windowed_agg,
)


@pytest.fixture(scope="module")
def blob_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("blobs")
    (d / "img_a.bin").write_bytes(b"A" * 1000)
    (d / "img_b.bin").write_bytes(b"B" * 2000)
    (d / "vid_c.bin").write_bytes(bytes(range(256)) * 8)  # 2048 bytes → 8 frames
    return str(d)


def test_load_binary_dir(spark, blob_dir):
    df = multimodal.load_binary_dir(spark, blob_dir)
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {"img_a.bin", "img_b.bin", "vid_c.bin"}
    assert rows["img_a.bin"]["meta"]["n_bytes"] == 1000


def test_decode_images_fake(spark, blob_dir):
    df = multimodal.load_binary_dir(spark, blob_dir)
    out = multimodal.decode_images(df)
    assert out.schema.simpleString() == (
        "struct<id:string,mime:string,n_bytes:bigint,width:int,height:int,features:array<float>>"
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows["img_a.bin"]["n_bytes"] == 1000
    assert 16 <= rows["img_a.bin"]["width"] <= 255
    assert len(rows["img_a.bin"]["features"]) == 8
    # determinism: same bytes → same features
    again = {r["id"]: r for r in multimodal.decode_images(df).collect()}
    assert again["img_a.bin"]["features"] == rows["img_a.bin"]["features"]


def test_decode_images_real_is_stubbed(spark, blob_dir):
    df = multimodal.load_binary_dir(spark, blob_dir)
    with pytest.raises(NotImplementedError):
        multimodal.decode_images(df, codec="real")


def test_sample_frames_fanout(spark, blob_dir):
    df = multimodal.load_binary_dir(spark, blob_dir, pattern="vid_*.bin")
    frames = multimodal.sample_frames(df, frame_size=256, every_n=2)
    rows = frames.orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4, 6]
    assert all(len(r["frame_bytes"]) == 256 for r in rows)
    assert rows[1]["pts_sec"] == pytest.approx(2 / 30)


def test_audio_stats(spark, blob_dir):
    df = multimodal.load_binary_dir(spark, blob_dir, pattern="img_a.bin")
    out = multimodal.audio_stats(df).first()
    assert out["n_samples"] == 1000
    assert out["duration_sec"] == pytest.approx(1000 / 16000)
    assert out["rms"] == pytest.approx(65.0)  # b"A" == 65 everywhere


# ---------------------------------------------------------------------------
# streaming
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """Split the events table into 3 parquet files → 3 replayable
    micro-batches."""
    from comlake_core_spark.session import tables

    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = tables(spark, sf_dir, ("events",))["events"]
    ev.repartition(3).write.mode("overwrite").parquet(d)
    return d


def test_streaming_hourly_equals_batch(spark, sf_dir, events_stream_dir):
    from comlake_core_spark.session import tables

    ev_batch = tables(spark, sf_dir, ("events",))["events"]
    batch = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in windowed_agg(ev_batch, keys=["event_type"]).collect()
    }

    schema = spark.read.parquet(events_stream_dir).schema
    stream = read_events_stream(spark, events_stream_dir, schema)
    assert stream.isStreaming
    q = run_to_memory(windowed_agg(stream, keys=["event_type"], watermark="2 hours"), "hourly_test")
    streamed = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM hourly_test").collect()
    }
    q.stop()
    # bounded replay with availableNow: streaming result == batch result
    assert streamed == batch


def test_streaming_sessionize_runs(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = read_events_stream(spark, events_stream_dir, schema)
    q = run_to_memory(sessionize(stream, gap="1 hour", watermark="2 hours"), "sess_test")
    n = spark.sql("SELECT count(*) AS c FROM sess_test").first()["c"]
    q.stop()
    assert n > 0


def test_stateful_running_totals(spark, sf_dir, events_stream_dir, tmp_path_factory):
    """applyInPandasWithState: state accumulates across the 3 micro-batches;
    final per-user totals must equal the batch aggregate."""
    from pyspark.sql import functions as F

    from comlake_core_spark.session import tables
    from comlake_core_spark.streaming.windows import running_user_totals

    schema = spark.read.parquet(events_stream_dir).schema
    stream = read_events_stream(spark, events_stream_dir, schema)
    out = running_user_totals(stream)
    chk = str(tmp_path_factory.mktemp("chk"))
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals_test")
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    # update mode emits one row per key per batch that touched it: the LAST
    # emission per user carries the final running state
    emitted = spark.sql("SELECT * FROM running_totals_test").collect()
    final = {}
    for r in emitted:  # memory sink appends in batch order
        final[r["user_id"]] = (r["n_events"], r["total"])
    ev = tables(spark, sf_dir, ("events",))["events"]
    batch = {
        r["user_id"]: (r["n"], r["s"])
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")).collect()
    }
    assert set(final) == set(batch)
    for uid, (n, total) in batch.items():
        assert final[uid][0] == n
        assert abs(final[uid][1] - total) < 1e-6


def test_watermark_drops_late_data(spark, tmp_path_factory):
    """Late-data semantics: an event below the committed watermark is
    dropped. Note Spark's watermark advances at batch BOUNDARIES from the
    previous batch's max event time, so the late event goes in the third
    micro-batch — one batch after the watermark-advancing data."""
    import time
    from datetime import datetime

    d = str(tmp_path_factory.mktemp("late"))
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def batch(path, rows):
        typed = [(i, datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"), u, e, v) for i, ts, u, e, v in rows]
        spark.createDataFrame(typed, schema).coalesce(1).write.mode("append").parquet(path)

    # file 1: 10:00 and 13:00 → watermark 11:00 commits after this batch
    batch(d, [(1, "2024-01-01 10:00:00", 1, "a", 1.0), (2, "2024-01-01 13:00:00", 1, "a", 1.0)])
    time.sleep(1.1)
    # file 2: on-time 13:10 (watermark 11:00 is now the operator's)
    batch(d, [(3, "2024-01-01 13:10:00", 1, "a", 1.0)])
    time.sleep(1.1)
    # file 3: LATE 09:30 — window [09:00,10:00) ends before watermark 11:00
    batch(d, [(4, "2024-01-01 09:30:00", 1, "a", 1.0)])

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    agg = windowed_agg(stream, window="1 hour", watermark="2 hours", keys=["event_type"])
    chk = str(tmp_path_factory.mktemp("chk_late"))
    q = (
        agg.writeStream.format("memory").queryName("late_test").outputMode("append")
        .option("checkpointLocation", chk).trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    dropped = sum(
        (p.get("stateOperators") or [{}])[0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
    )
    q.stop()

    rows = {r["window_start"].strftime("%H:%M"): r["n"] for r in spark.sql("SELECT * FROM late_test").collect()}
    assert dropped == 1  # the 09:30 event, counted by the stateful operator
    assert "09:00" not in rows, rows  # no window was created for it
    assert rows.get("10:00") == 1, rows  # the closed window stayed closed


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, events_stream_dir, tmp_path_factory):
    from comlake_core_spark.session import tables
    from comlake_core_spark.streaming.windows import interval_join_streams

    def split(df):
        purchases = df.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
        )
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
        )
        return purchases, clicks

    ev_batch = tables(spark, sf_dir, ("events",))["events"]
    bp, bc = split(ev_batch)
    batch = {
        (r["p_id"], r["c_id"])
        for r in bp.join(
            bc,
            (bp["user_id"] == bc["user_id"])
            & (bc["c_ts"] >= bp["p_ts"])
            & (bc["c_ts"] <= F.expr("p_ts + INTERVAL 1 HOUR")),
        ).collect()
    }

    schema = spark.read.parquet(events_stream_dir).schema
    stream = read_events_stream(spark, events_stream_dir, schema)
    sp, sc = split(stream)
    # the replay files are NOT time-ordered (repartition(3) interleaves the
    # whole month), so the watermark must exceed the replay's max disorder
    # for streaming ≡ batch to hold exactly; production watermarks bound
    # real ingestion lateness instead
    joined = interval_join_streams(
        sp, sc, key="user_id", left_ts="p_ts", right_ts="c_ts",
        upper="INTERVAL 1 HOUR", watermark="40 days",
    )
    chk = str(tmp_path_factory.mktemp("chk_ssj"))
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream-stream join did not finish"
    streamed = {
        (r["p_id"], r["c_id"]) for r in spark.sql("SELECT * FROM ssj_test").collect()
    }
    assert streamed == batch
    assert len(batch) > 0


def test_streaming_pipeline_end_to_end(spark, tmp_path_factory):
    """The composed ingest pipeline, streaming edition: file stream →
    quality filter → watermarked exact dedup → incremental rollup view,
    then the SAME stages in batch — results must be identical. This is
    the 'same builders, batch ≡ streaming' claim exercised across a
    whole pipeline, not a single operator."""
    from pyspark.sql import functions as F

    from comlake_core_spark.operators.matview import IncrementalRollup

    d = str(tmp_path_factory.mktemp("pipe_src"))
    rows = spark.range(0, 3000).select(
        F.col("id").alias("event_id"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("id") * 7)).alias("ts"),
        # every non-key attribute is a FUNCTION OF the dedup key fp: which
        # duplicate survives is arbitrary in both engines, so row equality
        # after dedup requires attribute equality across duplicates
        (F.col("id") % 5).cast("string").alias("kind"),  # 400 ≡ 0 (mod 5): stable per fp
        (F.col("id") % 400).alias("fp"),  # forced duplicates: 400 distinct
        ((F.col("id") % 400) % 97).cast("double").alias("v"),
    )
    rows.repartition(3).write.mode("overwrite").parquet(d)

    def stages(df):
        cleaned = df.filter(F.col("v") >= 5)  # the quality gate
        deduped = (
            cleaned.withWatermark("ts", "10 hours").dropDuplicatesWithinWatermark(["fp"])
            if df.isStreaming
            else cleaned.dropDuplicates(["fp"])
        )
        return deduped

    # batch leg
    batch_view = IncrementalRollup(
        spark, str(tmp_path_factory.mktemp("mv_b")), keys=["kind"], measures=["v"]
    )
    batch_view.refresh(stages(spark.read.parquet(d)))

    # streaming leg
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    stream_view = IncrementalRollup(
        spark, str(tmp_path_factory.mktemp("mv_s")), keys=["kind"], measures=["v"]
    )
    q = stream_view.stream_into(stages(stream), str(tmp_path_factory.mktemp("chk_pipe")))
    assert q.awaitTermination(300), "pipeline stream did not finish"

    b = {tuple(r) for r in batch_view.read().collect()}
    s = {tuple(r) for r in stream_view.read().collect()}
    assert s == b


def test_streaming_dedup_bounded_state(spark, tmp_path_factory):
    """dropDuplicatesWithinWatermark: duplicate fingerprints across
    micro-batches collapse to first-seen; distinct fingerprints all
    survive."""
    from datetime import datetime, timedelta

    from comlake_core_spark.streaming.windows import read_events_stream, streaming_dedup

    d = str(tmp_path_factory.mktemp("dedup_stream"))
    base = datetime(2024, 1, 1, 10, 0, 0)
    rows = []
    for batch in range(3):
        # fp_a repeats in every batch; fp_<batch> is unique per batch
        rows.append(("fp_a", base + timedelta(minutes=batch)))
        rows.append((f"fp_{batch}", base + timedelta(minutes=batch, seconds=30)))
    df = spark.createDataFrame(rows, "fp string, ts timestamp")
    df.repartition(3).write.mode("overwrite").parquet(d)

    stream = read_events_stream(spark, d, df.schema)
    chk = str(tmp_path_factory.mktemp("chk_dedup"))
    q = (
        streaming_dedup(stream, ts_col="ts", key_cols=("fp",), watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT fp FROM dedup_stream_test").collect()
    q.stop()
    fps = sorted(r["fp"] for r in out)
    assert fps == ["fp_0", "fp_1", "fp_2", "fp_a"]


def test_resize_images_fixed_output(spark, blob_dir):
    df = multimodal.load_binary_dir(spark, blob_dir, pattern="img_*.bin")
    out = multimodal.resize_images(df, width=8, height=4).collect()
    assert len(out) == 2
    for r in out:
        # static output shape regardless of input size
        assert (r["width"], r["height"]) == (8, 4)
        assert len(r["pixels"]) == 8 * 4
    # deterministic: img_a.bin is all 'A' bytes, so every pixel is 65
    a = next(r for r in out if r["id"] == "img_a.bin")
    assert set(a["pixels"]) == {65}


def test_resize_images_real_is_stubbed(spark, blob_dir):
    df = multimodal.load_binary_dir(spark, blob_dir, pattern="img_a.bin")
    with pytest.raises(NotImplementedError):
        multimodal.resize_images(df, codec="real")
