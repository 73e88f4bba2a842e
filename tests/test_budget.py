"""Token-budget admission control (streaming/budget.py): the streaming
state machine must emit bit-identical admissions to the batch window-cumsum
twin, including across a multi-micro-batch replay where per-key state is
the only carrier of the running total."""

from __future__ import annotations

import importlib.util
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from comlake_core_spark.session import tables
from comlake_core_spark.streaming.budget import (
    _to_ten_thousandths,
    admit_within_budget,
    admit_within_budget_stream,
    admit_within_budget_stream_tws,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
BUDGET = 500.0


def test_ten_thousandths_matches_decimal_cast_rounding(spark):
    # python-side conversion must reproduce Spark's double->DECIMAL(14,4)
    # HALF_UP cast on awkward binary values
    df = spark.createDataFrame([(0.00005,), (327.53,), (0.12345,), (2.5e-5,)], "v double")
    got = [r["d"] for r in df.selectExpr("CAST(v AS DECIMAL(14,4)) AS d").collect()]
    import decimal
    for (v,), d in zip([(0.00005,), (327.53,), (0.12345,), (2.5e-5,)], got):
        assert _to_ten_thousandths(v) == int(d.scaleb(4)), (v, d)


@pytest.fixture(scope="module")
def ordered_stream_dir(spark, tmp_path_factory):
    """events split into 3 parquet files on global ts order (increasing
    mtimes -> deterministic replay order), so each user's rows arrive in
    event-time order across micro-batches."""
    d = str(tmp_path_factory.mktemp("budget_stream"))
    ev = tables(spark, SF_DIR, ("events",))["events"].select(
        "event_id", "ts", "user_id", "value"
    )
    pdf = ev.orderBy("ts", "event_id").toPandas()
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        path = os.path.join(d, f"batch_{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf.iloc[cuts[i] : cuts[i + 1]], preserve_index=False), path)
        os.utime(path, (1_000_000_000 + i * 100,) * 2)
    return d


def test_streaming_budget_equals_batch(spark, ordered_stream_dir, tmp_path_factory):
    schema = spark.read.parquet(ordered_stream_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .option("maxFilesPerTrigger", 1)
        .schema(schema)
        .load(ordered_stream_dir)
    )
    out = admit_within_budget_stream(stream, BUDGET)
    chk = str(tmp_path_factory.mktemp("budget_chk"))
    q = (
        out.writeStream.format("memory")
        .queryName("budget_stream_test")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    q.stop()
    streamed = {
        (r["event_id"], r["user_id"], r["cum_value"])
        for r in spark.sql("SELECT * FROM budget_stream_test").collect()
    }
    ev = tables(spark, SF_DIR, ("events",))["events"]
    batch = {
        (r["event_id"], r["user_id"], r["cum_value"])
        for r in admit_within_budget(ev, BUDGET).collect()
    }
    assert n_batches == 3  # state really crossed micro-batch boundaries
    assert streamed == batch
    # the quota must actually bite: strictly fewer admitted than events
    assert 0 < len(batch) < ev.count()


@pytest.mark.skipif(
    importlib.util.find_spec("google") is None,
    reason="transformWithState's state protocol needs google-protobuf",
)
def test_streaming_budget_tws_equals_batch(spark, ordered_stream_dir, tmp_path_factory):
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    schema = spark.read.parquet(ordered_stream_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .option("maxFilesPerTrigger", 1)
        .schema(schema)
        .load(ordered_stream_dir)
    )
    out = admit_within_budget_stream_tws(stream, BUDGET)
    chk = str(tmp_path_factory.mktemp("budget_tws_chk"))
    q = (
        out.writeStream.format("memory")
        .queryName("budget_tws_test")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    streamed = {
        (r["event_id"], r["user_id"], r["cum_value"])
        for r in spark.sql("SELECT * FROM budget_tws_test").collect()
    }
    ev = tables(spark, SF_DIR, ("events",))["events"]
    batch = {
        (r["event_id"], r["user_id"], r["cum_value"])
        for r in admit_within_budget(ev, BUDGET).collect()
    }
    assert streamed == batch
