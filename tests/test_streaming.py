"""Structured-Streaming runner tests (SURVEY.md §2.11)."""

import pyspark.sql.functions as F
import pytest

from aws_etl_bank_spark.streaming import runner


@pytest.fixture()
def stream_source(spark, scratch, request):
    """A file-based stream fed from small parquet batches."""
    import uuid

    src = f"{scratch}/stream_src_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [(1, "click", 2.0), (2, "view", 3.0)], "id long, event_type string, value double"
    ).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(src)


def test_for_each_batch_requires_window_and_checkpoint(stream_source):
    with pytest.raises(ValueError, match="windowSize"):
        runner.for_each_batch(stream_source, lambda df, bid: None, {})


def test_window_size_validation():
    with pytest.raises(ValueError):
        runner._parse_window_size("whenever")
    assert runner._parse_window_size("5 seconds") == "5 seconds"


def test_for_each_batch_runs_and_emits_metrics(stream_source, scratch):
    seen = []
    metrics = runner.for_each_batch(
        stream_source,
        lambda df, bid: seen.append(df.count()),
        {"windowSize": "1 seconds", "checkpointLocation": f"{scratch}/ckpt1",
         "availableNow": True},
    )
    assert seen == [2]
    assert metrics and metrics[0]["numRecords"] == 2


def test_for_each_batch_retries_then_succeeds(stream_source, scratch):
    attempts = []

    def flaky(df, bid):
        attempts.append(bid)
        if len(attempts) < 2:
            raise RuntimeError("transient")

    metrics = runner.for_each_batch(
        stream_source, flaky,
        {"windowSize": "1 seconds", "checkpointLocation": f"{scratch}/ckpt2",
         "availableNow": True, "batchMaxRetries": 3},
    )
    assert len(attempts) == 2  # one failure + one retry
    assert metrics[0]["numRecords"] == 2


def test_for_each_batch_exhausted_retries_raises(stream_source, scratch):
    def always_fails(df, bid):
        raise RuntimeError("permanent")

    with pytest.raises(Exception):
        runner.for_each_batch(
            stream_source, always_fails,
            {"windowSize": "1 seconds", "checkpointLocation": f"{scratch}/ckpt3",
             "availableNow": True, "batchMaxRetries": 1},
        )


def test_windowed_event_counts_batch_parity(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:10:00", "click", 1.0),
            ("2024-01-01 00:20:00", "click", 2.0),
            ("2024-01-01 01:10:00", "view", 5.0),
        ],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in runner.windowed_event_counts(df, "1 hour").collect()
    }
    assert out[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert out[("2024-01-01 01:00:00", "view")] == (1, 5.0)


def test_sample_streaming_frame(spark, stream_source):
    out = runner.sample_streaming_frame(
        spark, stream_source,
        {"windowSize": "1 seconds", "pollingTimeInMs": 15000, "recordPollingLimit": 2},
    )
    assert out.count() == 2
