"""functions/timeseries.py — time_bucket / rollup / gap_fill semantics."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from aws_etl_bank_spark.functions.timeseries import (
    gap_fill, rollup_time_bucket, time_bucket)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_time_bucket_epoch_alignment(spark):
    df = spark.createDataFrame(
        [(_ts("2024-01-01 14:30:00"),), (_ts("2024-01-01 00:00:00"),),
         (_ts("2024-01-01 17:59:59"),)],
        "ts timestamp",
    )
    got = [r.b for r in df.select(time_bucket("ts", 6 * 3600).alias("b"))
           .collect()]
    assert got == [_ts("2024-01-01 12:00:00"), _ts("2024-01-01 00:00:00"),
                   _ts("2024-01-01 12:00:00")]
    with pytest.raises(ValueError):
        time_bucket("ts", 0)


def test_time_bucket_ntz_input(spark):
    """The testdata's events.ts can arrive as TIMESTAMP_NTZ (plain
    timestamp[us] parquet, the round-3 regeneration) — time_bucket must
    produce the same UTC-epoch-aligned buckets as for TIMESTAMP input."""
    df = spark.createDataFrame(
        [(_ts("2024-01-01 14:30:00"),), (_ts("2024-01-01 17:59:59"),)],
        "ts timestamp_ntz",
    )
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = [r.b for r in df.select(time_bucket("ts", 6 * 3600).alias("b"))
           .collect()]
    assert got == [_ts("2024-01-01 12:00:00"), _ts("2024-01-01 12:00:00")]


def test_events_stream_helper_normalizes_ts(spark, tmp_path):
    """sources.testdata.events_stream: ts normalizes to TimestampType
    whether the parquet holds a timestamp (NTZ) or bigint nanos."""
    import pyspark.sql.functions as F  # noqa: F811

    from aws_etl_bank_spark.sources.testdata import events_stream

    ntz_dir = str(tmp_path / "ntz")
    spark.createDataFrame(
        [(1, _ts("2024-01-01 14:30:00"))], "event_id bigint, ts timestamp_ntz"
    ).write.parquet(ntz_dir)
    assert dict(events_stream(spark, ntz_dir).dtypes)["ts"] == "timestamp"

    nano_dir = str(tmp_path / "nano")
    spark.createDataFrame(
        [(1, 1_704_119_400_000_000_000)], "event_id bigint, ts bigint"
    ).write.parquet(nano_dir)
    stream = events_stream(spark, nano_dir)
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_rollup_and_gap_fill(spark):
    df = spark.createDataFrame(
        [("a", _ts("2024-01-01 00:10:00"), 1.0),
         ("a", _ts("2024-01-01 00:50:00"), 2.0),
         # hour 01 empty for both keys
         ("a", _ts("2024-01-01 02:05:00"), 3.0),
         ("b", _ts("2024-01-01 00:30:00"), 4.0)],
        "k string, ts timestamp, v double",
    )
    rolled = rollup_time_bucket(
        df, "ts", 3600, ["k"],
        [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")])
    assert rolled.count() == 3
    filled = gap_fill(rolled, "bucket", 3600, ["k"],
                      {"n": F.lit(0).cast("long")})
    rows = {(r.k, r.bucket.hour): (r.n, r.s) for r in filled.collect()}
    # dense: 2 keys x 3 hours over the global [min, max] span
    assert len(rows) == 6
    assert rows[("a", 0)] == (2, 3.0)
    assert rows[("a", 1)] == (0, None)   # n filled, s left NULL
    assert rows[("b", 2)] == (0, None)
    assert rows[("b", 0)] == (1, 4.0)


def test_gap_fill_bounds_join_is_broadcast(spark):
    df = spark.createDataFrame(
        [("a", _ts("2024-01-01 00:10:00"), 1.0)], "k string, ts timestamp, v double")
    rolled = rollup_time_bucket(df, "ts", 3600, ["k"],
                                [F.count(F.lit(1)).alias("n")])
    plan = gap_fill(rolled, "bucket", 3600, ["k"], {"n": F.lit(0)}) \
        ._jdf.queryExecution().executedPlan().toString()
    # the 1-row bounds frame must broadcast, never shuffle-cartesian
    assert "CartesianProduct" not in plan


def test_merge_rollup_equals_full_recompute(spark):
    import pyspark.sql.functions as F

    from aws_etl_bank_spark.functions.timeseries import merge_rollup

    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 13).alias("v"),
        (F.col("id") < 600).alias("is_hist"))
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
            F.max("v").alias("mx")]
    hist = df.where("is_hist").groupBy("k").agg(*aggs)
    delta = df.where("NOT is_hist").groupBy("k").agg(*aggs)
    merged = {r["k"]: (r["n"], r["s"], r["mx"]) for r in merge_rollup(
        hist, delta, ["k"], {"n": "sum", "s": "sum", "mx": "max"}).collect()}
    full = {r["k"]: (r["n"], r["s"], r["mx"])
            for r in df.groupBy("k").agg(*aggs).collect()}
    assert merged == full


def test_merge_rollup_rejects_non_decomposable(spark):
    import pytest as pt

    from aws_etl_bank_spark.functions.timeseries import merge_rollup

    df = spark.range(1).select(F.col("id").alias("k"), F.col("id").alias("a"))
    with pt.raises(ValueError, match="mergeable"):
        merge_rollup(df, df, ["k"], {"a": "avg"})


def test_cusum_windows_form_equals_serial_recursion(spark):
    """The windows-only closed form (prefix − running-min) must equal the
    textbook serial recursion S_i = max(0, S_{i-1} + x_i − k) exactly."""
    import pyspark.sql.functions as F

    from aws_etl_bank_spark.functions.timeseries import cusum_drift

    rows = [("u", i, float(v)) for i, v in enumerate(
        [5, 9, 1, 12, 15, 2, 0, 20, 18, 3, 11, 11, 11])]
    df = (spark.createDataFrame(rows, "k string, event_id long, v double")
          .withColumn("ts", F.col("event_id")))
    k, h = 8.0, 6.0
    s, expect = 0.0, {}
    for i, v in enumerate([5, 9, 1, 12, 15, 2, 0, 20, 18, 3, 11, 11, 11]):
        s = max(0.0, s + v - k)
        if s > h:
            expect[i] = round(s, 2)
    got = {r["event_id"]: r["cusum"]
           for r in cusum_drift(df, "v", ["k"], "ts", k=k, h=h).collect()}
    assert got == expect
