"""functions/eventstream.py funnel/z-score + llm upsample_by_weight."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from aws_etl_bank_spark.functions.eventstream import funnel_stages, rolling_zscore
from aws_etl_bank_spark.llm import upsample_by_weight


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        [
            # u1: full funnel in order
            (1, "view", _ts("2024-01-01 10:00:00")),
            (1, "click", _ts("2024-01-01 10:01:00")),
            (1, "purchase", _ts("2024-01-01 10:02:00")),
            # u2: purchase BEFORE view/click — funnel must not count it
            (2, "purchase", _ts("2024-01-01 09:00:00")),
            (2, "view", _ts("2024-01-01 10:00:00")),
            (2, "click", _ts("2024-01-01 10:30:00")),
            # u3: click only, never viewed — not in the funnel at all
            (3, "click", _ts("2024-01-01 10:00:00")),
        ],
        "user_id int, event_type string, ts timestamp",
    )


def test_funnel_order_enforced(events):
    out = {r.user_id: r for r in
           funnel_stages(events, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2}            # u3 never reached stage 0
    assert out[1].purchase_ts == _ts("2024-01-01 10:02:00")
    assert out[2].click_ts == _ts("2024-01-01 10:30:00")
    assert out[2].purchase_ts is None    # pre-view purchase ignored


def test_funnel_tie_counts(events):
    # an event AT the previous stage's timestamp counts (>=, not >)
    tie = events.union(events.sparkSession.createDataFrame(
        [(1, "signup", _ts("2024-01-01 10:00:00"))],
        "user_id int, event_type string, ts timestamp"))
    out = funnel_stages(tie, ["view", "signup"]).collect()[0]
    assert out.signup_ts == _ts("2024-01-01 10:00:00")


def test_funnel_validation(events):
    with pytest.raises(ValueError):
        funnel_stages(events, [])
    with pytest.raises(ValueError):
        funnel_stages(events, ["view", "view"])
    with pytest.raises(ValueError):
        funnel_stages(events, ["view"], strategy="nope")


def test_funnel_strategies_agree_and_arrays_single_scan(events, tmp_path):
    # both strategies must return identical rows; the arrays form must
    # plan ONE scan / ONE exchange / NO joins (the joins form recomputes
    # the shared prefix each stage — 6 scans for 3 stages)
    stages = ["view", "click", "purchase"]
    key = lambda rows: sorted(map(tuple, rows))
    a = funnel_stages(events, stages).collect()
    j = funnel_stages(events, stages, strategy="joins").collect()
    assert key(a) == key(j)
    pq = str(tmp_path / "ev.parquet")
    events.write.parquet(pq)
    plan = funnel_stages(events.sparkSession.read.parquet(pq), stages) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_rolling_zscore_excludes_self(spark):
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate([10, 20, 10, 10, 100])],
        "k string, i int, v double",
    )
    out = {r.i: r.zscore for r in
           rolling_zscore(df, "v", ["k"], ["i"], window_rows=10).collect()}
    assert out[0] is None                # no trailing rows
    assert out[1] is None                # 1 trailing row: stddev undefined
    # i=2: 10 vs trailing [10, 20] -> (10-15)/7.0711
    assert out[2] == pytest.approx(-0.70710678, rel=1e-6)
    # i=4: outlier scored against [10,20,10,10], self excluded
    assert out[4] == pytest.approx((100 - 12.5) / 5.0, rel=1e-6)
    with pytest.raises(ValueError):
        rolling_zscore(df, "v", ["k"], ["i"], window_rows=1)


def test_rolling_zscore_constant_window_is_null(spark):
    df = spark.createDataFrame(
        [("k", i, 10.0) for i in range(3)] + [("k", 3, 99.0)],
        "k string, i int, v double",
    )
    out = {r.i: r.zscore for r in
           rolling_zscore(df, "v", ["k"], ["i"], window_rows=10).collect()}
    # sd = 0: NULL, never IEEE NaN/Inf (engines disagree on x/0.0)
    assert out[2] is None and out[3] is None


def test_rolling_zscore_bucketed_identical_results(spark):
    """The hot-key split path (operators/windows.py) must return exactly
    the plain window's rows — including frames that straddle row-bucket
    boundaries, short frames at a key's start, NULL keys, and the
    constant-window NULL rule."""
    import random

    rng = random.Random(7)
    rows = [("hot", float(i), float(rng.randint(0, 50))) for i in range(900)]
    rows += [("cold", float(i), float(i % 7)) for i in range(30)]
    rows += [(None, float(i), float(i % 5)) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, t double, v double")

    plain = rolling_zscore(df, "v", ["k"], ["t"], window_rows=25)
    for bucket_rows in (25, 64, 200):   # min allowed, non-divisor, large
        split = rolling_zscore(df, "v", ["k"], ["t"], window_rows=25,
                               coarse_bucket_seconds=50.0,
                               bucket_rows=bucket_rows)
        a = sorted(map(tuple, plain.collect()),
                   key=lambda x: (x[0] or "", x[1]))
        b = sorted(map(tuple, split.collect()),
                   key=lambda x: (x[0] or "", x[1]))
        assert len(a) == len(b)
        for ra, rb in zip(a, b):
            assert ra[:3] == rb[:3]
            za, zb = ra[3], rb[3]
            assert (za is None) == (zb is None)
            if za is not None:
                assert za == pytest.approx(zb, rel=1e-9)


def test_rolling_zscore_bucketed_splits_hot_key(spark):
    """One hot key must spread across >1 window task in the split path."""
    import pyspark.sql.functions as F

    n = 4000
    df = spark.createDataFrame(
        [("hot", float(i), float(i % 13)) for i in range(n)],
        "k string, t double, v double")
    split = rolling_zscore(df, "v", ["k"], ["t"], window_rows=50,
                           coarse_bucket_seconds=100.0, bucket_rows=500)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        nparts = (split.groupBy(F.spark_partition_id().alias("p"))
                  .agg(F.sum("zscore")).count())
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert nparts > 1


def test_upsample_by_weight_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 10 else "b") for i in range(20)],
        "doc_id bigint, source string",
    )
    out = upsample_by_weight(df, "source", {"a": 2.5, "b": 0.0})
    rows = out.groupBy("source").count().collect()
    by_src = {r.source: r["count"] for r in rows}
    # a: ids 0..9 -> 2 copies each + 1 extra for ids 0..4 => 25; b dropped
    assert by_src == {"a": 25}
    # copy index is dense 0-based per row
    copies = [r.copy for r in out.filter("doc_id = 0").collect()]
    assert sorted(copies) == [0, 1, 2]
    # identical on rerun (determinism is the point vs df.sample)
    again = upsample_by_weight(df, "source", {"a": 2.5, "b": 0.0})
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    with pytest.raises(ValueError):
        upsample_by_weight(df, "source", {"a": -1.0})


def test_cohort_retention_excludes_preanchor(spark):
    import datetime as dt

    from aws_etl_bank_spark.functions.eventstream import cohort_retention

    wk = 7 * 86400

    def at(week, sec=0):
        return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=week * wk + sec)

    ev = spark.createDataFrame(
        [
            (1, "view", at(0)),       # pre-signup: negative offset, dropped
            (1, "signup", at(1)),
            (1, "click", at(1, 60)),  # week 0 (same bucket as anchor)
            (1, "click", at(3)),      # week 2
            (2, "signup", at(1)),
            (2, "view", at(2)),       # week 1
            (3, "view", at(2)),       # never signed up: not cohorted
        ],
        "user_id int, event_type string, ts timestamp",
    )
    out = {(r.cohort_bucket, r.bucket_offset): r.n_active
           for r in cohort_retention(ev, "signup").collect()}
    # week-0 row counts the anchor events themselves (both users)
    assert out[(1, 0)] == 2
    assert out[(1, 1)] == 1   # u2's view
    assert out[(1, 2)] == 1   # u1's click
    assert (1, -1) not in out and len(out) == 3

    with pytest.raises(ValueError):
        cohort_retention(ev, "signup", bucket_seconds=0)


def test_funnel_arrays_strategy_ansi_safe(events, spark):
    # ADVICE r5: the arrays strategy hits element_at on an EMPTY
    # filtered array for every broken funnel — must not raise
    # INVALID_ARRAY_INDEX under Spark 4's default ansi=true
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        out = {r.user_id: r for r in
               funnel_stages(events, ["view", "click", "purchase"],
                             strategy="arrays").collect()}
        assert set(out) == {1, 2}
        assert out[2].purchase_ts is None
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


# --- batch sessionize / grouped median / MAD -----------------------------


def test_sessionize_gap_splits_on_gap(spark):
    from aws_etl_bank_spark.functions.eventstream import sessionize_gap

    rows = [(1, 1, "2024-01-01 00:00:00"), (1, 2, "2024-01-01 01:00:00"),
            (1, 3, "2024-01-01 09:00:00"),  # 8h gap > 6h → new session
            (2, 4, "2024-01-01 00:00:00")]
    df = spark.createDataFrame(rows, "user_id long, event_id long, s string") \
        .select("user_id", "event_id", F.to_timestamp("s").alias("ts"))
    out = {(r["user_id"], r["session_idx"]): (r["n_events"], r["duration_us"])
           for r in sessionize_gap(df, gap_seconds=21600).collect()}
    assert out == {(1, 1): (2, 3600_000_000), (1, 2): (1, 0), (2, 1): (1, 0)}


def test_grouped_median_odd_even_and_nulls(spark):
    from aws_etl_bank_spark.functions.eventstream import grouped_median

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 9.0), ("a", 5.0),            # odd → 5.0
         ("b", 1.0), ("b", 2.0), ("b", 10.0), ("b", 20.0),  # even → 6.0
         ("c", 7.0), ("c", None)],                      # null dropped → 7.0
        "k string, v double")
    out = {r["k"]: r["median"]
           for r in grouped_median(df, ["k"], "v").collect()}
    assert out == {"a": 5.0, "b": 6.0, "c": 7.0}


def test_mad_anomalies_flags_planted_outlier(spark):
    from aws_etl_bank_spark.functions.eventstream import mad_anomalies

    base = [("u", i, 100.0 + (i % 7)) for i in range(50)]
    rows = base + [("u", 99, 10_000.0)]  # planted whale
    df = spark.createDataFrame(rows, "k string, event_id long, v double")
    out = mad_anomalies(df, ["k"], "v", id_cols=["event_id"]).collect()
    assert [r["event_id"] for r in out] == [99]
    assert out[0]["mz"] > 3.5
    # a constant group (MAD = 0) is skipped, not spammed
    const = spark.createDataFrame([("c", i, 5.0) for i in range(10)],
                                  "k string, event_id long, v double")
    assert mad_anomalies(const, ["k"], "v", id_cols=["event_id"]).count() == 0
