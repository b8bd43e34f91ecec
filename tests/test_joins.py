"""asof_join / range_join (operators/joins.py) — semantics and plan shape.

Beyond-reference operators (the reference has only equi-joins,
glue-jobs/r2g_account.py joins included); semantics are pinned against
hand-computed expectations and, in the registry, against DuckDB's native
ASOF JOIN / inequality join.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from aws_etl_bank_spark.operators.joins import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:00:05"), 101.0),
            ("A", _ts("2024-01-01 10:00:10"), 102.0),
            ("B", _ts("2024-01-01 10:00:03"), 50.0),
        ],
        "sym string, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:59:59"), 10),  # before any quote
            ("A", _ts("2024-01-01 10:00:05"), 20),  # tie -> matches 10:00:05
            ("A", _ts("2024-01-01 10:00:07"), 30),  # between -> 10:00:05
            ("B", _ts("2024-01-01 10:00:04"), 40),
            ("C", _ts("2024-01-01 10:00:00"), 50),  # key with no quotes
        ],
        "sym string, ts timestamp, qty int",
    )
    return quotes, trades


def test_asof_backward(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="sym", left_ts="ts").orderBy("sym", "ts")
    rows = {(r.sym, r.ts.second): (r.px, r.ts_r and r.ts_r.second)
            for r in out.collect()}
    assert out.count() == 5  # left-outer: every trade survives
    assert rows[("A", 59)] == (None, None)
    assert rows[("A", 5)] == (101.0, 5)   # tie matches
    assert rows[("A", 7)] == (101.0, 5)
    assert rows[("B", 4)] == (50.0, 3)
    assert rows[("C", 0)] == (None, None)


def test_asof_forward_and_tolerance(quotes_trades):
    quotes, trades = quotes_trades
    fwd = asof_join(trades, quotes, on="sym", left_ts="ts",
                    direction="forward")
    rows = {(r.sym, r.ts.second): r.px for r in fwd.collect()}
    assert rows[("A", 59)] == 100.0   # next quote at 10:00:00
    assert rows[("A", 7)] == 102.0
    assert rows[("C", 0)] is None

    tol = asof_join(trades, quotes, on="sym", left_ts="ts",
                    tolerance_seconds=1.0)
    rows = {(r.sym, r.ts.second): r.px for r in tol.collect()}
    assert rows[("A", 59)] is None
    assert rows[("A", 5)] == 101.0    # exact tie, distance 0
    assert rows[("A", 7)] is None     # 2 s away > 1 s horizon
    assert rows[("B", 4)] == 50.0     # 1 s away, inclusive


def test_asof_payload_travels_as_one_row(spark):
    """A NULL payload column in the matched right row must stay NULL —
    not be backfilled from an older right row."""
    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 5, "old", "x"), (1, 8, None, "y")],
        "k int, t int, a string, b string",
    )
    row = asof_join(left, right, on="k", left_ts="t").collect()[0]
    assert (row.a, row.b, row.t_r) == (None, "y", 8)


def test_asof_single_shuffle(quotes_trades):
    quotes, trades = quotes_trades
    plan = asof_join(trades, quotes, on="sym", left_ts="ts") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_range_join_semantics(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 250.0), (4, -3.0)], "pid int, v double")
    ivs = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 10.0, 20.0), (30, 14.0, 16.0),
         (40, 5.0, 4.0)],   # degenerate hi < lo
        "iid int, lo double, hi double",
    )
    out = range_join(points, ivs, "v", "lo", "hi", bucket_width=8.0)
    got = sorted((r.pid, r.iid) for r in out.collect())
    # closed bounds: v=5 in [0,10]; v=15 in [10,20] and [14,16]
    assert got == [(1, 10), (2, 20), (2, 30)]


def test_range_join_no_nested_loop(spark):
    points = spark.range(100).select(
        F.col("id").alias("pid"), (F.col("id") * 2.5).alias("v"))
    ivs = spark.range(50).select(
        F.col("id").alias("iid"), (F.col("id") * 3.0).alias("lo"),
        (F.col("id") * 3.0 + 10).alias("hi"))
    plan = range_join(points, ivs, "v", "lo", "hi", bucket_width=10.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_matches_naive(spark):
    """Bucketed plan == naive inequality join on a dense random-ish grid,
    across bucket widths (bucket boundaries must not change results)."""
    points = spark.range(200).select(
        F.col("id").alias("pid"),
        (F.pmod(F.col("id") * 37, F.lit(97)).cast("double")).alias("v"))
    ivs = spark.range(60).select(
        F.col("id").alias("iid"),
        F.pmod(F.col("id") * 53, F.lit(90)).cast("double").alias("lo"),
        (F.pmod(F.col("id") * 53, F.lit(90)) + 7).cast("double").alias("hi"))
    naive = sorted(
        (r.pid, r.iid)
        for r in points.crossJoin(ivs)
        .filter(F.col("v").between(F.col("lo"), F.col("hi"))).collect())
    for width in (1.0, 7.0, 64.0):
        got = sorted((r.pid, r.iid) for r in range_join(
            points, ivs, "v", "lo", "hi", bucket_width=width).collect())
        assert got == naive, f"width={width}"


def test_asof_null_right_ts_never_matches(spark):
    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame([(1, None, "leak")], "k int, t int, a string")
    row = asof_join(left, right, on="k", left_ts="t").collect()[0]
    assert (row.a, row.t_r) == (None, None)


def test_asof_coarse_bucket_identical_results(quotes_trades):
    """coarse_bucket_seconds must not change ANY result — including
    cross-bucket matches (a trade whose quote lives in an earlier
    bucket) and the tie/tolerance/forward paths."""
    quotes, trades = quotes_trades
    base = asof_join(trades, quotes, on="sym", left_ts="ts")
    for kwargs in (
        {},                       # 2 s buckets: quote 10:00:05 and trade
        {"direction": "forward"}, # 10:00:07 land in different buckets
        {"tolerance_seconds": 1.0},
    ):
        a = asof_join(trades, quotes, on="sym", left_ts="ts", **kwargs)
        b = asof_join(trades, quotes, on="sym", left_ts="ts",
                      coarse_bucket_seconds=2.0, **kwargs)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="sym", left_ts="ts",
                  coarse_bucket_seconds=0)


def test_asof_coarse_bucket_null_keys_match_unbucketed(spark):
    """NULL join keys form one window partition in the plain plan, so the
    bucketed plan's carry join must be NULL-safe: a NULL-key trade whose
    quote lives in an earlier bucket still gets the carried payload."""
    left = spark.createDataFrame(
        [(None, 10.0), (None, 250.0), ("a", 250.0)],
        "k string, t double")
    right = spark.createDataFrame(
        [(None, 5.0, "nq"), ("a", 5.0, "aq")],
        "k string, t double, payload string")
    plain = asof_join(left, right, on="k", left_ts="t")
    split = asof_join(left, right, on="k", left_ts="t",
                      coarse_bucket_seconds=100.0)
    assert sorted(map(tuple, plain.collect()), key=lambda x: (x[0] or "", x[1])) \
        == sorted(map(tuple, split.collect()), key=lambda x: (x[0] or "", x[1]))
    # and the cross-bucket NULL-key row specifically carries the payload
    got = {(r.k, r.t): r.payload for r in split.collect()}
    assert got[(None, 250.0)] == "nq"


def test_asof_coarse_bucket_splits_hot_key(spark):
    """One hot key serializes the plain window into a single task; the
    bucketed variant must spread the same key over >1 task and still
    return identical rows."""
    n = 4000
    left = spark.createDataFrame(
        [("hot", float(i)) for i in range(n)], "k string, t double")
    right = spark.createDataFrame(
        [("hot", float(i) + 0.5, i) for i in range(0, n, 2)],
        "k string, t double, payload int")

    plain = asof_join(left, right, on="k", left_ts="t")
    split = asof_join(left, right, on="k", left_ts="t",
                      coarse_bucket_seconds=100.0)

    # the collected result must consume a window-derived column
    # ("payload") — a count() on top lets Catalyst prune the whole
    # window and pid then reflects the raw scan's 32 partitions
    npart = (lambda df: len(df.groupBy(F.spark_partition_id().alias("p"))
                            .agg(F.sum("payload")).collect()))
    # AQE coalescing folds this tiny shuffle to 1 partition either way;
    # what's under test is the hash-partitioning key space
    spark = left.sparkSession
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        assert npart(plain) == 1      # one hot key -> one window task
        assert npart(split) > 1       # bucket splits the hot key
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert sorted(map(tuple, plain.collect())) \
        == sorted(map(tuple, split.collect()))
    # window partition spec must carry the bucket column
    assert "__bkt" in split._jdf.queryExecution().executedPlan().toString()
