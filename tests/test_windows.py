"""Hot-key window splitting (operators/windows.py): the split plans must
be value-identical to the plain serial-per-key windows."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from aws_etl_bank_spark.operators.windows import running_sum_split


def _plain_running_sum(df, keys, order_col, value_col, out_col):
    w = Window.partitionBy(*keys).orderBy(order_col)  # RANGE default frame
    return df.withColumn(out_col, F.sum(value_col).over(w))


def test_running_sum_split_matches_plain(spark):
    """Ties (RANGE frame: equal order values share the accumulated sum),
    NULL keys, NULL values, and bucket boundaries all must agree."""
    rows = [
        ("a", 1.0, 10.0), ("a", 1.0, 5.0),      # tie inside a bucket
        ("a", 150.0, 2.0), ("a", 310.0, None),  # later buckets; null value
        ("a", 310.0, 4.0),                      # tie across null value
        (None, 10.0, 1.0), (None, 250.0, 7.0),  # null key spans buckets
        ("b", 5.0, None), ("b", 205.0, None),   # all-null key stays null
    ]
    df = spark.createDataFrame(rows, "k string, t double, v double")
    plain = _plain_running_sum(df, ["k"], "t", "v", "acc")
    split = running_sum_split(df, ["k"], "t", "v", "acc",
                              coarse_bucket_seconds=100.0)
    assert split.columns == plain.columns
    key = lambda x: (x[0] or "", x[1], x[2] if x[2] is not None else -1e18)
    a = sorted(map(tuple, plain.collect()), key=key)
    b = sorted(map(tuple, split.collect()), key=key)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[:3] == rb[:3]
        if ra[3] is None:
            assert rb[3] is None
        else:
            assert rb[3] == pytest.approx(ra[3], rel=1e-12)
    with pytest.raises(ValueError):
        running_sum_split(df, ["k"], "t", "v", "acc", coarse_bucket_seconds=0)


def test_running_sum_split_spreads_hot_key(spark):
    n = 4000
    df = spark.createDataFrame(
        [("hot", float(i), float(i % 9)) for i in range(n)],
        "k string, t double, v double")
    split = running_sum_split(df, ["k"], "t", "v", "acc",
                              coarse_bucket_seconds=100.0)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        nparts = (split.groupBy(F.spark_partition_id().alias("p"))
                  .agg(F.sum("acc")).count())
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert nparts > 1
    # and the final accumulated value is the full-key sum
    top = split.orderBy(F.col("t").desc()).first()
    assert top["acc"] == pytest.approx(sum(float(i % 9) for i in range(n)))


from hypothesis import given, settings, strategies as st


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3),            # key
                  st.integers(0, 50),           # time
                  st.integers(-5, 5)),          # value
        min_size=1, max_size=30),
    bucket=st.sampled_from([1.0, 3.0, 7.0, 100.0]),
)
def test_running_sum_split_property_matches_plain(spark, rows, bucket):
    """Property: for any key/time/value multiset (ties included, any
    bucket width) the split running sum equals the plain RANGE window."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(k, float(t), float(v)) for k, t, v in rows],
        "k int, t double, v double")
    plain = df.withColumn(
        "acc", F.sum("v").over(Window.partitionBy("k").orderBy("t")))
    split = running_sum_split(df, ["k"], "t", "v", "acc",
                              coarse_bucket_seconds=bucket)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, split.collect()))
    assert a == b


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(-4, 4)),
        min_size=1, max_size=25),
    window_rows=st.integers(1, 4),
    bucket=st.sampled_from([2.0, 9.0, 50.0]),
)
def test_trailing_rows_split_property_matches_plain(spark, rows, window_rows,
                                                    bucket):
    """Property: trailing -N..-1 sum over the split (key, row-bucket)
    machinery equals the plain serial window for any multiset — the
    boundary-carry reconstruction must be row-exact.  Distinct times
    per key (the split's tie freedom differs from the plain window's
    only on exact ties, which the zscore oracle already covers)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from aws_etl_bank_spark.operators.windows import (
        HELPER_COLS, trailing_rows_window_split)

    dedup = {}
    for k, t, v in rows:
        dedup[(k, t)] = v
    data = [(k, float(t), float(v)) for (k, t), v in dedup.items()]
    df = spark.createDataFrame(data, "k int, t double, v double")
    pw = (Window.partitionBy("k").orderBy("t")
          .rowsBetween(-window_rows, -1))
    plain = df.withColumn("s", F.sum("v").over(pw))
    aug, sw = trailing_rows_window_split(
        df, ["k"], ["t"], window_rows, coarse_bucket_seconds=bucket,
        bucket_rows=max(window_rows, 3))
    split = (aug.withColumn("s", F.sum("v").over(sw))
             .filter("__own").drop(*HELPER_COLS))
    a = sorted(map(tuple, plain.select("k", "t", "v", "s").collect()))
    b = sorted(map(tuple, split.select("k", "t", "v", "s").collect()))
    assert a == b
