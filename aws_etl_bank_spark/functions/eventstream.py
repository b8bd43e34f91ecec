"""Event-stream analytics primitives: ordered multi-stage funnels and
rolling z-score anomaly detection (beyond-reference; the reference's
event handling stops at calendar-field extraction).

Both are single-purpose compositions of built-in ops — no UDFs, no
driver-side loops — so Catalyst owns the physical plan end to end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def funnel_stages(df: DataFrame, stages: list[str],
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts", strategy: str = "arrays") -> DataFrame:
    """Ordered-funnel timestamps per user: stage k's timestamp is the
    EARLIEST event of type ``stages[k]`` at-or-after the user's stage
    k-1 timestamp (classic view → click → purchase attribution).  Output:
    one row per user who reached stage 0, with a nullable ``<stage>_ts``
    column per stage; a NULL means the funnel broke there.

    ``strategy="arrays"`` (default): ONE scan of the (stage-filtered)
    events and ONE shuffle by ``user_col`` — each user's per-stage
    timestamps are collected as sorted arrays and the iterated min
    ("earliest ≥ previous stage's ts") evaluates as pure Catalyst array
    expressions, no joins.  Per-row state is the user's stage-event
    timestamps, so a pathological single user (bot) with millions of
    same-type events inflates one row — for that shape use
    ``strategy="joins"``, the original per-stage filtered-aggregate
    chain whose per-user state is ONE timestamp (map-side min-reduced,
    fully skew-tolerant) at the price of one fact scan per stage: Spark
    recomputes the shared prefix on both sides of each stage's
    join-back, which the arrays form exists to avoid.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    if len(set(stages)) != len(stages):
        raise ValueError("stages must be distinct event types")
    first = stages[0]
    if strategy == "joins":
        cur = (
            df.filter(F.col(type_col) == first)
            .groupBy(user_col).agg(F.min(ts_col).alias(f"{first}_ts"))
        )
        prev = f"{first}_ts"
        for s in stages[1:]:
            nxt = (
                df.filter(F.col(type_col) == s)
                .join(cur.select(user_col, prev), user_col)
                .filter(F.col(ts_col) >= F.col(prev))
                .groupBy(user_col).agg(F.min(ts_col).alias(f"{s}_ts"))
            )
            cur = cur.join(nxt, user_col, "left")
            prev = f"{s}_ts"
        return cur
    if strategy != "arrays":
        raise ValueError(f"unknown strategy {strategy!r}")
    lists = (
        df.filter(F.col(type_col).isin(stages))
        .groupBy(user_col)
        .agg(*[F.sort_array(F.collect_list(
                   F.when(F.col(type_col) == s, F.col(ts_col))))
               .alias(f"__{s}") for s in stages])
    )
    # stage 0: plain earliest; stage k: earliest element ≥ stage k-1's
    # ts (a NULL prev makes the lambda NULL → filter drops everything →
    # element_at on empty is NULL, propagating the broken funnel).
    # try_element_at, not element_at: the out-of-bounds-is-NULL behavior
    # this relies on — hit on EVERY broken funnel — is non-ANSI; under
    # Spark 4's default ansi=true plain element_at raises
    # INVALID_ARRAY_INDEX on the empty filtered array, so the library
    # must not depend on the session pinning ansi=false.
    out = lists.withColumn(f"{first}_ts",
                           F.try_element_at(F.col(f"__{first}"), F.lit(1)))
    prev = f"{first}_ts"
    for s in stages[1:]:
        out = out.withColumn(
            f"{s}_ts",
            F.try_element_at(
                F.filter(F.col(f"__{s}"),
                         lambda x: x >= F.col(prev)), F.lit(1)))
        prev = f"{s}_ts"
    return (out.where(F.col(f"{first}_ts").isNotNull())
            .select(user_col, *[f"{s}_ts" for s in stages]))


def cohort_retention(df: DataFrame, anchor_type: str,
                     bucket_seconds: int = 7 * 86400,
                     user_col: str = "user_id", type_col: str = "event_type",
                     ts_col: str = "ts") -> DataFrame:
    """Cohort retention matrix: users cohorted by the epoch-aligned
    bucket of their first ``anchor_type`` event (e.g. signup week), then
    counted distinct per (cohort, bucket-offset) of ANY later activity —
    the classic week-0/week-N retention triangle.  Pre-anchor activity
    (negative offset) is excluded.

    Shape: anchor min-agg (shuffle on user) → activity join (same key,
    exchange reused) → distinct on (cohort, offset, user) → count.  All
    keys are low-cardinality except user, which partial aggregation
    collapses map-side — no driver loops, no windows, safe at 100 TB.
    Output: (cohort_bucket, bucket_offset, n_active) as bigints.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")

    def bucket(c):
        # cast covers TIMESTAMP_NTZ (unix_timestamp requires TIMESTAMP)
        return F.floor(
            F.unix_timestamp(F.col(c).cast("timestamp")) / bucket_seconds
        ).cast("long")

    cohorts = (
        df.filter(F.col(type_col) == anchor_type)
        .groupBy(user_col).agg(F.min(ts_col).alias("__first"))
        .select(user_col, bucket("__first").alias("cohort_bucket"))
    )
    return (
        df.select(user_col, bucket(ts_col).alias("__b"))
        .join(cohorts, user_col)
        .withColumn("bucket_offset",
                    (F.col("__b") - F.col("cohort_bucket")).cast("long"))
        .filter(F.col("bucket_offset") >= 0)
        .select("cohort_bucket", "bucket_offset", user_col).distinct()
        .groupBy("cohort_bucket", "bucket_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def rolling_zscore(df: DataFrame, value_col: str, keys: list[str],
                   order_cols: list[str], window_rows: int = 100,
                   out_col: str = "zscore",
                   coarse_bucket_seconds: float | None = None,
                   bucket_rows: int | None = None) -> DataFrame:
    """Rolling z-score of ``value_col`` against the trailing
    ``window_rows`` rows per key (the row itself excluded, so an outlier
    cannot mask itself) — streaming-style anomaly scoring as one sorted
    window pass.  NULL until a key has 2 trailing rows (sample stddev
    needs 2) and NULL when the trailing window is constant (sd = 0):
    IEEE double division would otherwise yield engine-dependent
    NaN/±Inf.  One exchange on ``keys``; a hot key serializes like any
    window — pass ``coarse_bucket_seconds`` (width of the time pre-split
    of the leading order column) to split each key across
    ``bucket_rows``-row tasks with exact results, via the shared
    boundary-carry helper (operators/windows.py, the generalization of
    asof_join's coarse_bucket_seconds).
    """
    if window_rows < 2:
        raise ValueError("window_rows must be >= 2")
    # __mu/__sd are materialized as columns BEFORE the when(): inlining
    # `sd` into both the predicate and the division makes Catalyst emit
    # the stddev window expression TWICE (no CSE across extracted window
    # expressions — the r17 plan showed three _we slots for two distinct
    # aggregates), and a sliding ROWS frame re-aggregates its whole
    # frame per row, so the duplicate costs a full extra O(window_rows)
    # scan per row.  Same IEEE values either way (guide §1.2 step 2).
    def _combine(d: DataFrame, w) -> DataFrame:
        d = (d.withColumn("__mu", F.avg(value_col).over(w))
             .withColumn("__sd", F.stddev_samp(value_col).over(w)))
        return d.withColumn(
            out_col,
            F.when(F.col("__sd") != 0,
                   (F.col(value_col) - F.col("__mu")) / F.col("__sd"))
        ).drop("__mu", "__sd")

    if coarse_bucket_seconds is not None:
        from aws_etl_bank_spark.operators.windows import (
            HELPER_COLS, trailing_rows_window_split)

        split, w = trailing_rows_window_split(
            df, keys, order_cols, window_rows,
            coarse_bucket_seconds, bucket_rows)
        return (_combine(split, w)
                .filter(F.col("__own")).drop(*HELPER_COLS))
    w = (Window.partitionBy(*keys).orderBy(*order_cols)
         .rowsBetween(-window_rows, -1))
    return _combine(df, w)


def sessionize_gap(df: DataFrame, gap_seconds: int = 21600,
                   user_col: str = "user_id", ts_col: str = "ts",
                   order_tiebreak: str = "event_id") -> DataFrame:
    """Batch gap-based sessionization — the offline twin of the
    streaming ``session_window`` in streaming/sessionize.py: a new
    session starts when the gap to the previous event of the same user
    exceeds ``gap_seconds``.

    One window pass per user (lag → new-session flag → running count =
    session index), then a same-key aggregation: both shuffles hash on
    the user, so parallelism = number of users and a 100 TB event log
    sessionizes without any global ordering.  The (ts, tiebreak) sort
    key makes simultaneous events deterministic.  Session duration is
    exact epoch-microsecond arithmetic (integer on every engine — no
    float epoch, no second-truncation ambiguity)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    # NTZ-tolerant: unix_micros requires TIMESTAMP; an NTZ column casts
    # value-identically under the engine's UTC session timezone
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_sess = (prev.isNull()
                | ((us - prev) > F.lit(int(gap_seconds) * 1_000_000)))
    flagged = df.withColumn("__new", new_sess.cast("int"))
    run = (Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
           .rowsBetween(Window.unboundedPreceding, 0))
    sess = flagged.withColumn("session_idx", F.sum("__new").over(run))
    return (sess.groupBy(user_col, "session_idx")
            .agg(F.min(ts_col).alias("session_start"),
                 F.count(F.lit(1)).alias("n_events"),
                 (F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
                  - F.min(F.unix_micros(F.col(ts_col).cast("timestamp"))))
                 .alias("duration_us"))
            .select(user_col, F.col("session_idx").cast("long"),
                    "session_start",
                    F.col("n_events").cast("long").alias("n_events"),
                    F.col("duration_us").cast("long").alias("duration_us")))


def grouped_median(df: DataFrame, keys: list[str], value_col: str,
                   out_col: str = "median") -> DataFrame:
    """Exact per-group median WITHOUT an engine median/percentile
    function, so the result is bit-identical on every engine: rank the
    group's values, pick positions ⌊(n+1)/2⌋ and ⌈(n+1)/2⌉, average
    the two (``(lo + hi) / 2.0`` — one fixed IEEE expression, where
    engine-native percentile interpolation formulas are allowed to
    differ in the last ulp).

    One keyed window (rank) + one keyed hash-agg, both hashed on the
    group keys: parallelism = number of groups, nothing global."""
    w = Window.partitionBy(*keys).orderBy(F.col("__v").asc())
    ranked = (df.where(F.col(value_col).isNotNull())
              .select(*keys, F.col(value_col).alias("__v"))
              .withColumn("__r", F.row_number().over(w))
              .withColumn("__n", F.count(F.lit(1)).over(
                  Window.partitionBy(*keys))))
    lo = F.floor((F.col("__n") + 1) / 2)
    hi = F.ceil((F.col("__n") + 1) / 2)
    picked = ranked.where((F.col("__r") == lo) | (F.col("__r") == hi))
    # a group with odd n picks ONE row (lo == hi): avg of the single
    # value; even n picks two and averages them
    return (picked.groupBy(*keys)
            .agg(((F.min("__v") + F.max("__v")) / 2.0).alias(out_col)))


def mad_anomalies(df: DataFrame, keys: list[str], value_col: str,
                  id_cols: list[str] | None = None,
                  threshold: float = 3.5) -> DataFrame:
    """Robust per-group outlier detection via the modified z-score
    (Iglewicz–Hoaglin): ``M_i = 0.6745·(x_i − median) / MAD`` with
    ``MAD = median(|x_i − median|)``; rows with ``|M_i| > threshold``
    are anomalies.  Median/MAD resist the very outliers a mean/stddev
    z-score is dragged by — the standard data-quality screen for a
    metric column at ingest.

    Two :func:`grouped_median` passes (values, then absolute
    deviations) joined back broadcast (group-cardinality-sized), then a
    map-only flag — every shuffle is keyed on the group.  Groups whose
    MAD is 0 (over half the values identical) are skipped: the modified
    z-score is undefined there, and emitting every non-median row as
    anomalous would be noise, not signal."""
    med = grouped_median(df, keys, value_col, "med")
    dev = (df.join(F.broadcast(med), keys)
           .withColumn("__adev", F.abs(F.col(value_col) - F.col("med"))))
    mad = grouped_median(dev, keys, "__adev", "mad")
    scored = (df.join(F.broadcast(med), keys)
              .join(F.broadcast(mad), keys)
              .where(F.col("mad") > 0)
              .withColumn("mz", F.lit(0.6745)
                          * (F.col(value_col) - F.col("med"))
                          / F.col("mad")))
    out_cols = (id_cols or []) + keys + [value_col, "med", "mad", "mz"]
    return (scored.where(F.abs(F.col("mz")) > F.lit(threshold))
            .select(*out_cols))
