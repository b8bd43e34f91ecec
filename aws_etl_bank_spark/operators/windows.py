"""Hot-key splitting for trailing row windows (beyond-reference; the
reference has no window operators at all — SURVEY.md §2.5 covers only
running sums).

A ``Window.partitionBy(key).orderBy(ts).rowsBetween(-N, -1)`` serializes
each key into one task; AQE cannot split a window partition, so one hot
key becomes the stage's wall clock at scale.  ``asof_join`` solved this
for its payload-carry window with (key, time-bucket) partitioning +
a boundary-carry aggregate (operators/joins.py); this module generalizes
the idea to ANY trailing-N-rows aggregate (rolling mean/stddev/z-score,
rolling sums, ...), where the boundary state is the trailing N *rows*
rather than one payload.

Shape (all built-in ops, exact result):

1. pre-split each key by a coarse time bucket of the leading order
   column — this only parallelizes the rank computation, any width works;
2. exact per-key global rank = rank within (key, time-bucket) + the
   running row-count of earlier buckets (a window over the tiny
   per-bucket aggregate, never over the data);
3. re-bucket by row count: ``R = bucket_rows`` rows per (key, row-bucket),
   with ``R >= window_rows`` — so every bucket except a key's last is
   EXACTLY full;
4. copy each bucket's last ``window_rows`` rows into the next bucket as
   non-own "carry" rows;
5. run the trailing window inside (key, row-bucket) ordered by the global
   rank, then keep own rows only.

Exactness: for an own row at global rank g in row-bucket b (ranks
b*R+1 ... (b+1)*R), the trailing frame [g-N, g-1] lies within buckets b
and b-1, and its b-1 portion — ranks [g-N, b*R] — is within b-1's last N
rows because g > b*R and N <= R.  Carried copies reconstruct precisely
that suffix, so the frame the window sees is row-for-row the frame the
unsplit window would see.  Ties in ``order_cols`` are broken by the
global rank (row_number), i.e. arbitrarily-but-consistently — the same
freedom the unsplit window has.

Cost: one extra tiny aggregate + its broadcast-size join back, and a
``window_rows / bucket_rows`` row-duplication factor (~12.5% at the
default ``bucket_rows = 8 * window_rows``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window, WindowSpec

from aws_etl_bank_spark.operators.joins import _nullsafe_equi_join

#: helper columns trailing_rows_window_split adds; drop after aggregating
HELPER_COLS = ("__grank", "__rbkt", "__own")


def _time_bucket(df: DataFrame, order_col: str, seconds: float):
    dtype = dict(df.dtypes)[order_col]
    if dtype.startswith("timestamp") or dtype == "date":
        # cast covers TIMESTAMP_NTZ and DATE (unix_micros wants TIMESTAMP)
        return F.floor(F.unix_micros(F.col(order_col).cast("timestamp"))
                       / F.lit(int(seconds * 1_000_000)))
    return F.floor(F.col(order_col) / F.lit(float(seconds)))


def running_sum_split(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    out_col: str,
    coarse_bucket_seconds: float,
) -> DataFrame:
    """Exact hot-key-split running sum: ``SUM(value) OVER (PARTITION BY
    keys ORDER BY order_col)`` (RANGE default frame — ties share the
    accumulated value) with each key spread across (key, time-bucket)
    tasks instead of serializing one window partition.

    Running aggregates decompose: within-bucket running sum (RANGE
    window inside each (key, bucket) task) + the running TOTAL of all
    earlier buckets (a window over the tiny per-bucket aggregate, one
    row per touched bucket).  Equal order values always share a time
    bucket, so cross-bucket RANGE tie semantics cannot be violated.
    Same shape works for count/min/max (any associative combine);
    ``trailing_rows_window_split`` covers the trailing-N-rows family
    where the carry is rows, not one value.

    Column order and every input column are preserved; ``out_col`` is
    appended, matching the plain-window ``withColumn`` shape.
    """
    if coarse_bucket_seconds <= 0:
        raise ValueError("coarse_bucket_seconds must be positive")
    d = df.withColumn("__tb", _time_bucket(df, order_col, coarse_bucket_seconds))
    inner = Window.partitionBy(*keys, "__tb").orderBy(order_col)
    d = d.withColumn("__in", F.sum(value_col).over(inner))
    totals = d.groupBy(*keys, "__tb").agg(F.sum(value_col).alias("__tot"))
    ow = (Window.partitionBy(*keys).orderBy("__tb")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        *keys, "__tb",
        F.sum("__tot").over(ow).alias("__off"),
    )
    # NULL-safe: NULL keys / a NULL bucket from a NULL order value form
    # window partitions of their own, so the join-back must match them
    d = _nullsafe_equi_join(d, offsets, [*keys, "__tb"], how="inner")
    # SQL sum ignores NULL inputs but returns NULL over an all-NULL set:
    # the combined sum is NULL only when BOTH parts are
    out = F.when(
        F.col("__in").isNull() & F.col("__off").isNull(), F.lit(None)
    ).otherwise(F.coalesce("__in", F.lit(0)) + F.coalesce("__off", F.lit(0)))
    return (d.withColumn(out_col, out)
            .drop("__tb", "__in", "__off"))


def running_sums_split_nested(
    df: DataFrame,
    fine_keys: list[str],
    coarse_keys: list[str],
    order_col: str,
    value_col: str,
    fine_out: str,
    coarse_out: str,
    coarse_bucket_seconds: float,
    nullsafe: bool = True,
) -> DataFrame:
    """Both running sums of a NESTED key pair — ``SUM(value) OVER
    (PARTITION BY fine_keys ORDER BY order_col)`` and the same over
    ``coarse_keys`` — in ONE pass, where ``coarse_keys`` is a strict
    subset of ``fine_keys`` (the flagship's (cust, acc) / (cust) pair).

    Two chained :func:`running_sum_split` calls shuffle the data once
    per inner window plus once per join-back side, and the second
    call's offsets branch re-executes the first call's join (r17 plan:
    five data-sized Exchanges + two sort-merge joins).  The nested form
    exploits three structural facts (guide §2.4 — remove shuffles
    outright):

    - the work is interleaved as two stages — [fine window, fine
      offset join] then [coarse window, coarse offset join] — so the
      exchange EnsureRequirements inserts for each stage's window is
      on exactly that stage's join keys and the join reuses it (the
      co-partitioning rule requires ALL join keys in the partitioning
      — ``spark.sql.requireAllClusterKeysForCoPartition`` — so a
      single shared subset-key repartition would be re-shuffled at
      both joins, measured r17): the data crosses the wire twice,
      versus five data exchanges for the chained calls;
    - the coarse per-bucket totals are the fine totals re-aggregated
      (associative re-grouping; the combined sums feed the same
      downstream rounding the plain/split equivalence already relies
      on), so ONE totals scan serves both offset tables;
    - the offset join-backs are aggregate-sized and, with plain ``=``
      equality, a SHUFFLE_HASH hint keeps the big side unsorted
      (``nullsafe=True`` falls back to ``<=>`` joins, which repartition
      both sides on the null-safe key form: exact for NULL keys, two
      extra data exchanges — pass ``nullsafe=False`` when every key
      and the order column are provably non-null).

    Column order is preserved; ``fine_out`` then ``coarse_out`` are
    appended, matching the chained-call shape.
    """
    if coarse_bucket_seconds <= 0:
        raise ValueError("coarse_bucket_seconds must be positive")
    if not set(coarse_keys) < set(fine_keys):
        raise ValueError("coarse_keys must be a strict subset of fine_keys")
    d0 = df.withColumn("__tb", _time_bucket(df, order_col, coarse_bucket_seconds))
    wf = Window.partitionBy(*fine_keys, "__tb").orderBy(order_col)
    wc = Window.partitionBy(*coarse_keys, "__tb").orderBy(order_col)

    totf = d0.groupBy(*fine_keys, "__tb").agg(F.sum(value_col).alias("__totf"))
    owf = (Window.partitionBy(*fine_keys).orderBy("__tb")
           .rowsBetween(Window.unboundedPreceding, -1))
    offf = totf.select(*fine_keys, "__tb",
                       F.sum("__totf").over(owf).alias("__offf"))
    totc = (totf.groupBy(*coarse_keys, "__tb")
            .agg(F.sum("__totf").alias("__totc")))
    owc = (Window.partitionBy(*coarse_keys).orderBy("__tb")
           .rowsBetween(Window.unboundedPreceding, -1))
    offc = totc.select(*coarse_keys, "__tb",
                       F.sum("__totc").over(owc).alias("__offc"))

    d = d0.withColumn("__inf", F.sum(value_col).over(wf))
    if nullsafe:
        d = _nullsafe_equi_join(d, offf, [*fine_keys, "__tb"], how="inner")
        d = d.withColumn("__inc", F.sum(value_col).over(wc))
        d = _nullsafe_equi_join(d, offc, [*coarse_keys, "__tb"], how="inner")
    else:
        d = d.join(offf.hint("shuffle_hash"), [*fine_keys, "__tb"])
        d = d.withColumn("__inc", F.sum(value_col).over(wc))
        d = d.join(offc.hint("shuffle_hash"), [*coarse_keys, "__tb"])

    def _combine(inner, off):
        return F.when(
            F.col(inner).isNull() & F.col(off).isNull(), F.lit(None)
        ).otherwise(F.coalesce(inner, F.lit(0)) + F.coalesce(off, F.lit(0)))

    return (d.withColumn(fine_out, _combine("__inf", "__offf"))
            .withColumn(coarse_out, _combine("__inc", "__offc"))
            .drop("__tb", "__inf", "__inc", "__offf", "__offc"))


def trailing_rows_window_split(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    window_rows: int,
    coarse_bucket_seconds: float,
    bucket_rows: int | None = None,
) -> tuple[DataFrame, WindowSpec]:
    """(augmented df, window spec) for an exact trailing
    ``rowsBetween(-window_rows, -1)`` aggregate with hot keys split
    across ``bucket_rows``-row tasks.

    Apply window functions over the returned spec, then
    ``.filter("__own").drop(*HELPER_COLS)``.  The leading order column
    must be a timestamp or numeric; NULLs in it sort first, like the
    plain window.
    """
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    if coarse_bucket_seconds <= 0:
        raise ValueError("coarse_bucket_seconds must be positive")
    R = bucket_rows if bucket_rows is not None else 8 * window_rows
    if R < window_rows:
        raise ValueError("bucket_rows must be >= window_rows")

    d = df.withColumn(
        "__tb", _time_bucket(df, order_cols[0], coarse_bucket_seconds))

    # exact global rank per key: rank inside the (key, time-bucket) task
    # plus the running size of earlier buckets.  The offsets window runs
    # over one row per touched (key, time-bucket) — an aggregate, never
    # the data — so no key ever serializes here.
    lw = Window.partitionBy(*keys, "__tb").orderBy(*order_cols)
    d = d.withColumn("__lrank", F.row_number().over(lw))
    counts = d.groupBy(*keys, "__tb").agg(F.count(F.lit(1)).alias("__cnt"))
    ow = (Window.partitionBy(*keys).orderBy("__tb")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.select(
        *keys, "__tb",
        F.coalesce(F.sum("__cnt").over(ow), F.lit(0)).alias("__off"),
    )
    # NULL-safe: NULL keys (and a NULL time bucket from a NULL leading
    # order value) form window partitions, so they must join too
    d = _nullsafe_equi_join(d, offsets, [*keys, "__tb"], how="inner")
    d = (d.withColumn("__grank", F.col("__off") + F.col("__lrank"))
         .drop("__tb", "__lrank", "__off"))

    d = d.withColumn("__rbkt", F.floor((F.col("__grank") - 1) / F.lit(R)))
    own = d.withColumn("__own", F.lit(True))
    carry = (
        d.filter(((F.col("__grank") - 1) % F.lit(R)) >= F.lit(R - window_rows))
        .withColumn("__rbkt", F.col("__rbkt") + 1)
        .withColumn("__own", F.lit(False))
    )
    split = own.unionByName(carry)
    w = (Window.partitionBy(*keys, "__rbkt").orderBy("__grank")
         .rowsBetween(-window_rows, -1))
    return split, w
