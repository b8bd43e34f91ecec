"""Hypertable-style time-series primitives: fixed-width time bucketing,
bucketed rollups, and gap filling — the continuous-aggregate pattern,
expressed as Catalyst-native DataFrame ops (beyond-reference; the
reference's only time handling is calendar-field extraction,
r2g_account.py date_format/quarter/year).

All bucket math is epoch arithmetic (``floor(unix_seconds / width)``),
so buckets align to the Unix epoch: any width that divides 24 h gives
midnight-aligned buckets identical to TimescaleDB/DuckDB ``time_bucket``
for the same origin.  Everything here is a pure column expression or a
composition of built-in ops — whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def time_bucket(ts, width_seconds: int) -> Column:
    """Left edge of the fixed-width bucket containing ``ts`` (timestamp
    column), as a timestamp.  Epoch-aligned; ``width_seconds`` dividing
    86400 keeps buckets calendar-aligned in UTC."""
    col = F.col(ts) if isinstance(ts, str) else ts
    w = int(width_seconds)
    if w <= 0:
        raise ValueError("width_seconds must be positive")
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(col) / F.lit(w)) * F.lit(w))


def rollup_time_bucket(df: DataFrame, ts_col: str, width_seconds: int,
                       keys: list[str], aggs: list[Column],
                       bucket_col: str = "bucket") -> DataFrame:
    """GroupBy (keys..., time_bucket) aggregate — the hypertable rollup.
    One shuffle on (keys, bucket) with map-side partial aggregation; at
    100 TB the bucket key caps per-group state regardless of how hot a
    key is within a window of time."""
    return (
        df.withColumn(bucket_col, time_bucket(ts_col, width_seconds))
        .groupBy(*keys, bucket_col)
        .agg(*aggs)
    )


def gap_fill(rolled: DataFrame, bucket_col: str, width_seconds: int,
             keys: list[str], fill: dict[str, Column]) -> DataFrame:
    """Densify a bucketed rollup: emit a row for EVERY (key-combination,
    bucket) over the frame's global [min, max] bucket span, filling
    absent buckets from ``fill`` (column name → fill expression).

    The spine is distinct keys × ``sequence(min, max, step)`` — its size
    is exactly the output size, so materializing it is irreducible, and
    the bounds row broadcasts (1 row).  The spine→rollup join shuffles on
    (keys, bucket), the same partitioning the rollup just produced.
    Intentionally global-span: per-key spans (fill only between a key's
    own first and last bucket) are a ``keys``-grouped min/max variant the
    caller can build with the same pieces.
    """
    step = F.expr(f"INTERVAL {int(width_seconds)} SECONDS")
    bounds = rolled.agg(F.min(bucket_col).alias("__lo"),
                        F.max(bucket_col).alias("__hi"))
    spine = (
        rolled.select(*keys).distinct()
        .crossJoin(bounds)  # 1-row side: broadcast, not a real cartesian
        .select(*keys,
                F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step))
                .alias(bucket_col))
    )
    out = spine.join(rolled, on=[*keys, bucket_col], how="left")
    filled = [
        F.coalesce(F.col(c), fill[c]).alias(c) if c in fill else F.col(c)
        for c in out.columns
    ]
    return out.select(*filled)


def merge_rollup(stored: DataFrame, delta: DataFrame, keys: list[str],
                 merge: dict[str, str]) -> DataFrame:
    """Incrementally maintain a materialized rollup: combine an already-
    aggregated ``stored`` rollup with a freshly-aggregated ``delta``
    (the new day's partition) WITHOUT rescanning history — the
    continuous-aggregate refresh pattern.

    ``merge`` maps each aggregate column to its combine function
    ("sum" | "min" | "max" — the decomposable aggregates; avg must be
    carried as sum+count and divided at read time).  Implementation is a
    unionByName + one re-aggregation over (keys): rows for a key present
    on one side only pass through; keys present in both combine.
    Equivalent to recomputing the rollup over history ∪ delta, at
    O(|rollup| + |delta|) instead of O(|history|)."""
    fns = {"sum": F.sum, "min": F.min, "max": F.max}
    aggs = []
    for col, how in merge.items():
        if how not in fns:
            raise ValueError(f"unsupported combine {how!r} for {col}: avg and "
                             "count-distinct are not mergeable post-hoc — carry "
                             "sum+count / a sketch instead")
        aggs.append(fns[how](col).alias(col))
    return stored.unionByName(delta).groupBy(*keys).agg(*aggs)


def cusum_drift(df: DataFrame, value_col: str, keys: list[str],
                ts_col: str, k: float, h: float,
                tiebreak: str = "event_id") -> DataFrame:
    """One-sided CUSUM drift detection per key: ``S_i = max(0,
    S_{i-1} + (x_i − k))`` with an alarm when ``S_i > h`` — the classic
    sequential change-point statistic (Page 1954) for "this metric has
    been running high lately", which a point z-score cannot see.

    The recursion looks inherently serial, but it has a closed
    windows-only form: with ``P_i = Σ_{j≤i}(x_j − k)`` (prefix sum),
    ``S_i = P_i − min(0, min_{j≤i} P_j)`` — a running sum and a running
    min over the SAME keyed window, both single-pass.  That identity is
    what makes CUSUM distributable: no applyInPandas, no per-key serial
    scan, parallelism = number of keys.  Emits only alarm rows
    (keys, tiebreak id, value, cusum)."""
    from pyspark.sql import Window

    w = (Window.partitionBy(*keys).orderBy(ts_col, tiebreak)
         .rowsBetween(Window.unboundedPreceding, 0))
    # two chained window columns over the SAME spec: the second Window
    # node reuses the first's exchange + sort (one shuffle total), it
    # just cannot be nested into a single expression
    out = (df.withColumn("__p", F.sum(F.col(value_col) - F.lit(k)).over(w))
           .withColumn("cusum",
                       F.col("__p") - F.least(F.min("__p").over(w),
                                              F.lit(0.0))))
    return (out.where(F.col("cusum") > F.lit(h))
            .select(*keys, tiebreak, value_col,
                    F.round("cusum", 2).alias("cusum")))
