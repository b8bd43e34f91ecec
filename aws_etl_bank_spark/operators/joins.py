"""Temporal / interval joins Spark's DataFrame API lacks as primitives.

Beyond-reference operators (the reference — an AWS Glue banking ETL —
has only equi-joins; SURVEY.md §2.3): an *as-of join* (latest right row
at or before each left timestamp, per key) and a *range join* (points
matched into intervals).  Both are expressed as compositions of built-in
DataFrame ops so Catalyst/Tungsten own the physical plan — no Python in
the row path, no cartesian product anywhere:

- ``asof_join``: union + ordered window with ``last(ignorenulls)`` —
  ONE shuffle on the key, one sort, no join node at all.  The classic
  inequality-join formulation (`l.ts >= r.ts` + max) degenerates to a
  broadcast-nested-loop or a per-key quadratic blow-up; this shape is
  the standard log-linear streaming-merge equivalent.
- ``range_join``: bucketize both sides and equi-join on the bucket id,
  then refine with the exact bound predicate.  Spark plans a raw
  ``p BETWEEN lo AND hi`` join (no equi key) as BroadcastNestedLoop —
  quadratic at scale; the bucket key turns it into a shuffled hash join
  AQE can skew-split.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _nullsafe_equi_join(left: DataFrame, right: DataFrame, cols: list[str],
                        how: str = "left") -> DataFrame:
    """Equi-join on named columns with NULL-safe equality (<=>).

    ``df.join(other, on=[names])`` uses null-unsafe ``=``, so NULL keys
    never match — but window ``partitionBy`` groups NULL keys into one
    partition, so carry joins that feed a window must match NULLs too.
    Keeps the left side's join columns; other names must not collide.
    """
    la, ra = left.alias("__nsl"), right.alias("__nsr")
    cond = None
    for c in cols:
        e = F.col(f"__nsl.{c}").eqNullSafe(F.col(f"__nsr.{c}"))
        cond = e if cond is None else (cond & e)
    return la.join(ra, on=cond, how=how).select(
        *[F.col(f"__nsl.{c}") for c in left.columns],
        *[F.col(f"__nsr.{c}") for c in right.columns if c not in cols],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_r",
    coarse_bucket_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, attach the payload of the
    single right row with the greatest ``right_ts <= left_ts`` (direction
    ``backward``; ties match) — or the smallest ``right_ts >= left_ts``
    for ``forward`` — within the same ``on`` key.  Unmatched left rows
    keep NULL payloads (left-outer semantics, like DuckDB/pandas asof).

    Implementation: tag and union both inputs, then per key take the
    running ``last``/``first`` non-null *struct* of the right payload
    over a timestamp-ordered window.  The whole payload travels as one
    struct, so a legitimately-NULL payload column can never be filled
    from an older right row.  Cost: one Exchange on ``on`` + one sort —
    the same as a sort-merge join — and per-key time is linear.  Heavy
    keys serialize within the window sort (AQE cannot split a window):
    pass ``coarse_bucket_seconds`` to repartition the window by
    (key, time-bucket) — each hot key splits across its buckets, and
    bucket-boundary correctness is restored by carrying each bucket's
    final right payload forward (backward direction; mirrored for
    forward) through a window over the tiny per-(key, bucket) aggregate.
    Results are identical to the unbucketed plan; the price is one extra
    shuffle (the boundary aggregate + its join back).  Pick a width near
    the match horizon — e.g. ``tolerance_seconds``, or the right
    stream's typical spacing × 1e3.

    ``tolerance_seconds`` voids matches farther than the given horizon
    (timestamp columns; for numeric "timestamps" it is a plain numeric
    distance).  Right payload columns colliding with left names get
    ``suffix``; the matched timestamp is always emitted as
    ``{right_ts}{suffix}``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = right_cols or [
        c for c in right.columns if c not in set(keys) | {right_ts}
    ]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload
    }
    matched_ts = right_ts + suffix

    l_tag, r_tag = (1, 0) if direction == "backward" else (0, 1)
    l2 = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ats"),
        F.lit(l_tag).alias("__side"),
        F.lit(None).cast(
            right.select(
                F.struct(F.col(right_ts).alias("__rts"), *payload).alias("s")
            ).schema["s"].dataType
        ).alias("__rpay"),
    )
    # a NULL right timestamp can never win an ASOF comparison (l.ts >= NULL
    # is NULL) — but unfiltered it would sort nulls-first and its payload
    # would leak into every left row via last(ignorenulls)
    right = right.filter(F.col(right_ts).isNotNull())
    r2 = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns
          if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ats"),
        F.lit(r_tag).alias("__side"),
        F.struct(F.col(right_ts).alias("__rts"), *payload).alias("__rpay"),
    ).select(*l2.columns)

    unioned = l2.unionByName(r2)

    if coarse_bucket_seconds is not None:
        if coarse_bucket_seconds <= 0:
            raise ValueError("coarse_bucket_seconds must be positive")
        ts_type = dict(left.dtypes)[left_ts]
        if ts_type.startswith("timestamp"):
            # cast covers TIMESTAMP_NTZ input (unix_micros requires TIMESTAMP)
            bkt = F.floor(F.unix_micros(F.col("__ats").cast("timestamp"))
                          / F.lit(int(coarse_bucket_seconds * 1_000_000)))
        else:
            bkt = F.floor(F.col("__ats") / F.lit(float(coarse_bucket_seconds)))
        unioned = unioned.withColumn("__bkt", bkt)

        # Boundary carry: per (key, bucket), the payload a neighboring
        # bucket would need — the bucket's LAST right payload (backward)
        # or FIRST (forward).  One row per touched (key, bucket), so the
        # key-only window below runs over the aggregate, not the data.
        rights = unioned.filter(F.col("__side") == r_tag)
        if direction == "backward":
            bpay = F.max_by("__rpay", F.col("__ats"))
        else:
            bpay = F.min_by("__rpay", F.col("__ats"))
        finals = rights.groupBy(*keys, "__bkt").agg(bpay.alias("__bpay"))
        spine = unioned.select(*keys, "__bkt").distinct()
        cw = Window.partitionBy(*keys).orderBy("__bkt")
        if direction == "backward":
            carry = F.last("__bpay", ignorenulls=True).over(
                cw.rowsBetween(Window.unboundedPreceding, -1))
        else:
            carry = F.first("__bpay", ignorenulls=True).over(
                cw.rowsBetween(1, Window.unboundedFollowing))
        carries = (
            _nullsafe_equi_join(spine, finals, [*keys, "__bkt"])
            .withColumn("__carry", carry)
            .select(*keys, "__bkt", F.col("__carry"))
        )
        # equi-join on the window's own partition keys — the exchange is
        # shared with the window sort; AQE broadcasts carries when small.
        # NULL-safe so NULL join keys keep their cross-bucket carry, same
        # as the unbucketed window which groups NULL keys together.
        unioned = _nullsafe_equi_join(unioned, carries, [*keys, "__bkt"])
        w = Window.partitionBy(*keys, "__bkt").orderBy("__ats", "__side")
    else:
        unioned = unioned.withColumn("__carry", F.lit(None).cast(
            unioned.schema["__rpay"].dataType))
        w = Window.partitionBy(*keys).orderBy("__ats", "__side")

    if direction == "backward":
        pay = F.last("__rpay", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    else:
        pay = F.first("__rpay", ignorenulls=True).over(
            w.rowsBetween(Window.currentRow, Window.unboundedFollowing))

    matched = (
        unioned.withColumn("__pay", F.coalesce(pay, F.col("__carry")))
        .filter(F.col("__side") == l_tag)
    )
    if tolerance_seconds is not None:
        ts_type = dict(left.dtypes)[left_ts]
        if ts_type.startswith("timestamp"):
            dist = F.abs(
                F.unix_micros(F.col(left_ts).cast("timestamp"))
                - F.unix_micros(F.col("__pay.__rts").cast("timestamp"))
            ) / 1e6
        else:
            dist = F.abs(F.col(left_ts) - F.col("__pay.__rts"))
        matched = matched.withColumn(
            "__pay", F.when(dist <= F.lit(tolerance_seconds), F.col("__pay")))

    return matched.select(
        *[F.col(c) for c in left.columns],
        F.col("__pay.__rts").alias(matched_ts),
        *[F.col(f"__pay.{c}").alias(out_names[c]) for c in payload],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join every point row into every interval row with
    ``lo <= point <= hi`` (closed bounds, numeric columns) — without a
    cartesian/BroadcastNestedLoop plan.

    Both sides map onto integer buckets of ``bucket_width``: a point
    lands in one bucket, an interval explodes into the buckets it
    covers (``sequence`` — intervals spanning many buckets fan out, so
    pick a width near the typical interval length; a too-small width
    multiplies the interval side, a too-large one weakens the
    pre-filter).  The bucket id is then an ordinary equi-join key —
    shuffled hash join, partial pruning for free, AQE skew-split on hub
    buckets — and the exact bound predicate refines the candidates.
    Degenerate intervals (``hi < lo``) match nothing, as in SQL
    ``BETWEEN``.

    Output: all point columns + all interval columns, inner semantics
    (collisions are the caller's to rename).  Left-outer semantics
    compose on top via a left-anti join on a point id column — not baked
    in here because reconstructing "unmatched" from full rows is only
    sound when point rows are distinct.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = F.lit(float(bucket_width))

    p = points.withColumn("__bkt", F.floor(F.col(point_col) / w))
    iv = (
        intervals
        .filter(F.col(hi_col) >= F.col(lo_col))
        .withColumn(
            "__bkt",
            F.explode(F.sequence(F.floor(F.col(lo_col) / w),
                                 F.floor(F.col(hi_col) / w))),
        )
    )
    return (
        p.join(iv, on="__bkt", how="inner")
        .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("__bkt")
    )
