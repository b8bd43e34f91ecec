"""Stream-stream joins and streaming dedup — stock Structured Streaming,
packaged as reusable plan builders so batch and streaming share one
definition (beyond-reference; the reference's streaming surface is
micro-batch forEachBatch only, awsglue/context.py:602-664).

Both builders accept batch OR streaming DataFrames: the join/dedup is
declared identically, and Spark plans the stateful streaming variant
when the inputs are streams.  At scale the state store bounds are the
watermark horizons — state per key is evicted once the watermark passes
``left_ts - bound_before`` (join) / the dedup horizon — so horizon
choice, not corpus size, caps executor state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    bound_before: str,
    watermark: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of two (possibly streaming) frames on ``on`` where the
    right event falls in ``[left_ts - bound_before, left_ts]`` — the
    event-time interval join ("purchases in the 12 h before each click").

    With streaming inputs both sides MUST carry a watermark (pass
    ``watermark``; it is applied to both) — that is what lets the state
    store evict right rows older than ``left_ts - bound_before`` and
    emit append-mode results.  Equi-key + time-bound is exactly the
    shape Spark's stream-stream join requires; there is no fallback to
    an unbounded cross join.
    """
    lt, rt = f"__l_{left_ts}", f"__r_{right_ts}"
    l = left.withColumnRenamed(left_ts, lt)
    r = right.withColumnRenamed(right_ts, rt)
    if watermark:
        l = l.withWatermark(lt, watermark)
        r = r.withWatermark(rt, watermark)
    r = r.select(
        *[F.col(c).alias(c + suffix if c in l.columns else c)
          for c in r.columns]
    )
    key_r = on + suffix if on + suffix in r.columns else on
    cond = (
        (F.col(on) == F.col(key_r))
        & (F.col(rt) >= F.col(lt) - F.expr(f"INTERVAL {bound_before}"))
        & (F.col(rt) <= F.col(lt))
    )
    return (
        l.join(r, cond, "inner")
        .drop(key_r)
        .withColumnRenamed(lt, left_ts)
        .withColumnRenamed(rt, right_ts + suffix)
    )


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """First-arrival dedup by ``keys``.  With ``ts_col`` + ``watermark``
    the state store only remembers keys inside the watermark horizon
    (``dropDuplicatesWithinWatermark`` semantics — the production shape:
    state is bounded by horizon × key rate, not by total stream
    length); without them it is exact global dedup with unbounded
    state, fine for batch or bounded replays.  On a batch frame the
    horizon variant degrades to plain global dedup
    (dropDuplicatesWithinWatermark is streaming-only, and with the
    whole input visible at once global dedup is its batch meaning)."""
    if ts_col and watermark and stream.isStreaming:
        return stream.withWatermark(ts_col, watermark) \
            .dropDuplicatesWithinWatermark(keys)
    return stream.dropDuplicates(keys)


def enrich_with_static(stream: DataFrame, dim: DataFrame,
                       on, broadcast_dim: bool = True) -> DataFrame:
    """Stream-static equi-join — the canonical dimension-enrichment
    shape (stream fact rows decorated from a slowly-changing static
    table).  Stateless: no watermark and no state store; Spark re-plans
    the static side each micro-batch, so a catalog-backed dim picks up
    changes between batches.  ``broadcast_dim`` (default) hints the
    per-batch join to broadcast the dim — at 100 TB of stream the dim
    ships once per executor per batch instead of shuffling the stream.

    ``on`` is a column name, list of names, or a join Column."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, "inner")
