"""Sessionization and custom stateful streaming operators.

The reference's streaming layer is a micro-batch count loop
(glue-jobs/awsglue/context.py:602-664); it has no session concept.  These
operators extend the engine the Spark-first way:

- :func:`session_stats` — gap-based sessionization with the built-in
  ``session_window`` (Catalyst-native, codegen'd, mergeable state store in
  streaming mode).  Works identically on a batch or streaming frame; in
  streaming, pass a watermarked frame and use append output.
- :func:`stateful_user_counts` — a custom stateful operator via
  ``applyInPandasWithState``: per-key running totals carried across
  micro-batches in a GroupState, Arrow-batched.  The template for any
  operator whose state machine Spark's built-ins can't express.

Scale notes: ``session_window`` shuffles once on the grouping key and
merges windows inside the state store — no per-event Python.  The
``applyInPandasWithState`` path keeps state per key (bounded by key
cardinality, not event count) and moves data JVM→Python once per
micro-batch per key group, not per row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def session_stats(events: DataFrame, gap: str = "6 hours",
                  user_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value") -> DataFrame:
    """One row per (user, session): a session groups events whose gaps are
    below ``gap``; the window closes ``gap`` after the last event."""
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stateful_user_counts(events: DataFrame, user_col: str = "user_id"):
    """Running per-key event counts across micro-batches, kept in
    GroupState.  On a streaming frame each micro-batch emits the updated
    cumulative count per key seen in that batch (update semantics); the
    final emission per key equals its total count."""
    import pandas as pd  # noqa: F401  (imported for the worker closure)
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{user_col} long, n_events long"
    state_schema = "n long"

    def update(key, pdf_iter, state):
        import pandas as pd

        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({user_col: [key[0]], "n_events": [n]})

    return events.groupBy(user_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
