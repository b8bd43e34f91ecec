"""Real SCD2 merge — the extension the reference never implements.

The reference only STAMPS dims (is_active / record_created_time /
record_updated_time, glue-jobs/jobs/lekietvn/r2g_account.py:85-88) and
overwrites them wholesale each run; history is lost.  SURVEY.md §8.8
flags proper merging as an extension.  This operator closes out changed
rows and inserts new versions, preserving history:

- unchanged active rows pass through;
- rows whose tracked attributes changed are CLOSED (``is_active=false``,
  ``record_updated_time = as_of``) and a new active version is inserted;
- natural keys absent from the current dim are inserted as new actives;
- previously inactive (historical) rows pass through untouched.

``as_of`` is injectable event time, not wall clock — merges are
deterministic and replayable (same inputs + same as_of → same output),
which is what makes the operator oracle-checkable and retry-safe.

Plan shape: one full-outer join current⋈updates on the natural key plus
unions — no window, no driver loop.  At 100 TB both sides shuffle once on
the key; dims that fit broadcast get a broadcast join from AQE for free.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: open-ended end-date sentinel (reference semantics: a DATE, §8.6)
OPEN_END_DATE = "3000-01-01"


def scd2_stamp(df: DataFrame, as_of: str) -> DataFrame:
    """Stamp a snapshot as all-active SCD2 rows effective ``as_of``."""
    return (
        df.withColumn("is_active", F.lit(True))
        .withColumn("record_created_time", F.to_timestamp(F.lit(as_of)))
        .withColumn("record_updated_time", F.to_date(F.lit(OPEN_END_DATE)))
    )


def scd2_merge(current: DataFrame, updates: DataFrame, keys: list[str],
               as_of: str, tracked: list[str] | None = None,
               apply_condition: Column | None = None) -> DataFrame:
    """Merge an update snapshot into an SCD2 dim (see module docstring).

    ``current`` carries the three SCD2 columns; ``updates`` carries only
    the business columns.  ``tracked`` defaults to every non-key business
    column; a change in any of them (null-safe comparison) closes the old
    version.

    ``apply_condition``: extra predicate over the merge join's ``cur.*``
    / ``upd.*`` aliases ANDed into the change test — an update applies
    only when it ALSO satisfies it.  Lets CDC callers drop stale changes
    (e.g. ``upd.ts`` newer than ``cur.ts``) inside the merge's own
    full-outer join instead of a separate join against the dim, which
    would put the dim's attributes on both sides of the merge join and
    trip Spark's self-join ambiguity analysis (streaming/cdc.py).
    Evaluates only where both sides are present; brand-new keys always
    insert.
    """
    scd_cols = ["is_active", "record_created_time", "record_updated_time"]
    business = [c for c in updates.columns if c not in keys]
    tracked = tracked if tracked is not None else business

    active = current.filter(F.col("is_active"))
    history = current.filter(~F.col("is_active"))

    # Presence after the full-outer join is probed via literal markers, not
    # business columns — a legitimate NULL in any business column must not
    # make the row look absent.
    cur = active.withColumn("_cur_present", F.lit(True)).alias("cur")
    upd = updates.withColumn("_upd_present", F.lit(True)).alias("upd")
    joined = cur.join(upd, keys, "full_outer")

    has_cur = F.col("cur._cur_present").isNotNull()
    has_upd = F.col("upd._upd_present").isNotNull()
    differs = F.lit(False)
    for c in tracked:
        differs = differs | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
    if apply_condition is not None:
        differs = differs & apply_condition

    out_cols = keys + business + scd_cols

    # Each joined row emits 1-2 output rows via ONE array+explode pass:
    # unchanged → its current version; changed → the closed current
    # version AND the new active version; brand-new key → the insert.
    # The branched filter+union form recomputed the full-outer join
    # subtree once per branch (3 joins, each side scanned 3×, measured
    # as 9 FileScans on the dim) — this form joins once.  All three
    # struct shapes carry identical field names/types so the exploded
    # column is a single struct type.
    def _struct(fields):
        return F.struct(*[expr.alias(c) for c, expr in fields])

    cur_version = _struct(
        [(c, F.col(f"cur.{c}")) for c in keys + business + scd_cols])
    closed_version = _struct(
        [(c, F.col(f"cur.{c}")) for c in keys + business]
        + [("is_active", F.lit(False)),
           ("record_created_time", F.col("cur.record_created_time")),
           ("record_updated_time", F.to_date(F.lit(as_of)))])
    insert_version = _struct(
        [(c, F.coalesce(F.col(f"upd.{c}"), F.col(f"cur.{c}"))) for c in keys]
        + [(c, F.col(f"upd.{c}")) for c in business]
        + [("is_active", F.lit(True)),
           ("record_created_time", F.to_timestamp(F.lit(as_of))),
           ("record_updated_time", F.to_date(F.lit(OPEN_END_DATE)))])

    emitted = (
        F.when(has_cur & has_upd & differs,
               F.array(closed_version, insert_version))
        .when(has_cur, F.array(cur_version))        # unchanged / no update
        .otherwise(F.array(insert_version))         # brand-new key
    )
    merged = (
        joined.select(F.explode(emitted).alias("__row"))
        .select(*[F.col(f"__row.{c}").alias(c) for c in out_cols])
    )
    return merged.unionByName(history.select(*out_cols))


def scd2_as_of(dim: DataFrame, as_of: str) -> DataFrame:
    """Point-in-time view of an SCD2 dim: the version of each key that
    was current on ``as_of`` — created at or before it, not yet closed
    (``record_updated_time`` is the close date; the year-3000 sentinel
    keeps active rows).  A map-only filter: partition pruning applies
    when the dim is written partitioned on the close date."""
    return dim.filter(
        (F.col("record_created_time") <= F.to_timestamp(F.lit(as_of)))
        & (F.col("record_updated_time") > F.to_date(F.lit(as_of)))
    )


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str],
                  compare_cols: list[str]) -> DataFrame:
    """Changeset GENERATION between two table snapshots — the
    complement of the CDC *apply* path (streaming/cdc.py): given
    yesterday's and today's extracts, emit one row per changed key
    with ``change_type`` I(nsert)/U(pdate)/D(elete) and, for updates,
    the list of changed columns.  This is how a source without a
    binlog gets a CDC feed (the daily-full-extract pattern every bank
    batch window runs).

    ONE full-outer equi-join on the key — no windows, no per-column
    passes: the I/D split falls out of join-side nullness and the
    U detection is a single null-safe struct inequality; per-column
    change flags are array expressions over the same row.  Null-safe
    (`<=>`) comparison means NULL→value and value→NULL both count as
    changes and NULL==NULL does not — the semantics a diff needs and
    a plain ``!=`` silently gets wrong.  Unchanged keys are filtered
    before the result ever materializes."""
    o = old.select(*keys, *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
                   F.lit(1).alias("__in_o"))
    n = new.select(*keys, *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
                   F.lit(1).alias("__in_n"))
    j = o.join(n, keys, "full_outer")
    any_diff = None
    for c in compare_cols:
        d = ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        any_diff = d if any_diff is None else (any_diff | d)
    ctype = (F.when(F.col("__in_o").isNull(), F.lit("I"))
             .when(F.col("__in_n").isNull(), F.lit("D"))
             .when(any_diff, F.lit("U")))
    changed = F.filter(
        F.array(*[F.when(~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                         F.lit(c)) for c in compare_cols]),
        lambda x: x.isNotNull())
    return (j.withColumn("change_type", ctype)
            .filter(F.col("change_type").isNotNull())
            .select(*keys, "change_type",
                    F.when(F.col("change_type") == "U", changed)
                    .otherwise(F.array().cast("array<string>"))
                    .alias("changed_cols"),
                    *[F.col(f"__n_{c}").alias(c) for c in compare_cols]))
