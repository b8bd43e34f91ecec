"""Glue-specific column functions, lowered to built-in Catalyst expressions
(reference awsglue/functions.py:16-31; ingestion-time columns
reference awsglue/context.py:666-674).

All of these stay JVM-side — no Python UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def replaceArrayElement(src: Column, replace: Column, idx: int) -> Column:
    """Replace the element at ``idx`` (0-based) of array ``src`` with
    ``replace`` (reference awsglue/functions.py:16-20).  Lowered to
    ``F.transform`` with the index lambda — vectorized, no UDF."""
    return F.transform(src, lambda x, i: F.when(i == F.lit(idx), replace).otherwise(x))


def namedStruct(*cols) -> Column:
    """reference awsglue/functions.py:22-26 — alternating name/value args or
    plain columns."""
    if cols and isinstance(cols[0], str) and len(cols) % 2 == 0:
        parts = []
        for name, value in zip(cols[0::2], cols[1::2]):
            value = F.lit(value) if not isinstance(value, Column) else value
            parts.append(value.alias(name))
        return F.struct(*parts)
    return F.struct(*cols)


def explodeWithIndex(col: Column) -> list[Column]:
    """Explode with positional index, aliased (index, val) like the
    reference (awsglue/functions.py:28-31).  Use in a select:
    ``df.select("*", *explodeWithIndex(F.col("arr")))`` is not valid Spark —
    instead ``df.select(explodeWithIndex(F.col("arr")))`` via selectExpr;
    we return the posexplode column for use as
    ``df.select(explodeWithIndex(c))``."""
    return F.posexplode(col).alias("index", "val")


def add_scd2_columns(df: DataFrame) -> DataFrame:
    """SCD2 stamp columns for dim syncs (reference r2g_account.py:85-88):
    is_active=true, record_created_time=current_timestamp(), and
    record_updated_time as the open-ended sentinel — a DATE despite the
    timestamp-looking literal (to_date semantics, SURVEY.md §8.6)."""
    return (
        df.withColumn("is_active", F.lit(True))
        .withColumn("record_created_time", F.current_timestamp())
        .withColumn(
            "record_updated_time",
            F.to_date(F.lit("3000-01-01 00:00:00"), "yyyy-MM-dd HH:mm:ss"),
        )
    )


def clean_csv_value(col: Column) -> Column:
    """Ingest-side CSV value cleanup (reference db_utils.py:46-49):
    NULL → the ``\\N`` sentinel, embedded newlines escaped to ``\\n``.
    Vectorized regexp_replace — the reference does this per-value in
    Python while building CSV bytes."""
    return F.when(col.isNull(), F.lit(r"\N")).otherwise(
        F.regexp_replace(col.cast("string"), "\n", r"\\n")
    )


def strip_quotes(col: Column) -> Column:
    """Single-quote stripping as in the reference's crawler ingest
    (crawler_utils.py:27-32)."""
    return F.regexp_replace(col.cast("string"), "'", "")


_GRANULARITY_ORDER = ["year", "month", "day", "hour", "minute"]

_GRANULARITY_FN = {
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "hour": F.hour,
    "minute": F.minute,
}


def add_ingestion_time_columns(df: DataFrame, granularity: str = "day",
                               ts_col=None) -> DataFrame:
    """Append ingest_year/month/day[/hour/minute] partition columns at the
    requested granularity (reference awsglue/context.py:666-674).  Values
    are zero-padded strings so they make stable partition directory names."""
    if granularity not in _GRANULARITY_ORDER:
        raise ValueError(f"granularity must be one of {_GRANULARITY_ORDER}")
    ts = ts_col if ts_col is not None else F.current_timestamp()
    upto = _GRANULARITY_ORDER.index(granularity)
    for g in _GRANULARITY_ORDER[: upto + 1]:
        width = 4 if g == "year" else 2
        df = df.withColumn(f"ingest_{g}", F.lpad(_GRANULARITY_FN[g](ts).cast("string"), width, "0"))
    return df
