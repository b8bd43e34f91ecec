"""Loaders for the driver-generated testdata tables (TESTDATA.md).

``events.parquet``'s ``ts`` physical type has drifted between driver
testdata regenerations: TIMESTAMP(NANOS) (arrives as a nano-epoch bigint
under ``spark.sql.legacy.parquet.nanosAsLong``) through round 2, plain
``timestamp[us]`` (arrives as TIMESTAMP_NTZ) since round 3.  Both
loaders here dtype-guard the conversion, so ALL engine code must read
events through them — never a raw ``spark.read.parquet``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: columns stored as TIMESTAMP(NANOS) per table
_NANO_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name in _NANO_TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            # integer DIV, not `/`: the nano value (~1.7e18) exceeds
            # double's 53-bit exact range, so float division is off by
            # up to a microsecond after the cast
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    return df


def events_stream(spark: SparkSession, stream_dir: str) -> DataFrame:
    """File-stream read of the events table with the SAME dtype-guarded
    ``ts`` normalization as :func:`load_table`, shared by every streaming
    registry entry so a testdata regeneration can never diverge the two
    paths again (the round-3 drift: ``ts`` flipped TIMESTAMP(NANOS) →
    timestamp[us] and five copy-pasted unconditional conversions crashed).

    Robust to ``ts`` arriving as:

    - ``bigint`` nano-epoch (TIMESTAMP(NANOS) parquet under
      ``nanosAsLong``) → integer-DIV to micros, then ``timestamp_micros``;
    - ``timestamp_ntz`` (plain ``timestamp[us]`` parquet) → cast to
      session-tz TIMESTAMP (UTC session ⇒ value-identical), because
      watermarks/windows are exercised against TimestampType everywhere;
    - ``timestamp`` → passthrough.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(stream_dir)
    dtypes = dict(batch.dtypes)
    for col in _NANO_TS_COLS["events"]:
        if dtypes.get(col) == "bigint":
            stream = stream.withColumn(
                col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
        elif dtypes.get(col) == "timestamp_ntz":
            stream = stream.withColumn(col, F.col(col).cast("timestamp"))
    return stream


def write_ordered_feed(df: DataFrame, feed_dir: str, n_parts: int,
                       order_cols: list[str],
                       src_path: str | None = None) -> str:
    """Write ``df`` as an ``n_parts`` range-partitioned parquet feed
    for ``maxFilesPerTrigger=1`` replay, then stamp the range files
    with increasing mtimes so the file source — which replays files in
    MODIFICATION-TIME order, not path order — delivers them in range
    order.  Cached behind the feed's ``_SUCCESS``: rebuilt only when
    absent or when ``src_path`` (the source table file) has a newer
    mtime (a driver testdata regeneration must invalidate the cached
    feed, or a stream replays last round's rows against this round's
    expectations).  Shared by the stream_incremental_dedup /
    stream_cdc_scd2 registry fixtures and the decade-audit harnesses
    (r17 review: four hand-rolled copies had already drifted)."""
    import os

    success = os.path.join(feed_dir, "_SUCCESS")
    stale = (src_path is not None and os.path.exists(success)
             and os.path.exists(src_path)
             and os.path.getmtime(src_path) > os.path.getmtime(success))
    if os.path.exists(success) and not stale:
        return feed_dir
    (df.repartitionByRange(n_parts, *order_cols)
     .write.mode("overwrite").parquet(feed_dir))
    parts = sorted(f for f in os.listdir(feed_dir)
                   if f.endswith(".parquet"))
    base = os.path.getmtime(success)
    for i, f in enumerate(parts):
        os.utime(os.path.join(feed_dir, f), (base + i + 1, base + i + 1))
    return feed_dir
