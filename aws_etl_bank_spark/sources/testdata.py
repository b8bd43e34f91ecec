"""Loaders for the driver-generated testdata tables (TESTDATA.md).

``events.parquet`` is written with TIMESTAMP(NANOS) physical type, which
Spark rejects by default; with ``spark.sql.legacy.parquet.nanosAsLong``
the column arrives as a nano-epoch bigint and is converted back to a
(microsecond) timestamp here — lossless for this data, which is generated
at microsecond precision.
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
