"""JDBC extract / bulk-load, Spark-first.

The reference performs its database movement OUTSIDE Spark, in a Lambda
layer: `SELECT *` over psycopg2 with ``fetchmany(size=1000)`` batches,
CSV bytes to object storage, and ``cursor.copy_from`` bulk COPY loads
(lambda-functions/src/common/db_utils.py:123-184,
lambda-functions/src/kietl/lambda_kietl.py:36-51).  That design is
single-connection and single-node — it cannot scale past one table at a
time.

Here the same capabilities are expressed as Spark JDBC reads/writes:

- ``fetchmany(1000)``  →  ``fetchsize`` on ``spark.read.jdbc`` (per-task
  cursor batching, same knob, but N partitions pull in parallel).
- table → CSV ingest   →  ``jdbc_extract_to_csv`` (all-string CSV, header,
  matching the engine's CSV-scan contract).
- ``copy_from`` COPY   →  ``jdbc_bulk_write`` with ``batchsize`` (each
  task issues batched INSERTs; with ``numPartitions`` writers this is the
  distributed equivalent of a COPY pipe).

At 100 TB the decisive option is partitioned reads: without
``partitionColumn/lowerBound/upperBound/numPartitions`` a JDBC read is ONE
executor holding ONE cursor.  ``build_read_options`` therefore refuses a
partial partition spec rather than silently degrading to a single stream.

Spark's own jars dir ships the embedded Derby driver, so the registry
exercises a real write→read→extract round-trip against a Derby database
(``jdbc_conf_roundtrip`` / ``jdbc_extract_csv_ingest``); tests additionally
cover the pure option-building.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCH_SIZE = 1000  # parity: db_utils.py:181 fetchmany(size=1000)
DEFAULT_BATCH_SIZE = 1000

_PARTITION_KEYS = ("partitionColumn", "lowerBound", "upperBound", "numPartitions")


def build_read_options(url: str, table: str, *, user: str | None = None,
                       password: str | None = None, driver: str | None = None,
                       fetchsize: int = DEFAULT_FETCH_SIZE,
                       partition_column: str | None = None,
                       lower_bound=None, upper_bound=None,
                       num_partitions: int | None = None,
                       predicate: str | None = None,
                       extra: dict | None = None) -> dict:
    """Options dict for a parallel JDBC read.  A partition spec must be
    all-or-nothing: a missing bound silently produces a single-partition
    read in Spark, which at scale is a stalled pipeline, so it raises."""
    opts = {"url": url, "fetchsize": str(int(fetchsize))}
    opts["dbtable"] = f"({predicate}) AS src" if predicate else table
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if driver is not None:
        opts["driver"] = driver
    part = {
        "partitionColumn": partition_column,
        "lowerBound": lower_bound,
        "upperBound": upper_bound,
        "numPartitions": num_partitions,
    }
    given = {k: v for k, v in part.items() if v is not None}
    if given and len(given) != len(_PARTITION_KEYS):
        missing = sorted(set(_PARTITION_KEYS) - set(given))
        raise ValueError(
            f"partial JDBC partition spec (missing {missing}): a partial spec "
            "falls back to a single-cursor read — pass all four or none")
    for k, v in given.items():
        opts[k] = str(v)
    opts.update(extra or {})
    return opts


def build_write_options(url: str, table: str, *, user: str | None = None,
                        password: str | None = None, driver: str | None = None,
                        batchsize: int = DEFAULT_BATCH_SIZE,
                        num_partitions: int | None = None,
                        isolation_level: str = "READ_COMMITTED",
                        truncate: bool = False,
                        extra: dict | None = None) -> dict:
    """Options dict for a batched JDBC write (COPY-equivalent)."""
    opts = {
        "url": url,
        "dbtable": table,
        "batchsize": str(int(batchsize)),
        "isolationLevel": isolation_level,
        "truncate": str(bool(truncate)).lower(),
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if driver is not None:
        opts["driver"] = driver
    if num_partitions is not None:
        opts["numPartitions"] = str(int(num_partitions))
    opts.update(extra or {})
    return opts


def jdbc_read(spark: SparkSession, url: str, table: str, **kwargs) -> DataFrame:
    """Parallel JDBC table read.  ``kwargs`` as in :func:`build_read_options`."""
    return spark.read.format("jdbc").options(**build_read_options(url, table, **kwargs)).load()


def jdbc_extract_to_csv(spark: SparkSession, url: str, table: str, out_path: str,
                        **kwargs) -> None:
    """Table → CSV ingest (reference lambda_kietl.py:36-51), distributed:
    every column cast to string, header on, overwrite — the exact shape the
    engine's all-strings CSV scan expects back."""
    import pyspark.sql.functions as F

    df = jdbc_read(spark, url, table, **kwargs)
    all_str = df.select([F.col(c).cast("string").alias(c) for c in df.columns])
    all_str.write.mode("overwrite").option("header", "true").csv(out_path)


def jdbc_bulk_write(df: DataFrame, url: str, table: str, mode: str = "append",
                    **kwargs) -> None:
    """Batched parallel JDBC write — the Spark equivalent of the
    reference's ``cursor.copy_from`` COPY (db_utils.py:123-130)."""
    (df.write.format("jdbc")
       .options(**build_write_options(url, table, **kwargs))
       .mode(mode).save())
