"""EngineContext — the GlueContext analog (reference awsglue/context.py).

Owns the SparkSession, the catalog, and source/sink dispatch.  Also hosts
the maintenance operations (purge/transition, context.py:461-545), the
sampled readers (context.py:239-281), ingestion-time columns
(context.py:666-674) and the streaming helpers (context.py:553-664 —
implemented in :mod:`aws_etl_bank_spark.streaming` and re-exported here).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from aws_etl_bank_spark.functions.columns import add_ingestion_time_columns
from aws_etl_bank_spark.operators.dynamicframe import DynamicFrame, DynamicFrameCollection
from aws_etl_bank_spark.sources.catalog import Catalog
from aws_etl_bank_spark.sources.datasource import DataSink, DataSource


class _FrameReader:
    """``ctx.create_dynamic_frame.from_catalog(...)`` attribute façade —
    the call shape every Glue script uses (reference dynamicframe.py:594-629).
    ``name_space`` is accepted as the legacy alias for ``database``."""

    def __init__(self, ctx: "EngineContext", dynamic: bool):
        self._ctx, self._dynamic = ctx, dynamic

    @staticmethod
    def _db(database, kwargs):
        if database is not None and "name_space" in kwargs:
            raise Exception("Parameter name_space and database are both specified, choose one.")
        if database is None and "name_space" not in kwargs:
            raise Exception("Parameter name_space or database is missing.")
        return kwargs.pop("name_space", database)

    def from_catalog(self, database=None, table_name=None, redshift_tmp_dir="",
                     transformation_ctx="", push_down_predicate="",
                     additional_options=None, catalog_id=None, **kwargs):
        db = self._db(database, kwargs)
        if table_name is None:
            raise Exception("Parameter table_name is missing.")
        if self._dynamic:
            return self._ctx.create_dynamic_frame_from_catalog(
                db, table_name, transformation_ctx=transformation_ctx,
                push_down_predicate=push_down_predicate,
                additional_options=additional_options or {})
        return self._ctx.create_data_frame_from_catalog(
            db, table_name, transformation_ctx=transformation_ctx,
            additional_options=additional_options or {})

    def from_options(self, connection_type, connection_options=None, format=None,
                     format_options=None, transformation_ctx="", **kwargs):
        fn = (self._ctx.create_dynamic_frame_from_options if self._dynamic
              else self._ctx.create_data_frame_from_options)
        return fn(connection_type, connection_options or {}, format,
                  format_options or {}, transformation_ctx)

    def from_rdd(self, data, name, schema=None, sample_ratio=None):
        return self._ctx.create_dynamic_frame_from_rdd(data, name, schema, sample_ratio)


class _FrameWriter:
    """``ctx.write_dynamic_frame.from_options(...)`` attribute façade
    (reference dynamicframe.py:632-670)."""

    def __init__(self, ctx: "EngineContext"):
        self._ctx = ctx

    def from_options(self, frame, connection_type, connection_options=None,
                     format=None, format_options=None, transformation_ctx=""):
        return self._ctx.write_dynamic_frame_from_options(
            frame, connection_type, connection_options or {}, format,
            format_options or {}, transformation_ctx)

    def from_catalog(self, frame, database=None, table_name=None, redshift_tmp_dir="",
                     transformation_ctx="", additional_options=None,
                     catalog_id=None, **kwargs):
        db = _FrameReader._db(database, kwargs)
        if table_name is None:
            raise Exception("Parameter table_name is missing.")
        return self._ctx.write_dynamic_frame_from_catalog(
            frame, db, table_name, redshift_tmp_dir, transformation_ctx,
            additional_options or {})

    def from_jdbc_conf(self, frame, catalog_connection, connection_options=None,
                       redshift_tmp_dir="", transformation_ctx=""):
        return self._ctx.write_dynamic_frame_from_jdbc_conf(
            frame, catalog_connection, connection_options or {},
            redshift_tmp_dir, transformation_ctx)


class EngineContext:
    def __init__(self, spark: SparkSession, catalog: Catalog | None = None,
                 min_partitions: int | None = None, target_partitions: int | None = None):
        self.spark = spark
        self.spark_session = spark  # reference-compatible attribute name
        self.catalog = catalog or Catalog()
        self.min_partitions = min_partitions
        self.target_partitions = target_partitions
        # Glue-script call shapes: ctx.create_dynamic_frame.from_catalog(...)
        self.create_dynamic_frame = _FrameReader(self, dynamic=True)
        self.create_data_frame = _FrameReader(self, dynamic=False)
        self.write_dynamic_frame = _FrameWriter(self)
        # per-context: registered credentials must not leak across contexts
        self._jdbc_connections: dict[str, dict] = {}

    # -- generic source/sink dispatch (context.py:86-120,295-311) ----------

    def getSource(self, connection_type: str, format: str | None = None,
                  transformation_ctx: str = "", push_down_predicate: str = "",
                  **options) -> DataSource:
        return DataSource(self.spark, connection_type, options, format,
                          options.get("format_options"), push_down_predicate,
                          transformation_ctx)

    def getSink(self, connection_type: str, format: str | None = None,
                transformation_ctx: str = "", **options) -> DataSink:
        return DataSink(self.spark, connection_type, options, format,
                        options.get("format_options"), transformation_ctx, self.catalog)

    # -- frame readers ------------------------------------------------------

    def create_dynamic_frame_from_options(self, connection_type: str,
                                          connection_options: dict | None = None,
                                          format: str | None = None,
                                          format_options: dict | None = None,
                                          transformation_ctx: str = "",
                                          push_down_predicate: str = "") -> DynamicFrame:
        src = DataSource(self.spark, connection_type, connection_options, format,
                         format_options, push_down_predicate, transformation_ctx)
        return src.getFrame(self.min_partitions, self.target_partitions, self, transformation_ctx)

    def create_dynamic_frame_from_catalog(self, database: str, table_name: str,
                                          redshift_tmp_dir: str = "",
                                          transformation_ctx: str = "",
                                          push_down_predicate: str = "",
                                          additional_options: dict | None = None,
                                          catalog_id=None) -> DynamicFrame:
        """reference context.py:158-188: catalog lookup → format-dispatched
        read with partition-predicate pushdown."""
        t = self.catalog.get_table(database, table_name)
        conn_opts = {"path": t.path, **t.options, **(additional_options or {})}
        schema = t.spark_schema()
        if schema is not None and t.format != "parquet" and not t.partition_keys:
            conn_opts["schema"] = schema
        src = DataSource(self.spark, "file", conn_opts, t.format, dict(t.options),
                         push_down_predicate, transformation_ctx)
        return src.getFrame(self.min_partitions, self.target_partitions, self, transformation_ctx)

    def create_data_frame_from_catalog(self, database: str, table_name: str,
                                       transformation_ctx: str = "",
                                       additional_options: dict | None = None) -> DataFrame:
        return self.create_dynamic_frame_from_catalog(
            database, table_name, transformation_ctx=transformation_ctx,
            additional_options=additional_options).toDF()

    def create_dynamic_frame_from_rdd(self, data, name: str, schema=None,
                                      sample_ratio=None,
                                      transformation_ctx: str = "") -> DynamicFrame:
        """reference context.py:152-156"""
        df = self.spark.createDataFrame(data, schema=schema, samplingRatio=sample_ratio)
        return DynamicFrame(df, self, name)

    def get_catalog_schema_as_spark_schema(self, database: str, table_name: str):
        """reference context.py:149-150"""
        return self.catalog.get_table(database, table_name).spark_schema()

    # -- sampled readers (context.py:239-281) -------------------------------

    def create_sample_dynamic_frame_from_catalog(self, database: str, table_name: str,
                                                 num: int, transformation_ctx: str = "",
                                                 push_down_predicate: str = "",
                                                 additional_options: dict | None = None) -> DynamicFrame:
        frame = self.create_dynamic_frame_from_catalog(
            database, table_name, transformation_ctx=transformation_ctx,
            push_down_predicate=push_down_predicate, additional_options=additional_options)
        return DynamicFrame(frame.toDF().limit(num), self, transformation_ctx)

    def create_sample_dynamic_frame_from_options(self, connection_type: str,
                                                 connection_options: dict | None = None,
                                                 num: int = 100, format: str | None = None,
                                                 format_options: dict | None = None,
                                                 transformation_ctx: str = "") -> DynamicFrame:
        frame = self.create_dynamic_frame_from_options(
            connection_type, connection_options, format, format_options, transformation_ctx)
        return DynamicFrame(frame.toDF().limit(num), self, transformation_ctx)

    # -- frame writers ------------------------------------------------------

    def write_dynamic_frame_from_options(self, frame, connection_type: str,
                                         connection_options: dict | None = None,
                                         format: str | None = None,
                                         format_options: dict | None = None,
                                         transformation_ctx: str = ""):
        sink = DataSink(self.spark, connection_type, connection_options, format,
                        format_options, transformation_ctx, self.catalog)
        return sink.write(frame)

    write_from_options = write_dynamic_frame_from_options

    def write_dynamic_frame_from_catalog(self, frame, database: str, table_name: str,
                                         redshift_tmp_dir: str = "",
                                         transformation_ctx: str = "",
                                         additional_options: dict | None = None,
                                         catalog_id=None):
        """reference context.py:358-390"""
        t = self.catalog.get_table(database, table_name)
        sink = DataSink(self.spark, "file", {"path": t.path, **(additional_options or {})},
                        t.format, dict(t.options), transformation_ctx, self.catalog)
        sink.setCatalogInfo(database, table_name)
        return sink.write(frame)

    def write_data_frame_from_catalog(self, df: DataFrame, database: str, table_name: str,
                                      redshift_tmp_dir: str = "",
                                      transformation_ctx: str = "",
                                      additional_options: dict | None = None):
        return self.write_dynamic_frame_from_catalog(
            DynamicFrame(df, self, table_name), database, table_name,
            redshift_tmp_dir, transformation_ctx, additional_options)

    def write_dynamic_frame_from_jdbc_conf(self, frame, catalog_connection: str,
                                           connection_options: dict | None = None,
                                           redshift_tmp_dir: str = "",
                                           transformation_ctx: str = ""):
        """reference context.py:407-436 — resolves connection credentials
        from a registered connection config, then JDBC-writes."""
        conf = self.extract_jdbc_conf(catalog_connection)
        opts = {**conf, **(connection_options or {})}
        sink = DataSink(self.spark, "jdbc", opts, "jdbc", None, transformation_ctx)
        return sink.write(frame)

    def register_jdbc_connection(self, name: str, conf: dict):
        self._jdbc_connections[name] = dict(conf)

    def extract_jdbc_conf(self, connection_name: str, catalog_id=None) -> dict:
        """reference context.py:451-459"""
        if connection_name not in self._jdbc_connections:
            raise KeyError(f"jdbc connection {connection_name!r} not registered")
        return dict(self._jdbc_connections[connection_name])

    # -- ingestion-time columns (context.py:666-674) ------------------------

    def add_ingestion_time_columns(self, df: DataFrame, time_granularity: str = "day") -> DataFrame:
        return add_ingestion_time_columns(df, time_granularity)

    # -- maintenance ops (context.py:461-545) -------------------------------

    def purge_s3_path(self, path: str, options: dict | None = None,
                      transformation_ctx: str = ""):
        """Delete files under a path older than retentionPeriod hours
        (default 168, i.e. 7 days — the Glue default)."""
        options = options or {}
        retention_hours = float(options.get("retentionPeriod", 168))
        cutoff = time.time() - retention_hours * 3600
        removed = []
        path = path.replace("file://", "")
        if not os.path.exists(path):
            return removed
        for root, _dirs, files in os.walk(path, topdown=False):
            for f in files:
                p = os.path.join(root, f)
                if os.path.getmtime(p) < cutoff:
                    os.remove(p)
                    removed.append(p)
            if not os.listdir(root):
                shutil.rmtree(root, ignore_errors=True)
        return removed

    def purge_table(self, database: str, table_name: str, options: dict | None = None,
                    transformation_ctx: str = ""):
        t = self.catalog.get_table(database, table_name)
        options = dict(options or {})
        predicate = options.get("partitionPredicate")
        if predicate and t.partition_keys:
            # Evaluate the partition predicate against partition dirs by
            # reading the partition values only (metadata-scale work).
            df = self.spark.read.format(t.format).load(t.path).select(*t.partition_keys).distinct()
            doomed = [r.asDict() for r in df.filter(predicate).collect()]
            removed = []
            for part in doomed:
                sub = "/".join(f"{k}={part[k]}" for k in t.partition_keys)
                target = os.path.join(t.path.replace("file://", ""), sub)
                if os.path.exists(target):
                    shutil.rmtree(target)
                    removed.append(target)
            return removed
        return self.purge_s3_path(t.path, options, transformation_ctx)

    def transition_s3_path(self, path: str, transition_to: str,
                           options: dict | None = None, transformation_ctx: str = ""):
        """Storage-class transition is an S3 control-plane action; locally
        it is recorded as a no-op manifest (the engine's S3 deployment maps
        this to lifecycle transitions)."""
        return {"path": path, "transition_to": transition_to, "options": options or {}}

    def transition_table(self, database: str, table_name: str, transition_to: str,
                         options: dict | None = None, transformation_ctx: str = ""):
        t = self.catalog.get_table(database, table_name)
        return self.transition_s3_path(t.path, transition_to, options, transformation_ctx)

    # -- governed-table transactions (context.py:676-683) -------------------
    # The reference exposes begin/commit/cancel but never calls them; we
    # map them onto no-op tokens (a Delta/Iceberg deployment would bind
    # these to real table transactions).

    _txn_counter = 0

    def start_transaction(self, read_only: bool = False) -> str:
        EngineContext._txn_counter += 1
        return f"txn-{EngineContext._txn_counter}"

    def commit_transaction(self, transaction_id: str) -> bool:
        return True

    def cancel_transaction(self, transaction_id: str) -> bool:
        return True

    # -- streaming (context.py:122-147,284-293,553-664) ---------------------

    def create_data_frame_from_options(self, connection_type: str,
                                       connection_options: dict | None = None,
                                       format: str | None = None,
                                       format_options: dict | None = None,
                                       transformation_ctx: str = "") -> DataFrame:
        """Streaming read → streaming DataFrame (reference
        context.py:284-293, streaming_data_source.py:16-28).

        Broker connection_types (kafka) dispatch to the matching
        Structured Streaming source with Glue-style options mapped onto
        the connector's names; file-backed types read a file stream.
        Executing a broker source needs its connector on the classpath
        (see streaming/connectors.py)."""
        from aws_etl_bank_spark.streaming.connectors import (
            BROKER_TYPES,
            UNSUPPORTED_BROKER_TYPES,
            resolve_stream_source,
        )

        ctype = (connection_type or "").lower()
        if ctype in BROKER_TYPES or ctype in UNSUPPORTED_BROKER_TYPES:
            fmt, mapped = resolve_stream_source(ctype, dict(connection_options or {}))
            reader = self.spark.readStream.format(fmt)
            for k, v in mapped.items():
                reader = reader.option(k, v)
            for k, v in (format_options or {}).items():
                reader = reader.option(k, v)
            return reader.load()
        reader = self.spark.readStream.format(format or "parquet")
        for k, v in (format_options or {}).items():
            reader = reader.option(k, v)
        opts = dict(connection_options or {})
        schema = opts.pop("schema", None)
        if schema is not None:
            reader = reader.schema(schema)
        path = opts.pop("path", None)
        for k, v in opts.items():
            reader = reader.option(k, v)
        return reader.load(path) if path else reader.load()

    getStreamingSource = create_data_frame_from_options

    def forEachBatch(self, frame: DataFrame, batch_function, options: dict):
        from aws_etl_bank_spark.streaming.runner import for_each_batch

        return for_each_batch(frame, batch_function, options)

    def getSampleStreamingDynamicFrame(self, frame: DataFrame, options: dict | None = None,
                                       batch_function=None) -> DynamicFrame:
        from aws_etl_bank_spark.streaming.runner import sample_streaming_frame

        df = sample_streaming_frame(self.spark, frame, options or {}, batch_function)
        return DynamicFrame(df, self, "sample_stream")
