"""DataSource / DataSink — format-dispatched readers and writers
(reference awsglue/data_source.py, data_sink.py, context.py:86-120,295-354).

Connection types: ``s3``/``file`` (path-based: csv, parquet, json, orc,
avro), ``jdbc`` (Spark JDBC source), ``memory`` (test sink).  CSV reads
default to header + all-string columns — the reference never sets
inferSchema (r2g_account.py:72,85), and bit-faithful downstream implicit
casts depend on that (SURVEY.md §1.2).

Scale posture: readers are plain ``spark.read`` so predicate pushdown,
column pruning and partition pruning all apply; ``minPartitions`` is a
repartition floor applied only when the scan came back under-parallel
(reference data_source.py:27-38, context.py:73-84).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: Formats routed straight to the Spark SQL reader in the reference
#: (context.py:53-54).
SPARK_SQL_FORMATS = {"parquet", "orc"}

_PATH_CONNECTIONS = {"s3", "s3a", "file", "local", "path"}


def _apply_format_defaults(format: str, format_options: dict) -> dict:
    opts = dict(format_options or {})
    if format == "csv":
        # header + explicit delimiter, never inferSchema → all strings.
        opts.setdefault("header", "true")
        opts.setdefault("delimiter", opts.pop("separator", ","))
    return opts


class DataSource:
    def __init__(self, spark: SparkSession, connection_type: str,
                 connection_options: dict | None = None, format: str | None = None,
                 format_options: dict | None = None,
                 push_down_predicate: str = "", transformation_ctx: str = ""):
        if connection_type == "s3" and format is None:
            raise ValueError("s3 source requires a format (the reference rejects "
                             "formatless non-SQL formats, context.py:104-112)")
        self.spark = spark
        self.connection_type = connection_type
        self.connection_options = connection_options or {}
        self.format = format
        self.format_options = _apply_format_defaults(format or "", format_options or {})
        self.push_down_predicate = push_down_predicate
        self.transformation_ctx = transformation_ctx

    def setFormat(self, format: str, **options):
        self.format = format
        self.format_options = _apply_format_defaults(format, options)

    def getDataFrame(self, minPartitions: int | None = None,
                     targetPartitions: int | None = None) -> DataFrame:
        if self.connection_type in _PATH_CONNECTIONS:
            paths = self.connection_options.get("paths") or [self.connection_options["path"]]
            reader = self.spark.read.format(self.format)
            for k, v in self.format_options.items():
                reader = reader.option(k, v)
            if "schema" in self.connection_options:
                reader = reader.schema(self.connection_options["schema"])
            df = reader.load(paths if len(paths) > 1 else paths[0])
        elif self.connection_type == "jdbc":
            reader = self.spark.read.format("jdbc")
            for k, v in self.connection_options.items():
                reader = reader.option(k, v)
            df = reader.load()
        else:
            raise ValueError(f"unsupported connection_type {self.connection_type!r}")
        if self.push_down_predicate:
            # On partitioned layouts Catalyst turns this into partition
            # pruning (PartitionFilters in the scan), the Spark-native
            # equivalent of Glue catalog push_down_predicate.
            df = df.filter(self.push_down_predicate)
        if minPartitions and df.rdd.getNumPartitions() < minPartitions:
            df = df.repartition(targetPartitions or minPartitions)
        return df

    def getFrame(self, minPartitions=None, targetPartitions=None, glue_ctx=None, name=""):
        from aws_etl_bank_spark.operators.dynamicframe import DynamicFrame

        df = self.getDataFrame(minPartitions, targetPartitions)
        return DynamicFrame(df, glue_ctx, name or self.transformation_ctx)

    def getSampleFrame(self, num: int, glue_ctx=None, name="", **options):
        """reference data_source.py:42-44 — first-n sample."""
        from aws_etl_bank_spark.operators.dynamicframe import DynamicFrame

        return DynamicFrame(self.getDataFrame().limit(num), glue_ctx, name)


class DataSink:
    def __init__(self, spark: SparkSession, connection_type: str,
                 connection_options: dict | None = None, format: str | None = None,
                 format_options: dict | None = None, transformation_ctx: str = "",
                 catalog=None):
        self.spark = spark
        self.connection_type = connection_type
        self.connection_options = connection_options or {}
        self.format = format or "parquet"
        self.format_options = _apply_format_defaults(self.format, format_options or {})
        self.transformation_ctx = transformation_ctx
        self._catalog = catalog
        self._catalog_db = None
        self._catalog_table = None

    def setFormat(self, format: str, **options):
        self.format = format
        self.format_options = _apply_format_defaults(format, options)

    def setCatalogInfo(self, catalogDatabase: str, catalogTableName: str, catalogId=None):
        """reference data_sink.py:28-29 — also register the written table."""
        self._catalog_db = catalogDatabase
        self._catalog_table = catalogTableName

    def writeDataFrame(self, df: DataFrame) -> DataFrame:
        mode = self.connection_options.get("mode", "overwrite")
        if self.connection_type in _PATH_CONNECTIONS:
            path = self.connection_options["path"]
            writer = df.write.mode(mode).format(self.format)
            for k, v in self.format_options.items():
                writer = writer.option(k, v)
            partition_keys = self.connection_options.get("partitionKeys")
            if partition_keys:
                writer = writer.partitionBy(*partition_keys)
            writer.save(path)
            if self._catalog is not None and self._catalog_db:
                self._catalog.crawl(self.spark, self._catalog_db, self._catalog_table,
                                    path, self.format, partition_keys=partition_keys or [])
        elif self.connection_type == "jdbc":
            writer = df.write.format("jdbc").mode(mode)
            for k, v in self.connection_options.items():
                if k != "mode":
                    writer = writer.option(k, v)
            writer.save()
        else:
            raise ValueError(f"unsupported connection_type {self.connection_type!r}")
        return df

    def writeFrame(self, dynamic_frame):
        """Returns the frame's errors as a new frame, mirroring
        reference data_sink.py:31-32 (sink returns '<name>_errors')."""
        self.writeDataFrame(dynamic_frame.toDF())
        errs = dynamic_frame.errorsAsDynamicFrame()
        errs.name = f"{dynamic_frame.name}_errors"
        return errs

    def write(self, frame_or_collection):
        """Collections are written per-frame using frame names as leaf dirs
        (useFrameName, reference data_sink.py:38-49)."""
        from aws_etl_bank_spark.operators.dynamicframe import DynamicFrameCollection

        if isinstance(frame_or_collection, DynamicFrameCollection):
            results = {}
            base_path = self.connection_options.get("path", "")
            for name, frame in frame_or_collection:
                child = DataSink(
                    self.spark, self.connection_type,
                    {**self.connection_options, "path": f"{base_path.rstrip('/')}/{name}"},
                    self.format, self.format_options, self.transformation_ctx, self._catalog,
                )
                results[name] = child.writeFrame(frame)
            return results
        return self.writeFrame(frame_or_collection)
