"""Custom PYTHON STREAMING DataSource (the Spark 4
``DataSourceStreamReader`` API) — a Kinesis-shaped sharded source
implemented entirely in Python: the reference binds a Kinesis consumer
through a connector jar (`glue-jobs/awsglue/context.py:122-147`, the
jar is absent in this container); this module demonstrates the same
shard/offset contract with Spark's modern Python connector surface, so
the streaming-connector machinery is exercised end-to-end without any
jar.

Layout: a "stream" is a directory of S shard files
(``shard-00000.parquet`` ...), each internally ordered — the Kinesis
shard/sequence-number model.  Offsets are
``{"shard-00000": rows_consumed, ...}`` dicts (the checkpointable
primitive-dict shape the API requires).  ``latestOffset`` advances
each shard by at most ``maxRecordsPerBatch`` rows per micro-batch —
real rate limiting, so a run produces MULTIPLE micro-batches and the
offset/commit protocol is genuinely exercised.  ``partitions(start,
end)`` emits one InputPartition per advancing shard; executors read
ONLY their shard's row slice (pyarrow, driver never touches row data
— unlike SimpleDataSourceStreamReader, which is documented
driver-side and deliberately not used here).

Scale story: shards = partitions = executor parallelism, the offset
dict is O(shards), and each task's read is a contiguous row-range
slice of one shard file — the same contract a real Kinesis/Kafka
consumer honors at 1000 executors.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (DataSource, DataSourceStreamArrowWriter,
                                    DataSourceStreamReader,
                                    DataSourceStreamWriter, InputPartition,
                                    WriterCommitMessage)


def prepare_shards(df, path: str, shards: int, order_col: str) -> int:
    """Materialize a deterministic sharded stream feed: row r goes to
    shard ``pmod(order_col, shards)`` (stable across runs; pmod, not
    ``%`` — Spark's ``%`` follows the dividend's sign, so a negative
    key would match NO shard and silently vanish from the feed — ADVICE
    r12), ordered by ``order_col`` within the shard.  Returns total
    rows, verified against ``df.count()`` so a routing gap can never
    ship silently.

    Each shard is written EXECUTOR-side (sortWithinPartitions +
    single-partition parquet write, then the part file is renamed into
    place) — row data never passes through the driver, so feed prep
    scales like any other write."""
    import glob
    import shutil

    import pyspark.sql.functions as F

    os.makedirs(path, exist_ok=True)
    expected = df.count()
    total = 0
    for s in range(shards):
        part = (df.where(F.pmod(F.col(order_col), F.lit(shards)) == s)
                .repartition(1).sortWithinPartitions(order_col))
        staging = os.path.join(path, f"_build-{s:05d}")
        part.write.mode("overwrite").parquet(staging)
        src = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        final = os.path.join(path, f"shard-{s:05d}.parquet")
        os.replace(src, final)
        shutil.rmtree(staging, ignore_errors=True)
        import pyarrow.parquet as pq

        total += pq.ParquetFile(final).metadata.num_rows
    if total != expected:
        raise ValueError(
            f"shard routing dropped rows: wrote {total}, expected "
            f"{expected} — check {order_col} for values pmod misses")
    return total


class _ShardSlice(InputPartition):
    def __init__(self, path, lo, hi):
        self.path = path
        self.lo = lo
        self.hi = hi


class ShardedStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options["path"]
        self.max_per_batch = int(options.get("maxRecordsPerBatch", 1000))
        self._shards = sorted(
            f for f in os.listdir(self.path)
            if f.startswith("shard-") and f.endswith(".parquet"))
        import pyarrow.parquet as pq

        self._sizes = {
            s: pq.ParquetFile(os.path.join(self.path, s)).metadata.num_rows
            for s in self._shards}

    def initialOffset(self) -> dict:
        return {s: 0 for s in self._shards}

    def latestOffset(self) -> dict:
        # rate-limited: advance each shard by <= maxRecordsPerBatch
        # per planning call, so the run exercises real multi-batch
        # offset management instead of draining in one gulp
        cur = getattr(self, "_last_planned", None) or self.initialOffset()
        nxt = {s: min(self._sizes[s], cur[s] + self.max_per_batch)
               for s in self._shards}
        self._last_planned = nxt
        return nxt

    def partitions(self, start: dict, end: dict):
        # seed the rate-limit planning floor from the offsets Spark
        # passes (ADVICE r12): a fresh reader after a checkpoint
        # restart would otherwise plan from zero and emit a run of
        # no-op micro-batches until the ramp caught the committed
        # position (partitions() clamps hi > lo, so no data loss —
        # just wasted batches and a confusing offset trace)
        cur = getattr(self, "_last_planned", None) or self.initialOffset()
        self._last_planned = {
            s: max(cur.get(s, 0), int(start.get(s, 0)), int(end.get(s, 0)))
            for s in self._shards}
        out = []
        for s in self._shards:
            lo, hi = int(start.get(s, 0)), int(end.get(s, 0))
            if hi > lo:
                out.append(_ShardSlice(os.path.join(self.path, s), lo, hi))
        # the engine requires >= 1 partition per batch; an empty batch
        # (no shard advanced) still needs a no-op slice
        return out or [_ShardSlice(os.path.join(self.path,
                                                self._shards[0]), 0, 0)]

    def read(self, partition):
        import pyarrow.parquet as pq

        if partition.hi <= partition.lo:
            return
        tbl = pq.read_table(partition.path)
        yield from tbl.slice(partition.lo,
                             partition.hi - partition.lo).to_batches()

    def commit(self, end: dict) -> None:
        # files are immutable, so nothing to release; fold the
        # committed offset into the planning floor so a
        # restart-from-checkpoint (fresh reader, checkpointed start)
        # never plans an end behind the committed start
        cur = getattr(self, "_last_planned", None) or self.initialOffset()
        self._last_planned = {s: max(cur.get(s, 0), int(end.get(s, 0)))
                              for s in self._shards}

    def stop(self) -> None:
        pass


class ShardedStreamDataSource(DataSource):
    """format name ``sharded_stream``; options: ``path`` (shard dir),
    ``schema_ddl`` (DDL of the shard columns), ``maxRecordsPerBatch``."""

    @classmethod
    def name(cls) -> str:
        return "sharded_stream"

    def schema(self) -> str:
        return self.options["schema_ddl"]

    def streamReader(self, schema) -> ShardedStreamReader:
        return ShardedStreamReader(self.options)

    def streamWriter(self, schema, overwrite):
        # arrowSink=true selects the RecordBatch-native writer (Spark
        # 4.1 DataSourceStreamArrowWriter); default is the row-based
        # form — both share the manifest-commit protocol
        if str(self.options.get("arrowSink", "")).lower() == "true":
            return ArrowManifestStreamWriter(self.options)
        return ManifestStreamWriter(self.options)


class _SinkCommit(WriterCommitMessage):
    """Serializable commit message: the staged file and its row count."""

    def __init__(self, staged, rows):
        self.staged = staged
        self.rows = rows


class _ManifestCommitMixin:
    """Driver-side manifest-commit protocol shared by the row-based and
    Arrow streaming sinks: ``commit`` — once per micro-batch, only
    after every task succeeded — renames the staged files into
    ``data/`` and atomically publishes ``manifest-<batchId>.json``
    naming them; ``abort`` deletes the staged files.  A reader that
    trusts only manifest-listed files sees each micro-batch
    all-or-nothing, so a retried batch never double-publishes.  Driver
    state is O(files-per-batch); row data never touches the driver."""

    EXT = "jsonl"

    def commit(self, messages, batchId):
        import json

        data_dir = os.path.join(self.path, "data")
        os.makedirs(data_dir, exist_ok=True)
        published, total = [], 0
        for i, m in enumerate(messages):
            if m is None or m.rows == 0:
                if m is not None and os.path.exists(m.staged):
                    os.remove(m.staged)
                continue
            final = os.path.join(
                data_dir, f"batch-{batchId:08d}-{i}.{self.EXT}")
            os.replace(m.staged, final)
            published.append(os.path.basename(final))
            total += m.rows
        manifest = os.path.join(self.path, f"manifest-{batchId:08d}.json")
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batchId": batchId, "files": published,
                       "rows": total}, f)
        os.replace(tmp, manifest)

    def abort(self, messages, batchId):
        for m in messages or []:
            if m is not None and os.path.exists(m.staged):
                try:
                    os.remove(m.staged)
                except OSError:
                    pass


class ManifestStreamWriter(_ManifestCommitMixin, DataSourceStreamWriter):
    """Row-based manifest-committing exactly-once streaming SINK (the
    Spark 4 ``DataSourceStreamWriter`` protocol): tasks stream their
    rows to STAGED jsonl files and return commit messages; publication
    is the mixin's manifest commit."""

    EXT = "jsonl"

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        import json
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"task-{uuid.uuid4().hex}.jsonl")
        rows = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                rows += 1
        return _SinkCommit(staged, rows)


class ArrowManifestStreamWriter(_ManifestCommitMixin,
                                DataSourceStreamArrowWriter):
    """Arrow-native manifest sink (Spark 4.1
    ``DataSourceStreamArrowWriter``): tasks receive ``RecordBatch``
    iterators and stream them into STAGED parquet files — no Python
    row objects, the zero-copy twin of the row-based sink above, under
    the SAME manifest-commit exactly-once protocol."""

    EXT = "parquet"

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging,
                              f"task-{uuid.uuid4().hex}.parquet")
        writer = None
        rows = 0
        try:
            for batch in iterator:
                if writer is None:
                    writer = pq.ParquetWriter(staged, batch.schema)
                writer.write_table(pa.Table.from_batches([batch]))
                rows += batch.num_rows
        finally:
            if writer is not None:
                writer.close()
        return _SinkCommit(staged, rows)


def read_manifest_sink(spark, path: str, schema_ddl: str):
    """Batch-read ONLY the manifest-listed files of a manifest sink —
    staged/orphaned files are invisible, which is the exactly-once
    contract."""
    import glob
    import json

    files = []
    for mf in sorted(glob.glob(os.path.join(path, "manifest-*.json"))):
        with open(mf) as f:
            meta = json.load(f)
        files.extend(os.path.join(path, "data", name)
                     for name in meta["files"])
    if not files:
        return spark.createDataFrame([], schema_ddl)
    if files[0].endswith(".parquet"):        # Arrow sink variant
        return spark.read.schema(schema_ddl).parquet(*files)
    return spark.read.schema(schema_ddl).json(files)
