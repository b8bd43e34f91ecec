"""Custom PYTHON DataSource (the Spark 4 ``pyspark.sql.datasource``
API) — the modern counterpart of the reference's custom-connector
dispatch (`getSource(connection_type=...)`, glue-jobs/awsglue/
context.py): a connector whose planning AND reading are plain Python,
registered once and addressed as ``spark.read.format(name)``.

The demonstrator here is a pyarrow-backed parquet reader with
ROW-GROUP partitioning: ``partitions()`` lists the file's row groups
from the footer (driver-side metadata only), and each task reads just
its row group and yields Arrow RecordBatches — so the custom connector
parallelizes like a native scan and never materializes Python row
objects (the API consumes Arrow batches zero-copy).  Column pruning is
explicit via the ``columns`` option, mirroring how a pushdown-capable
connector would honor ``ReadSchema``.
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceArrowWriter,
                                    DataSourceReader, InputPartition,
                                    WriterCommitMessage)

_ARROW_TO_DDL = {
    "int64": "bigint", "int32": "int", "int16": "smallint",
    "int8": "tinyint", "double": "double", "float": "float",
    "string": "string", "large_string": "string", "bool": "boolean",
    "date32[day]": "date", "binary": "binary",
}


class PyArrowParquetDataSource(DataSource):
    """format name: ``pyarrow_parquet``; options: ``path`` (a single
    parquet file), ``columns`` (comma-separated projection)."""

    @classmethod
    def name(cls) -> str:
        return "pyarrow_parquet"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        path = self.options["path"]
        cols = [c for c in self.options.get("columns", "").split(",") if c]
        sch = pq.read_schema(path)
        fields = []
        for name in (cols or sch.names):
            t = str(sch.field(name).type)
            if t.startswith("decimal"):
                ddl = t
            elif t.startswith("timestamp"):
                ddl = "timestamp_ntz" if "tz=" not in t else "timestamp"
            else:
                ddl = _ARROW_TO_DDL.get(t)
            if ddl is None:
                raise ValueError(f"pyarrow_parquet: no DDL mapping for "
                                 f"arrow type {t!r} (column {name})")
            fields.append(f"{name} {ddl}")
        return ", ".join(fields)

    def reader(self, schema) -> "PyArrowParquetReader":
        return PyArrowParquetReader(self.options)

    def writer(self, schema, overwrite: bool) -> "PyArrowParquetWriter":
        # overwrite is deferred to commit(): deleting the old part
        # files here (planning time) would destroy the existing data
        # BEFORE any task ran, so a job that later fails to commit
        # would leave neither old nor new data — the torn state the
        # staged-commit protocol exists to prevent (r14 review)
        return PyArrowParquetWriter(self.options, overwrite)


class PyArrowParquetReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.columns = [c for c in options.get("columns", "").split(",")
                        if c] or None
        self.pushed: list = []

    @property
    def _float_cols(self) -> set:
        """Floating-point columns by name, read LAZILY from the footer
        on the first pushFilters call (an unfiltered scan never pays
        this read, and a path that only materializes between planning
        and execution doesn't fail reader construction): Spark's SQL
        comparison semantics on doubles differ from IEEE (NaN = NaN is
        TRUE; NaN sorts GREATER than every double), and Spark does NOT
        re-evaluate filters a reader claims — so any comparison
        touching a float column (or a NaN literal) must be yielded
        back, never claimed (ADVICE r13, medium)."""
        cached = getattr(self, "_float_cols_cache", None)
        if cached is None:
            import pyarrow.parquet as pq

            sch = pq.read_schema(self.path)
            cached = {
                name for name in sch.names
                if str(sch.field(name).type) in ("float", "double",
                                                 "halffloat")}
            self._float_cols_cache = cached
        return cached

    def pushFilters(self, filters):
        """Filter pushdown (Spark 4.1 ``DataSourceReader.pushFilters``):
        accept simple top-level-column comparisons and handle them FULLY
        inside the connector — footer-statistics row-group pruning in
        ``partitions()`` (whole row groups skipped from the plan, the
        same win native parquet gets from min/max stats) plus exact
        Arrow-compute masking in ``read()`` (required: Spark does not
        re-evaluate filters we keep).  Everything else is yielded back
        for Spark to evaluate post-scan."""
        from pyspark.sql.datasource import (EqualTo, GreaterThan,
                                            GreaterThanOrEqual, In,
                                            IsNotNull, LessThan,
                                            LessThanOrEqual)

        import math

        prims = (int, float, str, bool)

        def _nan(v):
            return isinstance(v, float) and math.isnan(v)

        supported = (EqualTo, GreaterThan, GreaterThanOrEqual,
                     LessThan, LessThanOrEqual, IsNotNull, In)
        for f in filters:
            if isinstance(f, In):
                ok = (len(f.attribute) == 1 and f.value
                      and all(isinstance(v, prims) for v in f.value)
                      and not any(_nan(v) for v in f.value))
            else:
                ok = (isinstance(f, supported)
                      and len(f.attribute) == 1
                      and (isinstance(f, IsNotNull)
                           or (isinstance(f.value, prims)
                               and not _nan(f.value))))
            # comparisons against a floating-point COLUMN are unsafe
            # even with a non-NaN literal: the column may hold NaN,
            # and Spark orders NaN above every double while IEEE
            # (pyarrow.compute, Python <) makes every NaN comparison
            # false — e.g. `x > 5.0` must RETURN NaN rows under Spark
            # semantics but the claimed mask would drop them.
            # IsNotNull stays claimable (NaN is non-null under both).
            if ok and not isinstance(f, IsNotNull) \
                    and len(f.attribute) == 1 \
                    and f.attribute[0] in self._float_cols:
                ok = False
            if ok:
                self.pushed.append(f)
            else:
                yield f

    def _rg_can_match(self, meta, rg_idx) -> bool:
        """min/max-statistics pruning: False only when a pushed filter
        PROVABLY excludes every row of the group."""
        from pyspark.sql.datasource import (EqualTo, GreaterThan,
                                            GreaterThanOrEqual, In,
                                            IsNotNull, LessThan,
                                            LessThanOrEqual)

        rg = meta.row_group(rg_idx)
        stats = {}
        for j in range(rg.num_columns):
            col = rg.column(j)
            if col.statistics is not None and col.statistics.has_min_max:
                stats[col.path_in_schema] = col.statistics
        for f in self.pushed:
            name = f.attribute[0]
            st = stats.get(name)
            if st is None:
                continue
            if isinstance(f, IsNotNull):
                if st.null_count is not None \
                        and st.null_count == rg.num_rows:
                    return False
                continue
            if isinstance(f, In):
                try:
                    if all(v < st.min or v > st.max for v in f.value):
                        return False
                except TypeError:
                    pass
                continue
            v = f.value
            try:
                if isinstance(f, EqualTo) and (v < st.min or v > st.max):
                    return False
                if isinstance(f, GreaterThan) and st.max <= v:
                    return False
                if isinstance(f, GreaterThanOrEqual) and st.max < v:
                    return False
                if isinstance(f, LessThan) and st.min >= v:
                    return False
                if isinstance(f, LessThanOrEqual) and st.min > v:
                    return False
            except TypeError:
                continue        # incomparable stats type: keep the group
        return True

    def partitions(self):
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(self.path).metadata
        n = meta.num_row_groups
        keep = [i for i in range(n)
                if not self.pushed or self._rg_can_match(meta, i)]
        return [InputPartition(i) for i in (keep or [0])] \
            if n else [InputPartition(0)]

    def _mask(self, tbl):
        import pyarrow as pa
        import pyarrow.compute as pc
        from pyspark.sql.datasource import (EqualTo, GreaterThan,
                                            GreaterThanOrEqual, In,
                                            IsNotNull, LessThan,
                                            LessThanOrEqual)

        mask = None
        ops = {EqualTo: pc.equal, GreaterThan: pc.greater,
               GreaterThanOrEqual: pc.greater_equal,
               LessThan: pc.less, LessThanOrEqual: pc.less_equal}
        for f in self.pushed:
            col = tbl[f.attribute[0]]
            if isinstance(f, IsNotNull):
                m = pc.is_valid(col)
            elif isinstance(f, In):
                m = pc.is_in(col, value_set=pa.array(
                    list(f.value), type=col.type))
            else:
                m = ops[type(f)](col, f.value)
            mask = m if mask is None else pc.and_kleene(mask, m)
        return mask

    def read(self, partition):
        import pyarrow.parquet as pq

        f = pq.ParquetFile(self.path)
        if f.metadata.num_row_groups == 0:
            return
        # read filter columns too, then project back: the pushed mask
        # may reference columns outside the pruned projection
        need = None
        if self.columns:
            extra = [flt.attribute[0] for flt in self.pushed
                     if flt.attribute[0] not in self.columns]
            need = self.columns + sorted(set(extra))
        tbl = f.read_row_group(partition.value, columns=need)
        if self.pushed:
            mask = self._mask(tbl)
            if mask is not None:
                # null comparisons drop the row, matching SQL semantics
                tbl = tbl.filter(mask, null_selection_behavior="drop")
        if self.columns:
            tbl = tbl.select(self.columns)
        if tbl.num_rows == 0:
            return
        yield from tbl.to_batches()


class PyArrowParquetWriter(DataSourceArrowWriter):
    """Arrow-native writer half of the connector (the Spark 4
    ``DataSourceArrowWriter`` API): each task streams its
    ``RecordBatch`` iterator into ONE parquet file under the target
    directory — batches never materialize as Python rows, mirroring
    the reader's zero-copy posture.

    Job-commit protocol (ADVICE r12): tasks only STAGE — each attempt
    writes a dot-prefixed file (hidden from parquet directory readers)
    named by (partitionId, attemptNumber, uuid) and returns it in its
    commit message.  Publication happens solely in ``commit()``, which
    renames exactly the staged files Spark kept — ONE winning attempt
    per partition — and sweeps every orphaned stage file.  A task
    re-executed after success (stage retry, speculation, lost commit
    message) therefore can never leave a reader-visible duplicate;
    ``abort`` removes all stage files."""

    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        try:
            from pyspark import TaskContext
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx else 0
            att = ctx.attemptNumber() if ctx else 0
        except Exception:
            pid, att = 0, 0

        os.makedirs(self.path, exist_ok=True)
        token = uuid.uuid4().hex
        staged = os.path.join(
            self.path, f".staged-{pid:05d}-{att}-{token}.parquet")
        final = os.path.join(self.path, f"part-{pid:05d}-{token}.parquet")
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
        if writer is None:
            return WriterCommitMessage()          # empty partition
        msg = WriterCommitMessage()
        msg.staged = staged                       # type: ignore[attr-defined]
        msg.file = final                          # type: ignore[attr-defined]
        msg.rows = rows                           # type: ignore[attr-defined]
        return msg

    def _sweep_staged(self):
        import glob
        import os

        for orphan in glob.glob(os.path.join(self.path, ".staged-*")):
            try:
                os.remove(orphan)
            except OSError:
                pass

    def commit(self, messages):
        import os

        # three-pass publish: FIRST verify every winning attempt's
        # staged file is present, THEN rename all staged files to
        # their final names, and only THEN (for overwrite mode) delete
        # the previous job's part files.  Validating mid-rename would
        # publish the earlier partitions before raising on a missing
        # later one; deleting old data before the renames would make a
        # mid-loop os.replace failure (disk error) lose the old data
        # with only part of the new published.  Rename-first trades a
        # brief old+new duplication on crash for no-loss: final names
        # carry a per-job uuid, so they cannot collide with the
        # previous job's parts (ADVICE r13 low + r14 review + r14
        # ADVICE low).
        #
        # READER CONTRACT (ADVICE r15, acknowledged trade): between the
        # first rename and the last delete — and, after a crash inside
        # that window, until the next successful overwrite — a reader
        # that lists the directory sees old AND new part files, i.e.
        # doubled rows (never lost rows).  Readers must not list
        # concurrently with an overwrite commit; a crashed commit is
        # repaired by re-running the overwrite.  A _SUCCESS-manifest
        # read filter would close the window but requires every
        # consumer (including plain spark.read.parquet) to honor the
        # manifest, which this directory layout cannot force.
        to_publish = []
        for m in messages or []:
            staged = getattr(m, "staged", None)
            final = getattr(m, "file", None)
            if not (staged and final):
                continue                 # genuinely empty partition
            if not os.path.exists(staged):
                # a WINNING attempt's staged file is gone (swept,
                # lost, external delete): publishing without it would
                # be silent data loss — fail the job commit instead,
                # leaving any pre-existing data untouched
                raise RuntimeError(
                    f"pyarrow_parquet commit: staged file missing for "
                    f"a committed task attempt: {staged}")
            to_publish.append((staged, final))
        old_parts = []
        if self.overwrite:
            import glob

            keep = {final for _, final in to_publish}
            old_parts = [old for old in
                         glob.glob(os.path.join(self.path,
                                                "part-*.parquet"))
                         if old not in keep]
        for staged, final in to_publish:
            os.replace(staged, final)
        for old in old_parts:                     # delete LAST: a failed
            os.remove(old)                        # rename keeps old data
        self._sweep_staged()                      # losing attempts

    def abort(self, messages):
        self._sweep_staged()
