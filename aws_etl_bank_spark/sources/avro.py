"""Avro ingestion WITHOUT the spark-avro module: a pure-Python
decoder/encoder for the Avro binary datum format and the Object
Container File (OCF) layout, executed Arrow-batched inside
``mapInPandas`` — so the sandbox's missing ``spark-avro`` jar no longer
blocks the reference's avro surface (its format table:
glue-jobs/awsglue/context.py:53-54; unbox dispatch:
operators/dynamicframe.py).

Spark-first shape: OCF files enter through the built-in ``binaryFile``
source (one row per file: whole-file bytes + metadata), then each
PARTITION of files decodes in one Arrow-batched Python pass — the
decode parallelizes per file exactly like spark-avro's own split
strategy for deflate-compressed containers (OCF blocks inside one file
are sequential by design: each block's offset is only discoverable by
walking sync markers).  Datum columns (a ``binary`` column holding
schema-less serialized records — the Kafka/Glue "unbox avro" case)
decode row-vectorized per batch with the schema supplied as JSON,
mirroring ``from_avro(col, jsonFormatSchema)``.

Scope: the full primitive set (null, boolean, int, long, float, double,
bytes, string), records, enums, fixed, arrays, maps, unions, and the
``null``/``deflate`` OCF codecs (snappy needs a native lib the sandbox
lacks and raises a clear error).  Logical types decode as their
underlying primitive, like spark-avro with
``datetimeRebaseModeInRead=CORRECTED`` semantics left to the caller.

Correctness anchors (tests/test_avro.py): a byte-pinned fixture from
the Avro 1.12 spec's own worked example, an encode→decode roundtrip
property test, and — when the JVM is up — a cross-check against the
REAL org.apache.avro classes already on Spark's classpath
(avro-1.12.1.jar ships with pyspark even though spark-avro does not).
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Iterator

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary datum primitives
# ---------------------------------------------------------------------------

def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (Avro int and long share the encoding)."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_varlong(out: bytearray, v: int) -> None:
    """Zigzag + varint, the spec's long encoding.  Python's
    arbitrary-precision ints make ``(v << 1) ^ (v >> 63)`` correct for
    BOTH signs (for negative v, ``v >> 63`` is -1 and the xor yields
    ``-2v - 1``); the 64-bit mask bounds the negative case's infinite
    two's-complement form."""
    u = ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1) if v < 0 else v << 1
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


# ---------------------------------------------------------------------------
# schema-driven decode
# ---------------------------------------------------------------------------

def decode_datum(buf: io.BytesIO, schema: Any) -> Any:
    """Decode ONE value of ``schema`` (parsed avro-JSON: str for
    primitives, dict for named types, list for unions)."""
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):
        idx = _read_long(buf)
        return decode_datum(buf, schema[idx])
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):  # {"type": {...nested...}}
            return decode_datum(buf, t)
    if t == "null":
        return None
    if t == "boolean":
        b = buf.read(1)
        if not b:
            raise EOFError("truncated boolean")
        return b[0] == 1
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "record":
        return {f["name"]: decode_datum(buf, f["type"])
                for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        data = buf.read(schema["size"])
        if len(data) != schema["size"]:
            raise EOFError("truncated fixed")
        return data
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:   # block with byte-size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(decode_datum(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = decode_datum(buf, schema["values"])
    raise ValueError(f"unsupported avro type: {t!r}")


def encode_datum(out: bytearray, value: Any, schema: Any) -> None:
    """Encode ONE value (the writer half — fixtures, roundtrips, and the
    avro SINK path)."""
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):
        idx = _union_branch(value, schema)
        _write_varlong(out, idx)
        encode_datum(out, value, schema[idx])
        return
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):
            encode_datum(out, value, t)
            return
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        _write_varlong(out, int(value))
    elif t == "float":
        out.extend(struct.pack("<f", float(value)))
    elif t == "double":
        out.extend(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_varlong(out, len(value))
        out.extend(value)
    elif t == "string":
        raw = value.encode("utf-8")
        _write_varlong(out, len(raw))
        out.extend(raw)
    elif t == "record":
        for f in schema["fields"]:
            encode_datum(out, value[f["name"]], f["type"])
    elif t == "enum":
        _write_varlong(out, schema["symbols"].index(value))
    elif t == "fixed":
        assert len(value) == schema["size"]
        out.extend(value)
    elif t == "array":
        if value:
            _write_varlong(out, len(value))
            for item in value:
                encode_datum(out, item, schema["items"])
        _write_varlong(out, 0)
    elif t == "map":
        if value:
            _write_varlong(out, len(value))
            for k, v in value.items():
                raw = k.encode("utf-8")
                _write_varlong(out, len(raw))
                out.extend(raw)
                encode_datum(out, v, schema["values"])
        _write_varlong(out, 0)
    else:
        raise ValueError(f"unsupported avro type: {t!r}")


def _union_branch(value: Any, union: list) -> int:
    """Pick the union branch for a python value — null-vs-one-type
    unions (the nullable-column case) resolve exactly; wider unions
    match on python type."""
    for i, s in enumerate(union):
        t = s if isinstance(s, str) else s.get("type")
        if value is None and t == "null":
            return i
        if value is not None and t != "null":
            if t in ("int", "long") and isinstance(value, int) \
                    and not isinstance(value, bool):
                return i
            if t in ("float", "double") and isinstance(value, float):
                return i
            if t == "string" and isinstance(value, str):
                return i
            if t == "boolean" and isinstance(value, bool):
                return i
            if t in ("bytes", "fixed") and isinstance(value, bytes):
                return i
            if t in ("record", "map") and isinstance(value, dict):
                return i
            if t == "array" and isinstance(value, list):
                return i
            if t == "enum" and isinstance(value, str):
                return i
    raise ValueError(f"no union branch for {value!r} in {union!r}")


# ---------------------------------------------------------------------------
# Object Container Files
# ---------------------------------------------------------------------------

def read_ocf_bytes(data: bytes) -> tuple[dict, list]:
    """Decode one whole OCF file: (parsed schema, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(
            f"unsupported OCF codec {codec!r}: only null/deflate decode "
            "without native libraries (snappy needs python-snappy)")
    sync = buf.read(16)
    records: list = []
    while True:
        head = buf.read(1)
        if not head:
            break  # clean EOF at a block boundary
        buf.seek(-1, io.SEEK_CUR)
        count = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if len(block) != size:
            raise EOFError("truncated OCF block")
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(decode_datum(bbuf, schema))
        if buf.read(16) != sync:
            raise ValueError("OCF sync marker mismatch (corrupt block)")
    return schema, records


def write_ocf_bytes(records: list, schema: dict,
                    codec: str = "null") -> bytes:
    """Encode records into one OCF file (fixture/sink path).  The sync
    marker derives deterministically from the schema so identical
    inputs produce identical files (reproducible fixtures)."""
    import hashlib

    if codec not in ("null", "deflate"):
        raise ValueError("codec must be null or deflate")
    schema_raw = json.dumps(schema, sort_keys=True).encode("utf-8")
    sync = hashlib.md5(b"spark-graft-avro" + schema_raw).digest()
    out = bytearray()
    out.extend(MAGIC)
    meta = {"avro.schema": schema_raw, "avro.codec": codec.encode("utf-8")}
    _write_varlong(out, len(meta))
    for k, v in sorted(meta.items()):
        raw = k.encode("utf-8")
        _write_varlong(out, len(raw))
        out.extend(raw)
        _write_varlong(out, len(v))
        out.extend(v)
    _write_varlong(out, 0)
    out.extend(sync)
    body = bytearray()
    for rec in records:
        encode_datum(body, rec, schema)
    if records:
        payload = bytes(body)
        if codec == "deflate":
            co = zlib.compressobj(wbits=-15)
            payload = co.compress(payload) + co.flush()
        _write_varlong(out, len(records))
        _write_varlong(out, len(payload))
        out.extend(payload)
        out.extend(sync)
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def avro_schema_to_spark(schema: Any):
    """Avro schema (parsed JSON) → Spark DataType, spark-avro's mapping:
    int→int, long→bigint, union-with-null→nullable, enum→string,
    fixed→binary, record→struct, array→array, map→map<string,...>."""
    from pyspark.sql import types as T

    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError("only unions of null + one type map to a "
                             f"Spark column type: {schema!r}")
        return avro_schema_to_spark(non_null[0])
    if isinstance(schema, str):
        prim = {"null": T.NullType(), "boolean": T.BooleanType(),
                "int": T.IntegerType(), "long": T.LongType(),
                "float": T.FloatType(), "double": T.DoubleType(),
                "bytes": T.BinaryType(), "string": T.StringType()}
        if schema not in prim:
            raise ValueError(f"unsupported avro primitive {schema!r}")
        return prim[schema]
    t = schema["type"]
    if isinstance(t, (dict, list)):
        return avro_schema_to_spark(t)
    if t == "record":
        return T.StructType([
            T.StructField(f["name"], avro_schema_to_spark(f["type"]),
                          nullable=_nullable(f["type"]))
            for f in schema["fields"]])
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    if t == "array":
        return T.ArrayType(avro_schema_to_spark(schema["items"]))
    if t == "map":
        return T.MapType(T.StringType(),
                         avro_schema_to_spark(schema["values"]))
    return avro_schema_to_spark(t)


def _logical_type(schema: Any) -> str | None:
    """The field's avro ``logicalType`` annotation, looking through a
    null-union; None when the type is a bare primitive/complex."""
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) == 1:
            return _logical_type(non_null[0])
        return None
    if isinstance(schema, dict):
        return schema.get("logicalType")
    return None


def avro_logical_casts(df, schema: dict):
    """Decorate a primitively-decoded avro record frame with its
    LOGICAL types — the piece spark-avro does during decode and this
    codec deliberately leaves to a column expression (r9 verdict task
    6).  timestamp-millis/micros (long) → TIMESTAMP, date (int) →
    DATE; every conversion is a built-in JVM expression
    (``timestamp_millis``/``timestamp_micros``/``date_from_unix_date``)
    so the decoration costs no Python and survives whole-stage codegen.
    Fields without a recognized logicalType pass through untouched;
    decimal/time-* stay primitive (documented codec scope)."""
    import pyspark.sql.functions as F

    casts = {}
    for f in schema.get("fields", []):
        lt = _logical_type(f["type"])
        if lt == "timestamp-micros":
            casts[f["name"]] = F.timestamp_micros(F.col(f["name"]))
        elif lt == "timestamp-millis":
            casts[f["name"]] = F.timestamp_millis(F.col(f["name"]))
        elif lt == "date":
            casts[f["name"]] = F.date_from_unix_date(F.col(f["name"]))
    out = df
    for name, expr in casts.items():
        if name in out.columns:
            out = out.withColumn(name, expr)
    return out


def _nullable(schema: Any) -> bool:
    return isinstance(schema, list) and "null" in schema


def _int_fields(schema: dict) -> list[str]:
    """Top-level record fields whose Spark type is IntegerType (Avro
    ``int``) — pandas hands them back as int64, so the decode path
    downcasts exactly these."""
    names = []
    for f in schema.get("fields", []):
        ft = f["type"]
        if isinstance(ft, list):
            non_null = [s for s in ft if s != "null"]
            ft = non_null[0] if len(non_null) == 1 else ft
        if ft == "int":
            names.append(f["name"])
    return names


def read_avro(spark, path: str):
    """OCF directory/file → DataFrame, no spark-avro jar: the built-in
    ``binaryFile`` source lists and reads the files (so predicate-less
    file pruning, S3A committers, and partition listing are all Spark's
    own), then each partition of files decodes in ONE Arrow-batched
    Python pass.  Parallelism = files, the same granularity spark-avro
    achieves on deflate OCFs.  The schema comes from the first file's
    header (one tiny driver-side read through the same source), like
    spark-avro's schema inference.

    The decode runs through ``mapInArrow`` (r11): the output batch is
    built with ``pa.Table.from_pylist`` under the exact Arrow schema,
    never through pandas — so a stored NaN double survives as NaN
    (``pa.Array.from_pandas`` would mask it to null) and integer
    columns need no nullable-dtype dance."""
    first = (spark.read.format("binaryFile").load(path)
             .select("content").limit(1).collect())
    if not first:
        raise ValueError(f"no avro files under {path!r}")
    schema, _ = read_ocf_bytes(bytes(first[0]["content"]))
    if schema.get("type") != "record":
        raise ValueError("top-level avro schema must be a record")
    spark_schema = avro_schema_to_spark(schema)

    expected_schema = json.dumps(schema, sort_keys=True)

    def decode(batches):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(spark_schema)
        for batch in batches:
            rows: list[dict] = []
            for blob in batch.column(0):
                fschema, recs = read_ocf_bytes(bytes(blob.as_py()))
                # every file decodes under its own embedded writer
                # schema; a silently different one would fill
                # NULLs / drop fields instead of erroring (r9
                # ADVICE) — fail loudly like spark-avro does when it
                # cannot resolve
                if json.dumps(fschema, sort_keys=True) != expected_schema:
                    raise ValueError(
                        "read_avro: mixed writer schemas in directory "
                        f"(expected {expected_schema}, found a file with "
                        f"{json.dumps(fschema, sort_keys=True)}); "
                        "reader-schema resolution is not implemented")
                rows.extend(recs)
            tbl = pa.Table.from_pylist(rows, schema=arrow_schema)
            yield from tbl.to_batches()

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInArrow(decode, spark_schema)


def write_avro(df, path: str, codec: str = "null",
               schema: dict | None = None) -> None:
    """DataFrame → OCF files, one per partition (the mirror of
    :func:`read_avro`; mapInPandas so the write parallelizes and
    nothing collects to the driver).  Column types must map onto avro
    primitives.  ``path`` must be visible to every executor (local
    mode / NFS — a real cluster sink would go through a Hadoop
    committer instead, which is the spark-avro jar's job).

    Retry-safe: the part name is the PARTITION id (not a uuid/random),
    and the bytes land via write-to-temp + atomic rename — a retried
    task overwrites its own file instead of adding a duplicate."""
    import os

    import pandas as pd

    if schema is None:
        schema = spark_schema_to_avro(df.schema)
    os.makedirs(path, exist_ok=True)
    # overwrite semantics: a previous write's parts would otherwise
    # survive and duplicate rows on read-back
    for stale in os.listdir(path):
        if stale.endswith(".avro"):
            os.remove(os.path.join(path, stale))
    schema_json = json.dumps(schema, sort_keys=True)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        sch = json.loads(schema_json)
        null_ok = _null_union_fields(sch)
        recs: list[dict] = []
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                clean = {}
                for k, v in _pyify(rec).items():
                    # pd.isna on a list/ndarray returns an elementwise
                    # array whose truth value is ambiguous — restrict
                    # the NaN→None rewrite to scalars (r9 ADVICE), and
                    # to NULL-UNION fields only (r10 ADVICE): a NaN
                    # double in a non-null double field is a genuine
                    # representable Avro value and must encode as NaN,
                    # not silently become null (which encode_datum
                    # would reject for a non-union field anyway).
                    if (k in null_ok and pd.api.types.is_scalar(v)
                            and pd.isna(v)):
                        v = None
                    clean[k] = v
                recs.append(clean)
        if recs:
            pid = TaskContext.get().partitionId()
            final = os.path.join(path, f"part-{pid:05d}.avro")
            tmp = final + f".tmp-{TaskContext.get().taskAttemptId()}"
            with open(tmp, "wb") as f:
                f.write(write_ocf_bytes(recs, sch, codec=codec))
            os.replace(tmp, final)
        yield pd.DataFrame({"files": [1 if recs else 0]})

    df.mapInPandas(enc, "files int").agg({"files": "sum"}).collect()


def spark_schema_to_avro(schema) -> dict:
    """StructType → avro record schema (nullable fields become
    null-unions), the write-side mapping."""
    from pyspark.sql import types as T

    def conv(dt):
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, T.IntegerType):
            return "int"
        if isinstance(dt, (T.LongType, T.ShortType, T.ByteType)):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": conv(dt.elementType)}
        if isinstance(dt, T.MapType):
            return {"type": "map", "values": conv(dt.valueType)}
        if isinstance(dt, T.StructType):
            return {"type": "record", "name": "nested",
                    "fields": [{"name": f.name, "type": conv(f.dataType)}
                               for f in dt.fields]}
        raise ValueError(f"no avro mapping for {dt}")

    return {"type": "record", "name": "row",
            "fields": [{"name": f.name,
                        "type": ["null", conv(f.dataType)]
                        if f.nullable else conv(f.dataType)}
                       for f in schema.fields]}


def from_avro_datum(df, col: str, schema_json: str, out_col: str = "value"):
    """Schema-less binary DATUM column → typed struct column — the
    ``from_avro(col, jsonFormatSchema)`` / Glue ``unbox(format="avro")``
    surface (reference: awsglue DynamicFrame.unbox format table).  One
    Arrow-batched pass; rows that fail to decode yield NULL structs
    (the drop-malformed policy the CSV/JSON unbox paths share)."""
    import pandas as pd

    schema = json.loads(schema_json)
    spark_t = avro_schema_to_spark(schema)
    passthrough = [f for f in df.schema.fields if f.name != out_col]
    from pyspark.sql import types as T
    result = T.StructType(passthrough
                          + [T.StructField(out_col, spark_t, True)])
    src_cols = [f.name for f in passthrough]

    def decode(batches):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_type

        out_t = to_arrow_type(spark_t)
        for batch in batches:
            names = batch.schema.names
            vals = []
            for blob in batch.column(names.index(col)):
                b = blob.as_py()
                if b is None:
                    vals.append(None)
                    continue
                try:
                    vals.append(decode_datum(io.BytesIO(bytes(b)), schema))
                except Exception:
                    vals.append(None)
            # pa.array on python objects (NOT from_pandas) keeps a
            # decoded NaN double as NaN instead of masking it to null
            arrays = [batch.column(names.index(c)) for c in src_cols]
            yield pa.RecordBatch.from_arrays(
                arrays + [pa.array(vals, type=out_t)],
                src_cols + [out_col])

    return df.mapInArrow(decode, result)


def to_avro_datum(df, cols: list[str], schema_json: str,
                  out_col: str = "avro"):
    """Struct-of-columns → binary avro datum column (the encode mirror,
    and what the roundtrip oracle entries drive)."""
    import pandas as pd

    schema = json.loads(schema_json)
    passthrough = [f for f in df.schema.fields]
    from pyspark.sql import types as T
    result = T.StructType(passthrough
                          + [T.StructField(out_col, T.BinaryType(), True)])
    names = [f.name for f in passthrough]

    null_ok = _null_union_fields(schema)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for rec in pdf[cols].to_dict("records"):
                # NULLs in numeric columns arrive as NaN through the
                # Arrow→numpy conversion; rewrite scalar NaN→None so
                # the union dispatch picks the null branch — but ONLY
                # for null-union fields (r10 ADVICE): a genuine NaN in
                # a non-null double field stays NaN (same clean as
                # write_avro)
                clean = {k: (None if k in null_ok
                             and pd.api.types.is_scalar(v)
                             and pd.isna(v) else v)
                         for k, v in _pyify(rec).items()}
                out = bytearray()
                encode_datum(out, clean, schema)
                blobs.append(bytes(out))
            res = pdf[names].copy()
            res[out_col] = blobs
            yield res

    return df.mapInPandas(encode, result)


def _null_union_fields(schema: dict) -> set:
    """Names of record fields whose type is a union containing
    ``"null"`` — the only fields where a pandas-NaN may legitimately
    be rewritten to None on the encode path (r10 ADVICE: NaN in a
    non-null double field is a representable Avro value)."""
    return {f["name"] for f in schema.get("fields", [])
            if isinstance(f.get("type"), list) and "null" in f["type"]}


def _pyify(rec: dict) -> dict:
    """numpy scalars → python scalars so encode_datum's type dispatch
    (int/float/str/bytes) sees stdlib types.  Arrow hands array columns
    back as numpy ndarrays — ``.tolist()`` converts them (deeply) to
    python lists; the old ``hasattr(v, "item")`` path raised ValueError
    on any size>1 array (r9 ADVICE)."""
    import numpy as np

    out = {}
    for k, v in rec.items():
        if isinstance(v, np.ndarray):
            v = v.tolist()
        elif hasattr(v, "item"):
            v = v.item()
        out[k] = v
    return out
