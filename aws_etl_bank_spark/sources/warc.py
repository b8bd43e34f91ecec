"""WARC (ISO 28500) reader/writer — the Common Crawl container.

Web-scale training corpora arrive as ``.warc.gz``: a stream of
independently-gzipped members, each one WARC record = a header block
(``WARC/1.0`` + named fields, CRLF line endings) and a
``Content-Length``-framed payload.  No WARC library ships in this
runtime, so — like the Avro, JPEG, and PNG codecs — the format is
implemented from the public spec:

* ``write_warc_gz_bytes(records)`` — one gzip MEMBER per record
  (the Common Crawl layout: members concatenate into a legal gzip
  stream, and a range request can decompress a single record).
* ``iter_warc_records(data)`` — walks gzip members with a
  ``zlib.decompressobj`` loop (``unused_data`` hands back the next
  member — stdlib ``gzip.decompress`` would silently merge them),
  parses headers case-insensitively, and slices payloads by
  Content-Length — NEVER by delimiter scanning, so payloads may
  contain anything, including ``\\r\\n\\r\\n``.

Spark plumbing mirrors the Avro OCF pattern: ``write_warc`` emits one
``.warc.gz`` per partition via mapInPandas (nothing collects to the
driver), ``read_warc`` lists files with the built-in ``binaryFile``
source (Spark's own file listing/committers/pruning) and parses each
file in one Arrow-batched pass — parallelism = files, the granularity
real WARC processing uses (Common Crawl ships ~1 GB segments).
"""

from __future__ import annotations

import zlib
from typing import Iterator

_CRLF = b"\r\n"


def _gzip_member(data: bytes) -> bytes:
    import gzip

    return gzip.compress(data, compresslevel=6)


def write_warc_gz_bytes(records: list) -> bytes:
    """records = [(record_id, target_uri, payload_bytes), ...] →
    concatenated per-record gzip members (warc.gz layout)."""
    out = bytearray()
    for rid, uri, payload in records:
        head = (b"WARC/1.0" + _CRLF
                + b"WARC-Type: response" + _CRLF
                + b"WARC-Record-ID: <urn:uuid:" + str(rid).encode() + b">"
                + _CRLF
                + b"WARC-Target-URI: " + uri.encode() + _CRLF
                + b"Content-Length: " + str(len(payload)).encode() + _CRLF
                + _CRLF)
        out += _gzip_member(head + payload + _CRLF + _CRLF)
    return bytes(out)


def iter_warc_records(data: bytes):
    """warc.gz bytes → yields (headers dict lower-cased, payload
    bytes) per record, walking gzip members explicitly."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)        # gzip wrapper
        raw = d.decompress(data[pos:])
        raw += d.flush()
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("warc: stuck gzip member")
        pos += consumed
        sep = raw.find(_CRLF + _CRLF)
        if sep < 0 or not raw.startswith(b"WARC/"):
            raise ValueError("warc: malformed record header")
        headers = {}
        lines = raw[:sep].split(_CRLF)
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode()
        n = int(headers["content-length"])
        payload = raw[sep + 4:sep + 4 + n]
        if len(payload) != n:
            raise ValueError("warc: truncated payload")
        yield headers, payload


def write_warc(df, path: str, id_col: str, uri_col: str,
               payload_col: str) -> None:
    """DataFrame → one ``part-*.warc.gz`` per partition (payload
    column may be string or binary)."""
    import os

    import pandas as pd

    os.makedirs(path, exist_ok=True)
    for stale in os.listdir(path):
        if stale.endswith(".warc.gz"):
            os.remove(os.path.join(path, stale))

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        recs = []
        for pdf in batches:
            for rid, uri, payload in zip(pdf[id_col], pdf[uri_col],
                                         pdf[payload_col]):
                if isinstance(payload, str):
                    payload = payload.encode("utf-8")
                recs.append((int(rid), str(uri), bytes(payload)))
        if recs:
            pid = TaskContext.get().partitionId()
            final = os.path.join(path, f"part-{pid:05d}.warc.gz")
            tmp = final + f".tmp-{TaskContext.get().taskAttemptId()}"
            with open(tmp, "wb") as f:
                f.write(write_warc_gz_bytes(recs))
            os.replace(tmp, final)
        yield pd.DataFrame({"files": [1 if recs else 0]})

    df.select(id_col, uri_col, payload_col) \
      .mapInPandas(enc, "files int").agg({"files": "sum"}).collect()


def read_warc(spark, path: str):
    """``.warc.gz`` directory → DataFrame (record_id string,
    target_uri, content_length, payload string) — one Arrow-batched
    parse pass per partition of files; malformed FILES raise (a
    corrupt segment should fail loudly, like the mixed-writer-schema
    Avro rule).

    record_id is the WARC-Record-ID with the ``<urn:uuid:...>``
    wrapper stripped but otherwise verbatim — a spec-conformant
    foreign WARC's real UUID ids survive, not just this writer's
    integer ids.  Payloads decode with ``errors="replace"`` so a
    binary (non-UTF-8) response record yields U+FFFD runs instead of
    failing the whole segment."""
    import pandas as pd

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"record_id": [], "target_uri": [],
                    "content_length": [], "payload": []}
            for blob in pdf["content"]:
                for headers, payload in iter_warc_records(bytes(blob)):
                    rid = headers.get("warc-record-id", "")
                    rid = rid.split("urn:uuid:")[-1].rstrip(">").lstrip("<")
                    rows["record_id"].append(rid)
                    rows["target_uri"].append(
                        headers.get("warc-target-uri", ""))
                    rows["content_length"].append(
                        int(headers["content-length"]))
                    rows["payload"].append(
                        payload.decode("utf-8", errors="replace"))
            yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(
        decode, "record_id string, target_uri string, "
                "content_length long, payload string")
