"""WARC container (sources/warc.py): spec framing, gzip member walk,
Spark roundtrip, loud failure on corruption."""

import gzip

import pytest

from aws_etl_bank_spark.sources.warc import (iter_warc_records,
                                             write_warc_gz_bytes)


def test_warc_members_and_framing():
    """Per-record gzip members; Content-Length framing means payloads
    may contain CRLFCRLF and any binary-ish text."""
    tricky = "line1\r\n\r\nWARC/1.0 fake header inside payload\r\n"
    recs = [(1, "https://a/1", b"hello"),
            (2, "https://a/2", tricky.encode()),
            (3, "https://a/3", b"")]
    data = write_warc_gz_bytes(recs)
    # three independent gzip members: each starts with the gzip magic
    assert data[:2] == b"\x1f\x8b"
    got = list(iter_warc_records(data))
    assert [(int(h["warc-record-id"].split("urn:uuid:")[-1].rstrip(">")),
             h["warc-target-uri"], p) for h, p in got] == \
        [(1, "https://a/1", b"hello"), (2, "https://a/2", tricky.encode()),
         (3, "https://a/3", b"")]
    # a single member decompresses alone (the range-fetch property)
    first_len = len(data)
    one = write_warc_gz_bytes(recs[:1])
    assert gzip.decompress(one).startswith(b"WARC/1.0\r\n")
    assert first_len > len(one)


def test_warc_rejects_corruption():
    recs = [(7, "https://a/7", b"payload")]
    data = bytearray(write_warc_gz_bytes(recs))
    with pytest.raises(Exception):
        # cut into the DEFLATE stream itself (trailer-only truncation
        # is tolerated: the record is framed by Content-Length)
        list(iter_warc_records(bytes(data[:len(data) // 2])))
    with pytest.raises(Exception):
        list(iter_warc_records(b"not a warc at all"))
    # header mangled inside a VALID gzip member
    raw = bytearray(gzip.decompress(bytes(data)))
    raw[0:5] = b"XARC/"
    with pytest.raises(ValueError, match="malformed"):
        list(iter_warc_records(gzip.compress(bytes(raw))))


def test_warc_spark_roundtrip(spark, tmp_path):
    import pyspark.sql.functions as F

    from aws_etl_bank_spark.sources.warc import read_warc, write_warc

    df = spark.range(25).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://x/"), F.col("id").cast("string"))
        .alias("uri"),
        F.concat(F.lit("text payload #"), F.col("id").cast("string"),
                 F.lit("\r\n\r\ntail")).alias("text"))
    path = str(tmp_path / "warc")
    write_warc(df.repartition(3), path, "doc_id", "uri", "text")
    back = read_warc(spark, path)
    exp = sorted((str(r["doc_id"]), r["uri"], r["text"])
                 for r in df.collect())
    got = sorted((r["record_id"], r["target_uri"], r["payload"])
                 for r in back.collect())
    assert got == exp
    lens = {r["record_id"]: r["content_length"] for r in back.collect()}
    assert lens["3"] == len(f"text payload #3\r\n\r\ntail".encode())
    spark.catalog.clearCache()
