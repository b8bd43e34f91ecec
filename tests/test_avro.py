"""Avro codec + Spark surface tests (sources/avro.py).

Three correctness anchors, strongest first:
1. byte-pinned fixtures straight from the Avro spec's varint examples —
   guards against a self-consistent-but-wrong codec;
2. a cross-check against the REAL org.apache.avro JVM implementation
   (avro-1.12.1.jar ships inside pyspark's jars even though the
   spark-avro DATASOURCE does not) — our encoder's bytes must decode
   identically under the reference implementation and vice versa;
3. encode→decode roundtrip properties over every supported type, both
   OCF codecs, plus the Spark-side read/write/unbox surfaces.
"""

import io
import random

import pytest

from aws_etl_bank_spark.sources.avro import (
    _write_varlong, avro_schema_to_spark, decode_datum, encode_datum,
    from_avro_datum, read_avro, read_ocf_bytes, to_avro_datum, write_avro,
    write_ocf_bytes,
)

RECORD = {"type": "record", "name": "r", "fields": [
    {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}


def test_varint_zigzag_spec_examples():
    """The Avro spec's own encoding table: 0→00, -1→01, 1→02, -2→03,
    2→04, 64→80 01, -65→81 01."""
    for v, want in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                    (-2, b"\x03"), (2, b"\x04"), (64, b"\x80\x01"),
                    (-65, b"\x81\x01"),
                    (2 ** 62, b"\x80\x80\x80\x80\x80\x80\x80\x80\x80\x01")]:
        out = bytearray()
        _write_varlong(out, v)
        assert bytes(out) == want, (v, bytes(out))


def test_datum_pinned_bytes():
    out = bytearray()
    encode_datum(out, {"a": 3, "b": "hi"}, RECORD)
    assert bytes(out) == b"\x06\x04hi"
    assert decode_datum(io.BytesIO(b"\x06\x04hi"), RECORD) == \
        {"a": 3, "b": "hi"}


FULL = {"type": "record", "name": "t", "fields": [
    {"name": "i", "type": "int"},
    {"name": "l", "type": ["null", "long"]},
    {"name": "d", "type": "double"},
    {"name": "s", "type": ["null", "string"]},
    {"name": "x", "type": "bytes"},
    {"name": "bl", "type": "boolean"},
    {"name": "arr", "type": {"type": "array", "items": "long"}},
    {"name": "m", "type": {"type": "map", "values": "string"}},
    {"name": "e", "type": {"type": "enum", "name": "E",
                           "symbols": ["A", "B", "C"]}},
    {"name": "fx", "type": {"type": "fixed", "name": "F4", "size": 4}}]}


def _gen_records(n, seed=3):
    random.seed(seed)
    recs = []
    for i in range(n):
        recs.append({
            "i": random.randint(-2 ** 31, 2 ** 31 - 1),
            "l": None if i % 7 == 0 else random.randint(-2 ** 62, 2 ** 62),
            "d": random.random() * 1e6,
            "s": None if i % 5 == 0 else "u\U0001F600" + str(i),
            "x": bytes([i % 256, (i * 7) % 256]),
            "bl": i % 2 == 0,
            "arr": [i, -i, 0],
            "m": {"k" + str(i): "v", "z": ""},
            "e": ["A", "B", "C"][i % 3],
            "fx": b"abcd"})
    return recs


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip_all_types(codec):
    recs = _gen_records(300)
    blob = write_ocf_bytes(recs, FULL, codec=codec)
    schema, got = read_ocf_bytes(blob)
    assert schema == FULL
    assert got == recs


def test_ocf_rejects_garbage_and_bad_codec():
    with pytest.raises(ValueError, match="magic"):
        read_ocf_bytes(b"PAR1not-avro")
    with pytest.raises(ValueError, match="codec"):
        write_ocf_bytes([], FULL, codec="snappy")


def test_cross_check_against_jvm_avro(spark):
    """Encode with OUR codec, decode with org.apache.avro (the reference
    implementation, on Spark's classpath) — and the reverse — over the
    simple record shape py4j can drive without helper classes."""
    jvm = spark.sparkContext._jvm
    import json as _json
    schema_json = _json.dumps(RECORD)
    parser = jvm.org.apache.avro.Schema.Parser()
    jschema = parser.parse(schema_json)

    # ours -> JVM decode
    ours = bytearray()
    encode_datum(ours, {"a": -7, "b": "graft"}, RECORD)
    reader = jvm.org.apache.avro.generic.GenericDatumReader(jschema)
    dec = jvm.org.apache.avro.io.DecoderFactory.get() \
        .binaryDecoder(bytes(ours), None)
    jrec = reader.read(None, dec)
    assert jrec.get("a") == -7
    assert str(jrec.get("b")) == "graft"

    # JVM encode -> ours
    grec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
    grec.put("a", 12345678901234)
    grec.put("b", "jvm-side")
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    baos = jvm.java.io.ByteArrayOutputStream()
    enc = jvm.org.apache.avro.io.EncoderFactory.get() \
        .binaryEncoder(baos, None)
    writer.write(grec, enc)
    enc.flush()
    got = decode_datum(io.BytesIO(bytes(baos.toByteArray())), RECORD)
    assert got == {"a": 12345678901234, "b": "jvm-side"}


def test_avro_schema_to_spark_mapping():
    t = avro_schema_to_spark(FULL)
    assert t.simpleString() == (
        "struct<i:int,l:bigint,d:double,s:string,x:binary,bl:boolean,"
        "arr:array<bigint>,m:map<string,string>,e:string,fx:binary>")
    assert [f.nullable for f in t.fields][:4] == [False, True, False, True]


def test_spark_read_write_avro_roundtrip(spark, tmp_path):
    df = spark.range(200).selectExpr(
        "id", "cast(id as int) AS i", "cast(id * 1.5 as double) AS d",
        "concat('s', id) AS s",
        "CASE WHEN id % 3 = 0 THEN NULL ELSE concat('n', id) END AS n")
    path = str(tmp_path / "ocf")
    write_avro(df.repartition(4), path, codec="deflate")
    back = read_avro(spark, path)
    assert back.schema.simpleString() == \
        "struct<id:bigint,i:int,d:double,s:string,n:string>"
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, df.collect()))


def test_from_to_avro_datum_and_unbox(spark):
    from aws_etl_bank_spark.operators.dynamicframe import DynamicFrame
    import json as _json

    schema_json = _json.dumps(RECORD)
    src = spark.range(50).selectExpr("id AS a", "concat('v', id) AS b")
    enc = to_avro_datum(src, ["a", "b"], schema_json, out_col="payload")
    dec = from_avro_datum(enc.select("payload"), "payload", schema_json,
                          out_col="rec")
    got = dec.selectExpr("rec.a AS a", "rec.b AS b")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, src.collect()))

    # the Glue surface: unbox(format="avro") must hit the fallback
    # decoder (no spark-avro jar here) and produce the same struct
    dyf = DynamicFrame.fromDF(enc.select("payload"), None, "t")
    un = dyf.unbox("payload", "avro", schema=schema_json)
    got2 = un.toDF().selectExpr("payload.a AS a", "payload.b AS b")
    assert sorted(map(tuple, got2.collect())) == \
        sorted(map(tuple, src.collect()))

    # malformed rows decode to NULL, never raise
    import pyspark.sql.functions as F
    bad = enc.select("payload").union(
        spark.createDataFrame([(bytearray(b"\xff"),)], "payload binary"))
    dec_bad = from_avro_datum(bad, "payload", schema_json, out_col="rec")
    assert dec_bad.filter(F.col("rec").isNull()).count() == 1
