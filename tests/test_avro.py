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


def test_write_avro_array_columns(spark, tmp_path):
    """Nested (array) columns survive the OCF write path: Arrow hands
    them to mapInPandas as numpy ndarrays, which used to trip both the
    pd.isna scalar check and _pyify's .item() (r9 ADVICE)."""
    df = spark.range(40).selectExpr(
        "id", "array(id, id + 1, id + 2) AS xs",
        "transform(sequence(1, cast(id % 3 as int)), x -> concat('t', x)) AS ts")
    path = str(tmp_path / "ocf_arrays")
    write_avro(df.repartition(3), path, codec="deflate")
    back = read_avro(spark, path)
    exp = sorted((r["id"], tuple(r["xs"]), tuple(r["ts"]))
                 for r in df.collect())
    got = sorted((r["id"], tuple(r["xs"]), tuple(r["ts"]))
                 for r in back.collect())
    assert got == exp


def test_avro_nan_semantics_by_union(spark, tmp_path):
    """NaN handling is schema-directed (r10 ADVICE): in a NULL-UNION
    double field a pandas-NaN means SQL NULL and encodes as the null
    branch, but in a NON-null double field NaN is a genuine
    representable Avro value and must encode as NaN, not silently
    become null.  The encoded BYTES are checked driver-side with
    decode_datum / read_ocf_bytes, and the SPARK read paths (now
    mapInArrow, r11) must surface the stored NaN as NaN — the old
    mapInPandas decode masked it to NULL at the from_pandas
    boundary."""
    import io
    import json as _json
    import math
    import os

    from aws_etl_bank_spark.sources.avro import (decode_datum,
                                                 read_ocf_bytes)

    sch = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"},
        {"name": "plain", "type": "double"},
        {"name": "opt", "type": ["null", "double"]}]}
    df = spark.createDataFrame(
        [(1, float("nan"), None), (2, 2.5, float("nan"))],
        "k long, plain double, opt double")

    # datum path: decode the blobs driver-side (no Arrow boundary)
    enc = to_avro_datum(df, ["k", "plain", "opt"], _json.dumps(sch))
    got = {}
    for r in enc.select("avro").collect():
        rec = decode_datum(io.BytesIO(bytes(r["avro"])), sch)
        got[rec["k"]] = (rec["plain"], rec["opt"])
    assert math.isnan(got[1][0]) and got[1][1] is None
    # row 2's opt arrives as NaN through Arrow; null-union -> null
    assert got[2] == (2.5, None)

    # OCF write path: parse the file bytes driver-side
    path = str(tmp_path / "ocf_nan")
    write_avro(df, path, schema=sch)
    recs = []
    for part in sorted(os.listdir(path)):
        with open(os.path.join(path, part), "rb") as f:
            recs.extend(read_ocf_bytes(f.read())[1])
    back = {rec["k"]: (rec["plain"], rec["opt"]) for rec in recs}
    assert math.isnan(back[1][0]) and back[1][1] is None
    assert back[2] == (2.5, None)

    # Spark read paths (mapInArrow): NaN survives to the DataFrame
    got_rd = {r["k"]: (r["plain"], r["opt"])
              for r in read_avro(spark, path).collect()}
    assert math.isnan(got_rd[1][0]) and got_rd[1][1] is None
    assert got_rd[2] == (2.5, None)
    dec = from_avro_datum(enc.select("avro"), "avro", _json.dumps(sch),
                          out_col="rec")
    got_dm = {r["rec"]["k"]: (r["rec"]["plain"], r["rec"]["opt"])
              for r in dec.collect()}
    assert math.isnan(got_dm[1][0]) and got_dm[1][1] is None
    assert got_dm[2] == (2.5, None)


def test_read_avro_rejects_mixed_writer_schemas(spark, tmp_path):
    """A directory whose files carry different embedded writer schemas
    must fail loudly (r9 ADVICE) — silent NaN-fill is how column drift
    corrupts a lake."""
    import os

    path = str(tmp_path / "mixed")
    os.makedirs(path)
    s1 = {"type": "record", "name": "r",
          "fields": [{"name": "a", "type": "long"}]}
    s2 = {"type": "record", "name": "r",
          "fields": [{"name": "b", "type": "string"}]}
    with open(os.path.join(path, "p1.avro"), "wb") as f:
        f.write(write_ocf_bytes([{"a": 1}], s1))
    with open(os.path.join(path, "p2.avro"), "wb") as f:
        f.write(write_ocf_bytes([{"b": "x"}], s2))
    with pytest.raises(Exception, match="mixed writer schemas"):
        read_avro(spark, path).collect()


def test_avro_logical_casts(spark):
    """timestamp-micros / timestamp-millis / date logicalTypes decode
    to TIMESTAMP/DATE via JVM expressions after the primitive codec
    pass; unannotated fields pass through untouched."""
    import datetime as dt
    import json as _json

    from aws_etl_bank_spark.sources.avro import avro_logical_casts

    schema_d = {"type": "record", "name": "ev", "fields": [
        {"name": "k", "type": "long"},
        {"name": "us", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "ms", "type": ["null", {"type": "long",
                                         "logicalType": "timestamp-millis"}]},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}}]}
    src = spark.createDataFrame(
        [(1, 1_700_000_000_000_000, 1_700_000_000_123, 19000),
         (2, 0, None, 0)],
        "k long, us long, ms long, d int")
    enc = to_avro_datum(src, ["k", "us", "ms", "d"],
                        _json.dumps(schema_d), out_col="p")
    dec = from_avro_datum(enc.select("p"), "p", _json.dumps(schema_d),
                          out_col="rec")
    got = avro_logical_casts(dec.select("rec.k", "rec.us", "rec.ms",
                                        "rec.d"), schema_d)
    assert [f.dataType.simpleString() for f in got.schema.fields] == \
        ["bigint", "timestamp", "timestamp", "date"]
    rows = {r["k"]: r for r in got.collect()}
    assert rows[2]["us"] == dt.datetime(1970, 1, 1)
    assert rows[2]["ms"] is None
    assert rows[2]["d"] == dt.date(1970, 1, 1)
    assert rows[1]["d"] == dt.date(1970, 1, 1) + dt.timedelta(days=19000)
    assert rows[1]["us"].microsecond == 0
    assert rows[1]["ms"].microsecond == 123000


def test_unbox_avro_fallback_preserves_column_order(spark):
    """The jar-less unbox path must keep the unboxed column in its
    ORIGINAL position, like the JVM withColumn path (r9 ADVICE)."""
    import json as _json

    from aws_etl_bank_spark.operators.dynamicframe import DynamicFrame

    schema_json = _json.dumps(RECORD)
    src = spark.range(10).selectExpr("id AS a", "concat('v', id) AS b")
    enc = to_avro_datum(src, ["a", "b"], schema_json, out_col="payload")
    framed = enc.selectExpr("a AS before", "payload", "b AS after")
    un = DynamicFrame.fromDF(framed, None, "t").unbox(
        "payload", "avro", schema=schema_json)
    assert un.toDF().columns == ["before", "payload", "after"]
