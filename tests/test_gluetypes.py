"""Merge-algebra unit tests (pure Python — no Spark session needed).

Semantics per SURVEY.md §1.2 (reference awsglue/gluetypes.py:370-432):
Unknown/Null yield, mismatches fuse into ChoiceType, structs merge
field-wise, arrays/maps merge element/value types, enums concatenate.
"""

import pyspark.sql.types as T

from aws_etl_bank_spark import gluetypes as gt


def test_null_yields_to_other_side():
    assert gt.mergeDataTypes(gt.NullType(), gt.LongType()) == gt.LongType()
    assert gt.mergeDataTypes(gt.LongType(), gt.UnknownType()) == gt.LongType()


def test_identical_atomics_stay():
    assert gt.mergeDataTypes(gt.StringType(), gt.StringType()) == gt.StringType()


def test_mismatch_fuses_into_choice():
    merged = gt.mergeDataTypes(gt.IntegerType(), gt.StringType())
    assert isinstance(merged, gt.ChoiceType)
    assert merged.keys() == ["int", "string"]


def test_choice_merge_is_idempotent_and_associative():
    a = gt.mergeDataTypes(gt.IntegerType(), gt.StringType())
    b = gt.mergeDataTypes(a, gt.IntegerType())
    assert b.keys() == ["int", "string"]
    c = gt.mergeDataTypes(gt.StringType(), gt.mergeDataTypes(gt.IntegerType(), gt.DoubleType()))
    d = gt.mergeDataTypes(gt.mergeDataTypes(gt.StringType(), gt.IntegerType()), gt.DoubleType())
    assert c == d


def test_struct_merge_unions_fields():
    a = gt.StructType([gt.Field("x", gt.LongType()), gt.Field("y", gt.StringType())])
    b = gt.StructType([gt.Field("y", gt.IntegerType()), gt.Field("z", gt.DateType())])
    merged = gt.mergeDataTypes(a, b)
    names = [f.name for f in merged.fields]
    assert names == ["x", "y", "z"]
    assert isinstance(merged.getField("y").dataType, gt.ChoiceType)


def test_array_and_map_merge_inner_types():
    arr = gt.mergeDataTypes(gt.ArrayType(gt.IntegerType()), gt.ArrayType(gt.StringType()))
    assert isinstance(arr, gt.ArrayType) and isinstance(arr.elementType, gt.ChoiceType)
    mp = gt.mergeDataTypes(gt.MapType(gt.NullType()), gt.MapType(gt.LongType()))
    assert isinstance(mp, gt.MapType) and mp.valueType == gt.LongType()


def test_enum_options_concatenate():
    merged = gt.mergeDataTypes(gt.EnumType(["a", "b"]), gt.EnumType(["b", "c"]))
    assert merged.options == ["a", "b", "c"]


def test_decimal_widens():
    merged = gt.mergeDataTypes(gt.DecimalType(10, 2), gt.DecimalType(12, 0))
    assert (merged.precision, merged.scale) == (12, 2)


def test_choice_struct_encoding_roundtrip():
    choice = gt.ChoiceType([gt.IntegerType(), gt.StringType()])
    spark_t = gt.to_spark_type(choice)
    assert isinstance(spark_t, T.StructType)
    assert spark_t.fieldNames() == ["int", "string"]


def test_spark_bridge_roundtrip():
    spark_struct = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.ArrayType(T.StringType())),
        T.StructField("c", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("d", T.StructType([T.StructField("e", T.DateType())])),
    ])
    glue = gt.from_spark_type(spark_struct)
    back = gt.to_spark_type(glue)
    assert [f.name for f in back.fields] == ["a", "b", "c", "d"]
    assert isinstance(back["b"].dataType, T.ArrayType)
    assert isinstance(back["c"].dataType, T.MapType)
