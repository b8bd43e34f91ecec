"""Self-describing (Glue-style) type system with a schema-merge algebra.

The reference's defining data-model feature is a *dynamic* schema: records
with inconsistent types fuse into a ``ChoiceType`` instead of failing
(reference awsglue/gluetypes.py:341-432, mergeDataTypes at 395-432;
SURVEY.md §1.2).  Spark has no union type, so this module also defines the
**choice-struct encoding**: a ``ChoiceType([t1, t2])`` column is carried in
a DataFrame as ``struct<typeName(t1): t1, typeName(t2): t2>`` with exactly
one non-null field per row — resolved later by
``DynamicFrame.resolveChoice`` (SURVEY.md §2.9).

This is an independent re-implementation of the *semantics* recorded in
SURVEY.md §1.2; no reference code is copied.
"""

from __future__ import annotations

from typing import Iterable

import pyspark.sql.types as T


class DataType:
    """Base class. Every type carries a free-form ``properties`` dict."""

    def __init__(self, properties: dict | None = None):
        self.properties = properties or {}

    @classmethod
    def typeName(cls) -> str:
        name = cls.__name__
        if name.endswith("Type"):
            name = name[: -len("Type")]
        return name.lower()

    def jsonValue(self):
        return {"dataType": self.typeName(), "properties": self.properties}

    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self):
        return hash(type(self).__name__)

    def __repr__(self):
        return f"{type(self).__name__}()"


class AtomicType(DataType):
    pass


class BinaryType(AtomicType):
    pass


class BooleanType(AtomicType):
    pass


class ByteType(AtomicType):
    pass


class DateType(AtomicType):
    pass


class DecimalType(AtomicType):
    def __init__(self, precision: int = 10, scale: int = 2, properties=None):
        super().__init__(properties)
        self.precision = precision
        self.scale = scale

    def __repr__(self):
        return f"DecimalType({self.precision},{self.scale})"


class DoubleType(AtomicType):
    pass


class EnumType(AtomicType):
    """String type restricted to a set of options (no Spark analog —
    lowered to StringType; validation is a filter discipline)."""

    def __init__(self, options: Iterable[str] = (), properties=None):
        super().__init__(properties)
        self.options = list(options)

    def jsonValue(self):
        # NOTE: the reference's EnumType.jsonValue returns None (a bug,
        # SURVEY.md §8.7); we serialize properly instead.
        return {"dataType": "enum", "options": self.options, "properties": self.properties}


class FloatType(AtomicType):
    pass


class IntegerType(AtomicType):
    @classmethod
    def typeName(cls):
        return "int"


class LongType(AtomicType):
    pass


class NullType(AtomicType):
    pass


class ShortType(AtomicType):
    pass


class StringType(AtomicType):
    pass


class TimestampType(AtomicType):
    pass


class UnknownType(AtomicType):
    pass


class ArrayType(DataType):
    def __init__(self, elementType: DataType = None, properties=None):
        super().__init__(properties)
        self.elementType = elementType or UnknownType()

    def __repr__(self):
        return f"ArrayType({self.elementType!r})"


class SetType(ArrayType):
    """Array with set discipline (dedup on write); Spark carries it as an
    array + ``array_distinct``."""


class MapType(DataType):
    """String-keyed map; only the value type is parameterized
    (reference gluetypes.py:233-250)."""

    def __init__(self, valueType: DataType = None, properties=None):
        super().__init__(properties)
        self.valueType = valueType or UnknownType()

    def __repr__(self):
        return f"MapType({self.valueType!r})"


class Field:
    def __init__(self, name: str, dataType: DataType, properties: dict | None = None):
        self.name = name
        self.dataType = dataType
        self.properties = properties or {}

    def __eq__(self, other):
        return (
            isinstance(other, Field)
            and self.name == other.name
            and self.dataType == other.dataType
        )

    def __repr__(self):
        return f"Field({self.name!r}, {self.dataType!r})"


class StructType(DataType):
    def __init__(self, fields: list[Field] | None = None, properties=None):
        super().__init__(properties)
        self.fields = list(fields or [])

    def field_map(self) -> dict[str, Field]:
        return {f.name: f for f in self.fields}

    def add(self, field: Field) -> "StructType":
        self.fields.append(field)
        return self

    def hasField(self, name: str) -> bool:
        return any(f.name == name for f in self.fields)

    def getField(self, name: str) -> Field:
        return self.field_map()[name]

    def __repr__(self):
        return f"StructType({self.fields!r})"


class ChoiceType(DataType):
    """Union of incompatible types observed for the same path.  Keyed by
    typeName so merging is idempotent and associative."""

    def __init__(self, choices: Iterable[DataType] = (), properties=None):
        super().__init__(properties)
        self.choices: dict[str, DataType] = {}
        for c in choices:
            self.add(c)

    def add(self, new_choice: DataType):
        key = new_choice.typeName()
        if key in self.choices:
            self.choices[key] = mergeDataTypes(self.choices[key], new_choice)
        else:
            self.choices[key] = new_choice

    def merge(self, new_choices):
        if isinstance(new_choices, ChoiceType):
            new_choices = list(new_choices.choices.values())
        elif isinstance(new_choices, DataType):
            new_choices = [new_choices]
        for c in new_choices:
            self.add(c)
        return self

    def keys(self):
        return sorted(self.choices.keys())

    def __eq__(self, other):
        return isinstance(other, ChoiceType) and self.choices == other.choices

    def __repr__(self):
        return f"ChoiceType({sorted(self.choices.items())!r})"


class EntityType(DataType):
    def __init__(self, entity, base_type, properties=None):
        raise NotImplementedError("EntityType is declared but unimplemented in the reference")


# ---------------------------------------------------------------------------
# Merge algebra (semantics of reference gluetypes.py:370-432)
# ---------------------------------------------------------------------------


def _make_choice(a: DataType, b: DataType) -> DataType:
    if isinstance(a, ChoiceType):
        return ChoiceType(list(a.choices.values())).merge(b)
    if isinstance(b, ChoiceType):
        return ChoiceType(list(b.choices.values())).merge(a)
    if a == b:
        return a
    return ChoiceType([a, b])


def mergeDataTypes(a: DataType, b: DataType) -> DataType:
    """Fuse two observed types for the same path.

    Rules (SURVEY.md §1.2): Unknown/Null yield to the other side;
    structs merge field-wise with union-of-fields; arrays/maps merge
    element/value types; enums concatenate options; anything else that
    mismatches fuses into a ChoiceType.
    """
    if isinstance(a, (UnknownType, NullType)) and not isinstance(b, (UnknownType, NullType)):
        return b
    if isinstance(b, (UnknownType, NullType)):
        return a
    if type(a) is type(b):
        if isinstance(a, StructType):
            merged = StructType([], dict(a.properties))
            bmap = b.field_map()
            seen = set()
            for f in a.fields:
                seen.add(f.name)
                if f.name in bmap:
                    merged.add(Field(f.name, mergeDataTypes(f.dataType, bmap[f.name].dataType), f.properties))
                else:
                    merged.add(f)
            for f in b.fields:
                if f.name not in seen:
                    merged.add(f)
            return merged
        if isinstance(a, SetType):
            return SetType(mergeDataTypes(a.elementType, b.elementType))
        if isinstance(a, ArrayType):
            return ArrayType(mergeDataTypes(a.elementType, b.elementType))
        if isinstance(a, MapType):
            return MapType(mergeDataTypes(a.valueType, b.valueType))
        if isinstance(a, EnumType):
            return EnumType(sorted(set(a.options) | set(b.options)))
        if isinstance(a, DecimalType):
            if (a.precision, a.scale) == (b.precision, b.scale):
                return a
            return DecimalType(max(a.precision, b.precision), max(a.scale, b.scale))
        return a  # identical atomic types
    return _make_choice(a, b)


# ---------------------------------------------------------------------------
# Spark <-> glue type bridge
# ---------------------------------------------------------------------------

_ATOMIC_TO_SPARK = {
    BinaryType: T.BinaryType,
    BooleanType: T.BooleanType,
    ByteType: T.ByteType,
    DateType: T.DateType,
    DoubleType: T.DoubleType,
    FloatType: T.FloatType,
    IntegerType: T.IntegerType,
    LongType: T.LongType,
    NullType: T.NullType,
    ShortType: T.ShortType,
    StringType: T.StringType,
    TimestampType: T.TimestampType,
    UnknownType: T.NullType,
}

_SPARK_TO_ATOMIC = {
    T.BinaryType: BinaryType,
    T.BooleanType: BooleanType,
    T.ByteType: ByteType,
    T.DateType: DateType,
    T.DoubleType: DoubleType,
    T.FloatType: FloatType,
    T.IntegerType: IntegerType,
    T.LongType: LongType,
    T.NullType: NullType,
    T.ShortType: ShortType,
    T.StringType: StringType,
    T.TimestampType: TimestampType,
    T.TimestampNTZType: TimestampType,
}

#: Metadata key marking a Spark struct column as a choice-struct encoding.
CHOICE_METADATA_KEY = "aws_etl_bank_spark.choice"


def to_spark_type(t: DataType) -> T.DataType:
    if isinstance(t, ChoiceType):
        return T.StructType(
            [T.StructField(k, to_spark_type(v), True) for k, v in sorted(t.choices.items())]
        )
    if isinstance(t, DecimalType):
        return T.DecimalType(t.precision, t.scale)
    if isinstance(t, EnumType):
        return T.StringType()
    if isinstance(t, (SetType, ArrayType)):
        return T.ArrayType(to_spark_type(t.elementType), True)
    if isinstance(t, MapType):
        return T.MapType(T.StringType(), to_spark_type(t.valueType), True)
    if isinstance(t, StructType):
        return T.StructType(
            [T.StructField(f.name, to_spark_type(f.dataType), True) for f in t.fields]
        )
    cls = _ATOMIC_TO_SPARK.get(type(t))
    if cls is None:
        raise TypeError(f"no Spark mapping for {t!r}")
    return cls()


def from_spark_type(t: T.DataType) -> DataType:
    if isinstance(t, T.DecimalType):
        return DecimalType(t.precision, t.scale)
    if isinstance(t, T.ArrayType):
        return ArrayType(from_spark_type(t.elementType))
    if isinstance(t, T.MapType):
        return MapType(from_spark_type(t.valueType))
    if isinstance(t, T.StructType):
        return StructType([Field(f.name, from_spark_type(f.dataType)) for f in t.fields])
    cls = _SPARK_TO_ATOMIC.get(type(t))
    if cls is None:
        raise TypeError(f"no glue mapping for {t!r}")
    return cls()


#: Name → glue type constructor, for ``resolveChoice("cast:<type>")`` specs.
TYPE_BY_NAME = {
    cls.typeName(): cls
    for cls in (
        BinaryType,
        BooleanType,
        ByteType,
        DateType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        NullType,
        ShortType,
        StringType,
        TimestampType,
        UnknownType,
    )
}
TYPE_BY_NAME["decimal"] = DecimalType
