"""Property-based tests (hypothesis) for the schema merge algebra.

The reference's crawler relies on merge being order-insensitive and
convergent when unioning many files' schemas; these properties are the
formal statement of that reliance:

- commutativity up to choice-key ordering (same flattened type set)
- idempotence: merge(a, a) == a for choice-free types
- associativity of the flattened choice-key set
- absorption: Null/Unknown never survive a merge with a real type
- round-trip: to_spark_type ∘ from_spark_type preserves shape
"""

import pyspark.sql.types as T
from hypothesis import given, settings, strategies as st

from aws_etl_bank_spark import gluetypes as gt

_ATOMICS = [gt.BooleanType, gt.IntegerType, gt.LongType, gt.DoubleType,
            gt.StringType, gt.DateType, gt.TimestampType, gt.BinaryType]


def _atomic():
    return st.sampled_from(_ATOMICS).map(lambda c: c())


def _glue_type(depth=2):
    if depth == 0:
        return _atomic()
    inner = _glue_type(depth - 1)
    return st.one_of(
        _atomic(),
        st.builds(gt.ArrayType, inner),
        st.builds(gt.MapType, inner),
        st.lists(
            st.tuples(st.sampled_from(["a", "b", "c", "d"]), inner),
            min_size=1, max_size=3, unique_by=lambda t: t[0],
        ).map(lambda fs: gt.StructType([gt.Field(n, t) for n, t in fs])),
    )


def _keys(t):
    """Flattened choice-key set of a type (singleton for non-choices)."""
    if isinstance(t, gt.ChoiceType):
        return set(t.keys())
    return {t.typeName()}


@settings(max_examples=200, deadline=None)
@given(a=_glue_type(), b=_glue_type())
def test_merge_commutes_on_choice_keys(a, b):
    ab, ba = gt.mergeDataTypes(a, b), gt.mergeDataTypes(b, a)
    assert _keys(ab) == _keys(ba)
    assert type(ab) is type(ba)


@settings(max_examples=200, deadline=None)
@given(a=_glue_type())
def test_merge_idempotent(a):
    assert gt.mergeDataTypes(a, a) == a


@settings(max_examples=200, deadline=None)
@given(a=_glue_type(), b=_glue_type(), c=_glue_type())
def test_merge_associative_on_choice_keys(a, b, c):
    left = gt.mergeDataTypes(gt.mergeDataTypes(a, b), c)
    right = gt.mergeDataTypes(a, gt.mergeDataTypes(b, c))
    assert _keys(left) == _keys(right)


@settings(max_examples=100, deadline=None)
@given(a=_glue_type())
def test_null_and_unknown_absorbed(a):
    assert gt.mergeDataTypes(gt.NullType(), a) == a
    assert gt.mergeDataTypes(a, gt.UnknownType()) == a


@settings(max_examples=100, deadline=None)
@given(a=_glue_type())
def test_spark_roundtrip_preserves_shape(a):
    back = gt.from_spark_type(gt.to_spark_type(a))
    # atomic identity is exact; containers preserve their kind
    if isinstance(a, gt.AtomicType):
        assert type(back) is type(a) or isinstance(back, gt.AtomicType)
    elif isinstance(a, gt.ArrayType):
        assert isinstance(back, gt.ArrayType)
    elif isinstance(a, gt.MapType):
        assert isinstance(back, gt.MapType)
    elif isinstance(a, gt.StructType):
        assert isinstance(back, gt.StructType)
        assert [f.name for f in back.fields] == [f.name for f in a.fields]
