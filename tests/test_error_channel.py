"""Error-record channel tests (SURVEY.md §2.10).

Reference policy (awsglue/dynamicframe.py:80-124):
- Filter: KeyError/ValueError/TypeError in the predicate → row silently
  dropped; any other exception → row KEPT and marked as an error record.
- Map: None return or any exception → row becomes an error record.
- Thresholds raise at action time.
"""

import pytest

from aws_etl_bank_spark.operators.dynamicframe import DynamicFrame


@pytest.fixture()
def frame(spark):
    df = spark.createDataFrame(
        [(1, "10"), (2, "twenty"), (3, "30"), (4, None)], "id long, v string"
    )
    return DynamicFrame.fromDF(df, name="f")


def test_filter_value_error_silently_drops(frame):
    out = frame.filter(lambda r: int(r["v"]) > 5)  # 'twenty'/None → ValueError/TypeError
    assert sorted(r["id"] for r in out.toDF().collect()) == [1, 3]
    assert out.errorsCount() == 0


def test_filter_other_exception_keeps_and_marks(frame):
    def pred(r):
        if r["id"] == 2:
            raise RuntimeError("boom")
        return True

    out = frame.filter(pred)
    assert out.count() == 4  # row kept
    assert out.errorsCount() == 1
    err = out.errorsAsDynamicFrame().toDF().collect()[0]
    assert "RuntimeError" in err["error"]


def test_map_none_and_exception_become_error_records(frame):
    def f(rec):
        if rec["id"] == 4:
            return None
        rec["n"] = int(rec["v"])
        return rec

    out = frame.map(f)
    assert out.count() == 2  # ids 1, 3
    assert out.errorsCount() == 2
    assert out.stageErrorsCount() == 2


def test_error_threshold_raises(frame):
    def f(rec):
        raise RuntimeError("always")

    with pytest.raises(RuntimeError, match="threshold"):
        frame.map(f, totalThreshold=1)


def test_errors_accumulate_across_stages(frame):
    def bad_two(rec):
        if rec["id"] == 2:
            return None
        return rec

    def bad_three(rec):
        if rec["id"] == 3:
            return None
        return rec

    out = frame.map(bad_two).map(bad_three)
    assert out.errorsCount() == 2      # both stages
    assert out.stageErrorsCount() == 1  # last stage only


def test_map_with_declared_schema_skips_inference(frame):
    import pyspark.sql.types as T

    schema = T.StructType([T.StructField("id2", T.LongType())])
    out = frame.map(lambda r: {"id2": r["id"] * 2}, schema=schema)
    assert sorted(r["id2"] for r in out.toDF().collect()) == [2, 4, 6, 8]
