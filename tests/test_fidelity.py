"""Regression tests for the reference's fidelity quirks (SURVEY.md §8)."""

import pyspark.sql.functions as F
from pyspark.sql import Window


def test_all_strings_csv_implicit_cast(spark, scratch):
    """§8.3: CSV read with header but no inferSchema → every column is
    string; SUM over the string column must still work (ANSI off)."""
    path = f"{scratch}/csv_cast"
    spark.createDataFrame([("a", "1.5"), ("b", "2.5")], "k string, amount string") \
        .write.mode("overwrite").option("header", "true").csv(path)
    df = spark.read.option("header", "true").csv(path)
    assert dict(df.dtypes) == {"k": "string", "amount": "string"}
    total = df.agg(F.sum("amount").alias("s")).collect()[0]["s"]
    assert abs(total - 4.0) < 1e-9


def test_range_frame_peers_share_totals(spark):
    """§8.2: SQL-default RANGE frame — peer order-values share the running
    total, unlike ROWS."""
    df = spark.createDataFrame(
        [("c1", "2024-01-01", 10.0), ("c1", "2024-01-01", 20.0), ("c1", "2024-01-02", 5.0)],
        "cust string, d string, amt double",
    )
    w_range = Window.partitionBy("cust").orderBy("d")  # default frame = RANGE
    out = df.withColumn("run", F.sum("amt").over(w_range)).collect()
    runs = sorted((r["d"], r["run"]) for r in out)
    assert runs == [("2024-01-01", 30.0), ("2024-01-01", 30.0), ("2024-01-02", 35.0)]


def test_untyped_udf_returns_string(spark):
    """§8.5: pyspark ``udf(f)`` without a return type defaults to
    StringType — week_of_month is a *string* column in the reference."""
    from pyspark.sql.functions import udf

    week_of_month = udf(lambda d: (d.day - 1) // 7 + 1)
    df = spark.createDataFrame([("2024-01-15",)], "d string") \
        .withColumn("wom", week_of_month(F.to_date("d")))
    assert dict(df.dtypes)["wom"] == "string"
    assert df.collect()[0]["wom"] == "3"


def test_collect_set_sorted_for_determinism(spark):
    """§8.4: collect_list(distinct ...) is unordered — the engine emits
    sort_array(collect_set(...)) so results are comparable."""
    df = spark.createDataFrame(
        [("c1", "b"), ("c1", "a"), ("c1", "b")], "cust string, t string"
    )
    out = df.groupBy("cust").agg(F.sort_array(F.collect_set("t")).alias("ts")).collect()
    assert out[0]["ts"] == ["a", "b"]


def test_ansi_off_implicit_casts(spark):
    """Engine sessions must run ANSI-off (Spark 4 defaults it on) so the
    reference's string→numeric SQL casts behave Glue-like."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    row = spark.sql("select '12' + 3 as v").collect()[0]
    assert row["v"] == 15.0


def test_record_updated_time_is_date(spark):
    """§8.6: record_updated_time uses to_date(...) → DateType despite the
    timestamp-looking literal."""
    import datetime

    from aws_etl_bank_spark.functions.columns import add_scd2_columns

    df = add_scd2_columns(spark.range(1))
    assert dict(df.dtypes)["record_updated_time"] == "date"
    assert df.collect()[0]["record_updated_time"] == datetime.date(3000, 1, 1)


def test_udf_module_default_string_and_typed(spark):
    """The engine's own UDF surface keeps the Glue default-string quirk
    and offers typed + Arrow-batched forms."""
    import pyspark.sql.types as T

    from aws_etl_bank_spark.functions.udf import (
        pandas_scalar_udf, typed_udf, udf, week_of_month_udf)

    df = spark.createDataFrame([(3,), (10,)], "x int")
    untyped = udf(lambda x: x + 1)

    @typed_udf(T.LongType())
    def plus_two(x):
        return x + 2

    @pandas_scalar_udf(T.LongType())
    def plus_three(s):
        return s + 3

    out = df.select(
        untyped(F.col("x")).alias("a"),
        plus_two(F.col("x")).alias("b"),
        plus_three(F.col("x")).alias("c"),
    )
    assert dict(out.dtypes) == {"a": "string", "b": "bigint", "c": "bigint"}
    row = out.orderBy("b").collect()[0]
    assert (row["a"], row["b"], row["c"]) == ("4", 5, 6)

    wom = spark.createDataFrame([("2024-01-15",)], "d string").select(
        week_of_month_udf()(F.to_date("d")).alias("wom"))
    assert wom.collect()[0]["wom"] == 3
