"""Deequ-style constraint metrics (functions/quality.py): values, the
one-pass plan shape, and the assertion layer."""

import pyspark.sql.functions as F
import pytest

from aws_etl_bank_spark.functions import quality as Q


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", 20.0),
        (3, None, 30.0),
        (4, "b", -5.0),
    ]
    return spark.createDataFrame(rows, "id long, tag string, amount double")


def test_profile_values(frame):
    out = Q.profile(frame, [
        Q.row_count(),
        Q.completeness("tag"),
        Q.uniqueness("id"),
        Q.uniqueness("tag"),
        Q.compliance("amount>0", F.col("amount") > 0),
        Q.minimum("amount"),
        Q.maximum("amount"),
        Q.mean("amount"),
    ])
    got = {r["metric"]: r["value"] for r in out.collect()}
    assert got == {
        "count(*)": 4.0,
        "completeness(tag)": 0.75,
        "uniqueness(id)": 1.0,
        "uniqueness(tag)": 0.5,      # countDistinct ignores the NULL
        "compliance(amount>0)": 0.75,
        "min(amount)": -5.0,
        "max(amount)": 30.0,
        "mean(amount)": 13.75,
    }


def test_profile_metric_order_and_schema(frame):
    out = Q.profile(frame, [Q.row_count(), Q.minimum("amount")])
    assert [f.name for f in out.schema.fields] == ["metric", "value"]
    assert [r["metric"] for r in out.collect()] == ["count(*)", "min(amount)"]


def test_null_compliance_counts_as_failing(spark):
    df = spark.createDataFrame([(1, None), (2, 5.0)], "id long, x double")
    out = Q.profile(df, [Q.compliance("x>0", F.col("x") > 0)])
    assert out.collect()[0]["value"] == 0.5


def test_single_pass_plan(frame):
    out = Q.profile(frame, [
        Q.row_count(), Q.completeness("tag"), Q.mean("amount"),
        Q.uniqueness("id"),
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one scan (local relation here), no join, no union of per-metric jobs
    assert "Join" not in plan and "Union" not in plan


def test_check_assertions(frame):
    out = Q.check(frame, [
        ("id is key", Q.uniqueness("id"), lambda v: v == 1.0),
        ("amounts positive", Q.compliance("amount>0", F.col("amount") > 0),
         lambda v: v == 1.0),
    ])
    got = {r["check"]: (r["value"], r["passed"]) for r in out.collect()}
    assert got["id is key"] == (1.0, True)
    assert got["amounts positive"] == (0.75, False)


def test_approx_uniqueness_close(frame):
    (name, expr) = Q.uniqueness("id", approx=True)
    v = frame.agg(expr.alias("v")).collect()[0]["v"]
    assert 0.9 <= v <= 1.1


def test_fk_orphan_report_planted_and_null_fk(spark):
    import pyspark.sql.functions as F  # noqa: F401

    from aws_etl_bank_spark.functions.quality import fk_orphan_report

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = {r["relation"]: r for r in
           fk_orphan_report([("c->p", child, "fk", parent, "pk")]).collect()}
    r = out["c->p"]
    # fk=99 is an orphan; fk=NULL is NOT (unknown, not violated)
    assert (r["n_child"], r["n_orphans"], r["orphan_frac"]) == (4, 1, 0.25)
