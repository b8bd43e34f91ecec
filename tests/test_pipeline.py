"""Pipeline runner + reference-parity banking ETL end-to-end
(SURVEY.md §3.3 lifecycle, FIXTURES.md family-A raw zone)."""

import pytest

from aws_etl_bank_spark import pipeline as pl


def _write_raw_zone(spark, raw_dir):
    """Minimal FIXTURES.md family-A raw CSVs (header, all-strings)."""
    import csv
    import os

    os.makedirs(raw_dir, exist_ok=True)
    tables = {
        "customer": (
            ["cust_id", "cust_nm", "add_id", "opn_dt", "end_dt"],
            [["1", "ann", "a1", "2015-01-02", r"\N"],
             ["2", "bob", "a2", "2016-02-03", r"\N"]],
        ),
        "account": (
            ["acc_id", "cust_id", "acc_type", "opn_dt", "end_dt"],
            [["10", "1", "1", "2015-01-02", r"\N"],
             ["11", "1", "2", "2015-03-04", r"\N"],
             ["20", "2", "1", "2016-02-03", r"\N"]],
        ),
        "account_type": (
            ["type_id", "type_nm", "description", "eff_dt", "mat_dt"],
            [["1", "RGB", "regular", "2015-01-01", "2030-01-01"],
             ["2", "BB", "business", "2015-01-01", "2030-01-01"],
             ["3", "WB", "wealth", "2015-01-01", "2030-01-01"]],
        ),
        "payment_type": (
            ["type_code", "type_nm", "description"],
            [["P01", "normal_payment", "x"], ["P02", "refund_payment", "y"]],
        ),
        "payment_transaction": (
            ["trans_id", "acc_id", "before_balance", "amount", "after_balance",
             "transaction_time", "payment_code"],
            [["100", "10", "0", "25.5", "25", "2021-01-05 10:00:00", "P01"],
             ["101", "10", "25", "10.0", "35", "2021-01-05 11:00:00", "P02"],
             ["102", "11", "0", "99.5", "99", "2021-01-06 09:00:00", "P01"],
             ["103", "20", "0", "7.25", "7", "2021-02-01 12:00:00", "P01"]],
        ),
    }
    for name, (header, rows) in tables.items():
        with open(f"{raw_dir}/{name}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            w.writerows(rows)


def test_retry_then_success_with_backoff():
    sleeps = []
    calls = []

    def flaky(ctx):
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("throttled")
        return "ok"

    p = pl.Pipeline([pl.Stage("s", flaky, attempts=3, interval_s=10, backoff=10)],
                    sleep=sleeps.append)
    run = p.run()
    assert run.status == "SUCCEEDED"
    assert run.stages[0].attempts == 3
    assert sleeps == [10, 100]  # reference policy: 10 s interval, x10 backoff


def test_exhausted_stage_fails_run_and_stops():
    def boom(ctx):
        raise RuntimeError("nope")

    reached = []
    p = pl.Pipeline([
        pl.Stage("a", boom, attempts=2, interval_s=0.0),
        pl.Stage("b", lambda ctx: reached.append(1)),
    ], sleep=lambda s: None)
    run = p.run()
    assert run.status == "FAILED"
    assert run.failed_stage == "a"
    assert reached == []  # catch-all → Fail: later stages never run


def test_banking_pipeline_end_to_end(spark, scratch):
    from aws_etl_bank_spark.context import EngineContext

    raw = f"{scratch}/raw_zone"
    golden = f"{scratch}/golden_zone"
    _write_raw_zone(spark, raw)
    ctx = EngineContext(spark)
    run = pl.banking_pipeline(spark, raw, golden, engine_ctx=ctx).run()
    assert run.status == "SUCCEEDED", run.stages
    assert run.stages[0].result > 0  # fact rows
    assert "fact_snapshot_daily_transaction" in run.stages[1].result
    # the register stage replaced the crawler: tables are queryable now
    fact = ctx.create_data_frame_from_catalog("golden", "fact_snapshot_daily_transaction")
    assert fact.count() == run.stages[0].result
    dim = ctx.create_data_frame_from_catalog("golden", "customer")
    # SCD2 stamp applied to the scd2 dims
    assert {"is_active", "record_created_time", "record_updated_time"} <= set(dim.columns)


def test_golden_fact_is_year_partitioned(spark, scratch):
    import os

    raw = f"{scratch}/raw_zone_p"
    golden = f"{scratch}/golden_zone_p"
    _write_raw_zone(spark, raw)
    from aws_etl_bank_spark.plans.flagship import run_banking_etl

    run_banking_etl(spark, raw, golden, write=True)
    fact_dir = f"{golden}/fact_snapshot_daily_transaction"
    parts = [d for d in os.listdir(fact_dir) if d.startswith("p_year=")]
    assert parts  # hive-style partition dirs exist
    # partition pruning: a year-bounded read scans only that partition
    pruned = spark.read.parquet(fact_dir).filter("p_year = 2021")
    assert pruned.count() > 0
