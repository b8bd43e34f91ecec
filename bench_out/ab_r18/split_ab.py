"""Same-JVM interleaved A/B: fact_snapshot_split shapes (VERDICT r17
items 1b + 5).

chained = r16 two chained running_sum_split calls (5 data exchanges,
          2 SMJ join-backs, re-executed first join);
nested  = shipped r17 running_sums_split_nested with lazy
          localCheckpoint on `pre` (2 data exchanges, SHUFFLE_HASH);
persist = nested, but `pre` persisted MEMORY_AND_DISK + unpersisted
          instead of the lazy localCheckpoint (VERDICT item 5 A/B).

Usage: python split_ab.py [sf_dir] [reps]
"""
import sys, time

sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F

from aws_etl_bank_spark.session import get_spark
from aws_etl_bank_spark.plans import flagship

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CBS = 90 * 86400.0  # the fact_snapshot_split registry value


def setup_views(spark):
    trans = flagship.prepare_transactions(spark, SF)
    trans.createOrReplaceTempView("transactions_month")
    trans = flagship.widen_if_underscanned(
        trans, "transaction_date", "cust_id", "acc_id", "account_type_name",
        probe=spark.read.parquet(f"{SF}/lineitem.parquet"))
    trans.createOrReplaceTempView("transactions")
    flagship.build_date_dim(spark, "1995-01-01", "2002-12-31") \
        .createOrReplaceTempView("date_dim")


def build_pre(spark):
    return spark.sql(f"""
WITH {flagship._SHARED_CTES},
windowed AS (
    SELECT transaction_date, cust_id, acc_id, account_type_name,
           account_no_transactions_daily, account_daily_spending,
           {flagship._W_CD_COLS}
    FROM cte_acc_daily
    WINDOW w_cd AS (PARTITION BY transaction_date, cust_id)
)
SELECT /*+ BROADCAST(d), BROADCAST(m) */
       d.date_key,
       a1.transaction_date, a1.cust_id, a1.acc_id, a1.account_type_name,
       a1.account_no_transactions_daily,
       a1.account_daily_spending,
       a1.cust_no_transaction_daily,
       a1.cust_daily_payment_type,
       a1.cust_daily_spending,
       ROUND(m.month_sum / m.month_cnt, 2)  AS avg_monthly_spending,
       d.day_type, d.is_holiday
FROM windowed a1
JOIN cte_month_avg m
  ON m.month_key = month(a1.transaction_date)
JOIN date_dim d
  ON d.full_date = a1.transaction_date""")


def _final_select(split):
    return split.select(
        "date_key", "transaction_date", "cust_id", "acc_id",
        "account_type_name", "account_no_transactions_daily",
        F.round("account_daily_spending", 2).alias("account_daily_spending"),
        F.round("account_accum_spending", 2).alias("account_accum_spending"),
        "cust_no_transaction_daily",
        F.round("cust_daily_spending", 2).alias("cust_daily_spending"),
        "cust_daily_payment_type",
        F.round("cust_accum_spending", 2).alias("cust_accum_spending"),
        "avg_monthly_spending", "day_type", "is_holiday",
    ).orderBy("cust_id", "transaction_date", "acc_id")


def run_chained(spark):
    from aws_etl_bank_spark.operators.windows import running_sum_split
    pre = build_pre(spark).localCheckpoint(eager=False)
    split = running_sum_split(
        pre, ["cust_id", "acc_id"], "transaction_date",
        "account_daily_spending", "account_accum_spending", CBS)
    split = running_sum_split(
        split, ["cust_id"], "transaction_date",
        "account_daily_spending", "cust_accum_spending", CBS)
    _final_select(split).write.format("noop").mode("overwrite").save()


def run_nested(spark):
    from aws_etl_bank_spark.operators.windows import running_sums_split_nested
    pre = build_pre(spark).localCheckpoint(eager=False)
    split = running_sums_split_nested(
        pre, ["cust_id", "acc_id"], ["cust_id"], "transaction_date",
        "account_daily_spending",
        "account_accum_spending", "cust_accum_spending", CBS,
        nullsafe=False)
    _final_select(split).write.format("noop").mode("overwrite").save()


def run_persist(spark):
    from pyspark import StorageLevel
    from aws_etl_bank_spark.operators.windows import running_sums_split_nested
    pre = build_pre(spark).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        split = running_sums_split_nested(
            pre, ["cust_id", "acc_id"], ["cust_id"], "transaction_date",
            "account_daily_spending",
            "account_accum_spending", "cust_accum_spending", CBS,
            nullsafe=False)
        _final_select(split).write.format("noop").mode("overwrite").save()
    finally:
        pre.unpersist()


VARIANTS = {"chained": run_chained, "nested": run_nested,
            "persist": run_persist}


def main():
    spark = get_spark("split_ab")
    spark.sparkContext.setLogLevel("OFF")
    from bench import calibration_probe

    setup_views(spark)
    order = ["chained", "nested", "persist"]
    for v in order:  # warmup
        t0 = time.time()
        VARIANTS[v](spark)
        print(f"warmup {v}: {time.time()-t0:.3f}", flush=True)
    res = {v: [] for v in order}
    probes = [round(calibration_probe(spark), 3)]
    for rep in range(REPS):
        for v in order:
            t0 = time.time()
            VARIANTS[v](spark)
            res[v].append(round(time.time() - t0, 3))
        probes.append(round(calibration_probe(spark), 3))
    for v in order:
        ss = sorted(res[v])
        print(v, "median", ss[len(ss) // 2], "samples", res[v])
    print("probes", probes)
    print("sf", SF)


main()
