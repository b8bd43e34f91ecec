from aws_etl_bank_spark.plans.flagship import (  # noqa: F401
    build_fact_snapshot,
    fact_snapshot_sql,
    prepare_transactions,
    run_banking_etl,
)
