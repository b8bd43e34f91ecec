from aws_etl_bank_spark.operators.dynamicframe import (  # noqa: F401
    DynamicFrame,
    DynamicFrameCollection,
    DynamicRecord,
    ResolveOption,
)
