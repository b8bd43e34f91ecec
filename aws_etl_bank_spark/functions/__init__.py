from aws_etl_bank_spark.functions.columns import (  # noqa: F401
    explodeWithIndex,
    namedStruct,
    replaceArrayElement,
    add_ingestion_time_columns,
)
from aws_etl_bank_spark.functions.datedim import (  # noqa: F401
    build_date_dim,
    vn_holidays,
    week_of_month_col,
)
