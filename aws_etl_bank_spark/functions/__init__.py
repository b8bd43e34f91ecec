from aws_etl_bank_spark.functions.columns import (  # noqa: F401
    explodeWithIndex,
    namedStruct,
    replaceArrayElement,
    add_ingestion_time_columns,
    add_scd2_columns,
    clean_csv_value,
    strip_quotes,
)
from aws_etl_bank_spark.functions.datedim import (  # noqa: F401
    build_date_dim,
    vn_holidays,
    week_of_month_col,
)
from aws_etl_bank_spark.functions.udf import (  # noqa: F401
    pandas_scalar_udf,
    typed_udf,
    udf,
    week_of_month_udf,
)
from aws_etl_bank_spark.functions.scale import (  # noqa: F401
    read_bucketed,
    salted_agg,
    salted_join,
    with_salt,
    write_bucketed,
)
