from aws_etl_bank_spark.sources.catalog import Catalog, CatalogTable  # noqa: F401
from aws_etl_bank_spark.sources.datasource import DataSource, DataSink  # noqa: F401
