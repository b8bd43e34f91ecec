"""aws_etl_bank_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the LeKiet258/AWS-ETL-Bank reference.

The reference is an AWS Glue banking lakehouse (PySpark + the ``awsglue``
DynamicFrame binding layer).  This engine re-expresses that surface
Spark-first: every relational operator is a Catalyst logical-plan
declaration (DataFrame / SQL), the genuinely custom subsystems
(self-describing choice schemas, error-record channel, relationalize,
job bookmarks) are Python-level DataFrame rewrites — no RDD hot paths,
no driver-side loops over data.

Public API (mirrors the reference surface, see SURVEY.md §2):

- :func:`aws_etl_bank_spark.session.get_spark` — tuned session factory
- :class:`aws_etl_bank_spark.operators.dynamicframe.DynamicFrame`
- :class:`aws_etl_bank_spark.context.EngineContext` — source/sink/catalog
  dispatch (the GlueContext analog)
- :mod:`aws_etl_bank_spark.transforms` — transform-class façade
- :mod:`aws_etl_bank_spark.plans.flagship` — the fact-snapshot query
- :mod:`aws_etl_bank_spark.llm` — dedup / similarity / text / multimodal
  operators for large-scale training-data pipelines
"""

from aws_etl_bank_spark.session import get_spark  # noqa: F401
from aws_etl_bank_spark.operators.dynamicframe import (  # noqa: F401
    DynamicFrame,
    DynamicFrameCollection,
    ResolveOption,
)
from aws_etl_bank_spark.scd import scd2_merge, scd2_stamp  # noqa: F401
from aws_etl_bank_spark.pipeline import Pipeline, Stage, banking_pipeline  # noqa: F401

__version__ = "0.2.0"
