"""Demo-job parity (reference glue-jobs/jobs/demo/demo.py:1-27).

The reference's second (and only other) job: read a landing-zone CSV
(header, all-strings), write it to the golden zone as Parquet via
``coalesce(1)``, commit the job bookmark.

``single_file=True`` replicates the reference's ``coalesce(1)`` exactly —
correct only for demo-sized data (one task writes everything, the classic
small-job pattern that becomes a straggler at scale).  The default keeps
the natural partitioning, which is what the same job should do at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def run_demo_job(spark: SparkSession, landing_csv: str, golden_path: str,
                 single_file: bool = False, job=None) -> DataFrame:
    df = (
        spark.read.option("header", "true").option("delimiter", ",")
        .csv(landing_csv)
    )
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").parquet(golden_path)
    if job is not None:
        job.commit()
    return df
