"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in the ``aws_etl_bank_spark`` package; this
module only adapts its query registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# Entries the round-2 driver never reached (it evaluated only the first 50
# registry entries). These register first so every operator family — nested
# restructuring, streaming, SCD2, catalog pushdown, and the LLM-pipeline ops —
# gets a driver-recorded correctness row each round. The long-green relational
# entries rotate after them.
_PRIORITY = [
    # environment-drift tripwire first: pinned-literal schema oracle makes
    # a testdata regeneration fail in ONE obvious row (TESTDATA.md)
    "testdata_schema_smoke",
    # the 18 entries the driver has NEVER evaluated (r2+r3 both capped at
    # 50): API surfaces + the rows-only hash family
    "job_bookmark_increment", "collection_select_map",
    "partitions_after_repartition", "catalog_schema_fetch",
    "jdbc_conf_roundtrip", "jdbc_extract_csv_ingest", "rdd_source_frame",
    "count_actions", "stream_sample_poll", "sink_collection_write",
    "catalog_purge_partitions", "governed_txn_write",
    "dedup_minhash_pairs", "dedup_minhash_keep", "dedup_simhash_pairs",
    "text_fingerprint", "ann_ivf_topk", "ann_ivf_trained_topk",
    # the 7 rows that failed in r3 (streaming ts-drift crash + ts-bucket
    # tz mismatch), now fixed — must re-prove green on the driver record
    "stream_window_counts", "stream_stateful_counts", "stream_foreach_batch",
    "stream_stream_join", "stream_dedup_ids",
    "ts_bucket_rollup", "ts_gapfill_hourly",
    # round-4 additions: hot-key-split asof + oracle-checked projections
    # of the hash family (planted-duplicate fixtures)
    "join_asof_bucketed", "dedup_minhash_planted_pairs",
    "dedup_simhash_planted_pairs", "text_fingerprint_planted",
    "funnel_view_click_purchase", "ts_rolling_zscore",
    "mix_upsample_by_weight", "agg_salted_event_totals",
    "agg_approx_distinct_ratio", "ann_ivf_planted_twin",
    "cohort_retention_weekly", "stream_sliding_counts",
    "scale_bucketed_join", "scale_range_clustered_read",
    # remaining slots up to the driver's 50-cap fill from the registry's
    # definition order below (long-green relational entries, rotating
    # back in for re-confirmation)
]


def _registry():
    import aws_etl_bank_spark.plans.registry as reg
    import aws_etl_bank_spark.plans.registry_llm  # noqa: F401  (populates REGISTRY)

    full = reg.REGISTRY
    ordered = {name: full[name] for name in _PRIORITY if name in full}
    ordered.update(full)
    return ordered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship fact-snapshot query (SURVEY.md §3.1) on sf0.001."""
    from aws_etl_bank_spark.plans.flagship import build_fact_snapshot
    from aws_etl_bank_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    return build_fact_snapshot(spark, "/root/testdata/sf0.001", fidelity=False)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _registry().items() if spec.oracle}
