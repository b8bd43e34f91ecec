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
    "csv_allstrings_cast", "unbox_json", "scd2_merge_dim", "unbox_csv",
    "unnest_struct", "unnest_ddb", "relationalize_root", "relationalize_child",
    "spigot_passthrough", "catalog_pushdown", "dedup_exact",
    "graph_connected_components", "dedup_ngram_keep_transitive",
    "dedup_ngram_jaccard", "dedup_embedding_pairs", "ann_bruteforce_topk",
    "text_stats_quality", "text_token_counts", "text_langid",
    "multimodal_meta", "multimodal_frames",
    "stream_window_counts", "stream_sessionize", "stream_stateful_counts",
    "stream_foreach_batch",
    # round-3 first-class operators (curation, temporal/interval joins,
    # time-series, streaming joins, analytics) — ahead of the thinner
    # API-surface promotions so a driver evaluation cap lands on the
    # least-informative entries first
    "llm_curation_pipeline", "text_chunking", "stratified_sample_lang",
    "text_pii_scrub", "text_repetition", "text_decontaminate",
    "token_budget_mix",
    "join_asof_purchase", "join_range_bands", "dedup_lines_c4",
    "ts_bucket_rollup", "ts_gapfill_hourly", "agg_cube_grouping",
    "pivot_event_counts", "stream_stream_join", "stream_dedup_ids",
    "agg_percentiles", "scd2_as_of_read", "unpivot_melt", "win_rank_family",
    # round-3 additions: previously tests-only API surfaces, now oracle-checked
    "src_getsource_csv_getframe", "src_parquet_sink_catalog_roundtrip",
    "src_sample_frame_full", "todf_resolve_option_cast",
    "errors_as_dynamic_frame", "job_bookmark_increment",
    "collection_select_map", "partitions_after_repartition",
    "catalog_schema_fetch", "jdbc_conf_roundtrip", "jdbc_extract_csv_ingest",
    "rdd_source_frame", "count_actions", "stream_sample_poll",
    "sink_collection_write", "catalog_purge_partitions", "governed_txn_write",
    # rows-only (hash-family / approximate by design): weaker driver check,
    # so least harmed if a driver evaluation cap lands mid-list
    "dedup_minhash_pairs", "dedup_minhash_keep", "dedup_simhash_pairs",
    "text_fingerprint", "ann_ivf_topk", "ann_ivf_trained_topk",
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
