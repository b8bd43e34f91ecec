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


# Slot policy (round 10, per the r9 verdict task 2): slots 1-2 are the
# two entries whose array outputs crashed the driver's pandas canon in
# r9 and are now array_join-serialized (text_vocab_encode,
# scd_snapshot_diff — values were already sf0.01+sf1-proven; this
# re-greens the hard signal).  Slots 3-23 are the 21 r9-new entries the
# driver has never evaluated (each builder-verified green via
# scripts/verify_entry.py the day it landed).  Slots 24-50 are the 27
# alphabetically-first ORACLE-BACKED r4-vintage entries (the oldest
# driver evidence in the ledger; 46 entries are r4-vintage, so the
# remaining 13 oracle-backed + 6 rows-only queue below the waterline
# for r11, followed by any r10-new entries).
_PRIORITY = [
    # slots 1-2: r9 canon-crash fixes (array outputs now serialized)
    "text_vocab_encode", "scd_snapshot_diff",
    # slots 3-23: the 21 never-driver-evaluated r9 entries
    "agg_gini_concentration_hist", "src_avro_datum_roundtrip",
    "src_avro_ocf_roundtrip", "feature_quantile_normalize",
    "feature_quantile_normalize_grouped", "agg_rollup_hierarchy",
    "label_time_to_event", "fraud_round_amount_share", "agg_partial_merge",
    "win_dist_family_by_user", "maintenance_compact_small_files",
    "ts_rolling_median_k7", "quality_k_anonymity", "stream_avro_ingest",
    "catalog_analyze_columns", "join_null_safe_equi",
    "ops_schema_merge_evolution", "udaf_grouped_weighted_mean",
    "udtf_sentence_split", "text_zipf_hapax", "text_lang_vocab_overlap",
    # slots 24-50: oldest driver vintage (r4), oracle-backed first
    "agg_approx_distinct_ratio", "agg_avg_by_month",
    "agg_collect_struct_size", "agg_count_distinct", "agg_daily_cust",
    "agg_nested_max", "agg_payment_types", "agg_salted_event_totals",
    "ann_ivf_planted_twin", "catalog_purge_partitions",
    "catalog_schema_fetch", "cohort_retention_weekly",
    "collection_select_map", "count_actions", "fact_snapshot_fidelity",
    "funnel_view_click_purchase", "governed_txn_write",
    "jdbc_conf_roundtrip", "jdbc_extract_csv_ingest",
    "job_bookmark_increment", "join_asof_bucketed", "mix_upsample_by_weight",
    "partitions_after_repartition", "rdd_source_frame",
    "scale_bucketed_join", "scale_range_clustered_read",
    "sink_collection_write",
    # ---- 50-slot waterline (the driver caps here) ----
    # r11 rotation resumes here, in this order: the 23 r10-NEW entries
    # (builder-verified at sf0.01 + sf1 the day each landed, never
    # driver-evaluated), then the remaining r4-vintage oracle-backed,
    # then rows-only r4-vintage, then the schema tripwire
    "ml_kmeans_lloyd", "text_bpe_train_merges", "graph_cc_star_chain",
    "score_ks_statistic", "quality_l_diversity", "scalar_hof_suite",
    "subtract_all_op", "intersect_all_op", "ops_observe_metrics",
    "ops_table_reconcile_buckets", "catalog_equidepth_histogram",
    "ops_partition_file_stats", "src_avro_logical_types",
    "src_python_datasource", "udf_sql_scalar", "scalar_variant_suite",
    "agg_grouping_sets", "quality_completeness_profile",
    "src_fixed_width_ingest", "src_csv_multiline_quoted",
    "udf_cogroup_apply", "scalar_na_suite", "scalar_map_suite",
    "stream_dedup_ids", "stream_foreach_batch", "stream_sample_poll",
    "stream_sliding_counts", "stream_stateful_counts", "stream_stream_join",
    "stream_window_counts", "text_fingerprint_planted", "ts_bucket_rollup",
    "ts_gapfill_hourly", "ts_rolling_zscore", "win_running_sum_acct",
    "win_running_sum_cust",
    "ann_ivf_topk", "ann_ivf_trained_topk", "dedup_minhash_keep",
    "dedup_minhash_pairs", "dedup_simhash_pairs", "text_fingerprint",
    "testdata_schema_smoke",
    # rest of the registry fills from definition order below
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
