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


# Slot policy (round 9, per the r8 verdict task 1): the 48 entries
# that landed after the r8 waterline filled (sketch_hll_grouped ..
# agg_gini_concentration — each builder-verified green vs DuckDB at
# sf0.001 + sf0.01 + sf1 the day it landed; bench_out/VERIFY_full.json
# and the sf1_*_r8 logs) take the first 48 slots so every registry
# entry finally has a driver-vintage CORRECTNESS row.  Slots 49-50 are
# the two multimodal entries whose NULL-payload guard changed in r8.
# After this round the rotation becomes a pure oldest-first refresh:
# the r4-vintage rows (agg_* §2.4 family, catalog/JDBC family) queue
# immediately below the waterline for r10.
_PRIORITY = [
    # 48 never-driver-evaluated r8 entries, ledger order
    "sketch_hll_grouped", "stream_kmv_distinct", "sample_bottomk_hash",
    "ts_ohlc_bucket",
    "graph_triangle_count", "sample_weighted_priority", "ts_active_users_7d",
    "label_churn_window", "assoc_copurchase_lift", "ts_seasonal_strength",
    "feature_hash_text", "scale_heavy_hitters", "embed_pca_planted_axis",
    "feature_velocity_windows", "session_markov_transitions",
    "score_psi_drift", "sample_per_group_bottomk", "multimodal_decode_wav",
    "stream_heavy_hitters", "embed_jl_projection", "dedup_substring_remove",
    "feature_decayed_velocity", "quality_entropy_profile",
    "scale_bitmap_retention", "session_top_paths", "ann_ivf_index_persisted",
    "text_vocab_encode", "scd_snapshot_diff", "ts_lateness_profile",
    "ts_rollup_cascade", "text_word_pmi", "feature_impute_group",
    "feature_target_encode_loo", "sample_class_balanced",
    "split_temporal_purged", "ml_ols_closed_form", "stream_batch_unified",
    "agg_mode_per_group",
    "join_interval_overlap", "multimodal_audio_spectrum",
    "agg_weighted_median", "ts_autocorrelation", "graph_common_neighbors",
    "stream_ohlc_incremental", "csv_malformed_policy",
    "funnel_time_to_convert", "dedup_cluster_sizes",
    "agg_gini_concentration",
    # slots 49-50: implementation changed in r8 (NULL-payload decode
    # guard) — their newest driver rows predate the change
    "multimodal_decode_ppm", "multimodal_thumbnail_vec",
    # ---- 50-slot waterline (the driver caps here) ----
    # r10 rotation begins: the schema tripwire re-anchors, then the
    # oldest driver evidence (r4-vintage) refreshes oldest-first
    "testdata_schema_smoke",
    "agg_daily_cust", "agg_payment_types", "agg_count_distinct",
    "agg_avg_by_month", "agg_nested_max", "agg_collect_struct_size",
    "count_actions",
    # rest of the 50-cap fills from registry definition order below
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
