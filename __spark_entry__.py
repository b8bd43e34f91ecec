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


# Slot policy (round 6, per the r5 verdict): evidence debt first.
# Order: (1) the schema tripwire, (2) ts_trend_slope — r5's only red
# row, fixed this round (-0.0 canonicalized on both engines), (3) the
# entries whose implementation or oracle CHANGED this round (flagship
# monthly-avg rewrite; LSH star-sparsified planted pairs/keep; the
# now-non-empty semantic-full fixture), (4) the 19 entries that have
# NEVER been driver-evaluated, (5) the oldest r2-vintage greens (~4
# rounds stale).  The remaining r2/r3 refresh continues in r7.
_PRIORITY = [
    # environment-drift tripwire first: pinned-literal schema oracle makes
    # a testdata regeneration fail in ONE obvious row (TESTDATA.md)
    "testdata_schema_smoke",
    # r5's single red row, root-caused (-0.0 vs +0.0 bitwise) and fixed
    "ts_trend_slope",
    # changed this round — re-prove before anything else: flagship
    # monthly-avg GROUP-BY rewrite; LSH exact-dup pre-pass (star-form
    # planted oracles); the semantic-full fixture now non-empty
    "fact_snapshot", "fact_snapshot_split", "dedup_minhash_planted_pairs",
    "dedup_simhash_planted_pairs", "dedup_minhash_planted_keep",
    "dedup_semantic_pairs_full",
    # new this round: exact distributed top-fraction selection (global
    # histogram form + stratified per-group form), the deterministic
    # epoch-shuffle key, ROLLUP/CUBE grouping sets, the rank-family
    # window, and the native-XML roundtrip
    "text_quality_top_fraction", "text_quality_top_fraction_by_lang",
    "scale_shuffle_key", "agg_rollup_nation_year", "win_rank_family",
    "src_xml_roundtrip", "agg_cube_type_day", "sketch_count_min_estimates",
    # the 19 entries with ZERO driver evidence (local-green only, r5
    # verdict "What's missing" #3)
    "dedup_semantic_pairs", "dedup_semantic_keep",
    "text_decontaminate_semantic",
    "text_bm25_rank", "text_bm25_topk",
    "ann_pq_planted_twin", "ann_ivfpq_planted_twin",
    "stream_cdc_scd2", "text_gopher_filter",
    "tpch_q12_late_shipment_priority", "tpch_q16_supplier_counts_by_part",
    "scalar_datetime_suite", "ts_ewma_smoothing", "ts_moving_median",
    "win_running_sum_cust_split",
    "quality_metrics_orders", "quality_check_lineitem",
    "agg_approx_percentile_band", "stream_static_enrich",
    # oldest evidence in the repo: r2-vintage greens, 4 rounds stale
    # (projection/filter/join/set-op families) — 24 slots
    "win_row_number_topk", "win_lag_delta", "join_dynamicframe_equi",
    "join_multiway_sql", "join_left_semi", "join_left_anti",
    "join_expr_month", "merge_upsert", "apply_mapping_cast",
    "select_fields_nested", "drop_fields_op", "rename_field_op",
    "split_rows_match", "split_rows_rest", "split_fields_op",
    # ---- 50-slot waterline (the driver caps here) ----
    # r7 rotation continues the r2/r3 refresh from this point
    "filter_python_predicate", "filter_drop_policy", "map_python_records", "map_error_policy", "drop_null_fields_op",
    "union_by_name_drift", "union_choice_cast", "resolve_choice_make_cols",
    "subtract_op", "intersect_op", "distinct_op", "orderby_topk",
    "sample_limit",
    "scalar_dates", "scalar_when_case", "scalar_strings", "udf_surface",
    "filter_sql_expr", "string_cleanup", "repartition_coalesce",
    "explode_split", "posexplode_index", "replace_array_element",
    "named_struct_op", "ingestion_time_columns",
    "csv_allstrings_cast", "unbox_json", "scd2_merge_dim", "unbox_csv",
    "unnest_struct", "unnest_ddb",
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
