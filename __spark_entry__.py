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


# Slot policy (round 5): NEVER-DRIVER-EVALUATED entries first — an entry
# with no driver record at all outranks a stale green (the r3 testdata
# drift proved greens can rot, but zero evidence is worse than old
# evidence).  The ~43 operators added this round therefore take the
# driver's 50-slot cap ahead of the r2-vintage refresh, which resumes in
# later rounds' rotations.  Cumulative record: CORRECTNESS_r2..r4 cover
# all 133 pre-round-5 entries; every new entry below is green under
# scripts/verify_entry.py (the driver-strength local replica) at sf0.01,
# and the sf0.1/sf1 audits in PERF.md.
_PRIORITY = [
    # environment-drift tripwire first: pinned-literal schema oracle makes
    # a testdata regeneration fail in ONE obvious row (TESTDATA.md)
    "testdata_schema_smoke",
    # new in round 5, never driver-evaluated: the derived LIMIT oracle,
    # the oracle-checked minhash keep path, the hot-key-split z-score
    "tpch_q2_min_cost_supplier", "tpch_q9_product_type_profit",
    "tpch_q11_important_stock", "tpch_q19_disjunctive_revenue",
    "tpch_q20_potential_promotion", "tpch_q21_waiting_supplier",
    "tpch_q22_dormant_high_balance",
    # the VERDICT-item-3/4 proof entries: the derived LIMIT oracle, the
    # planted minhash keep-set, the hot-key-split rolling z-score
    "sample_limit_contained", "dedup_minhash_planted_keep",
    "ts_rolling_zscore_bucketed",
    "join_bloom_prefilter", "dedup_fuzzy_ed1_pairs",
    "dedup_fuzzy_entity_ids", "text_pack_sequences",
    "graph_pagerank", "text_unigram_logprob",
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume", "tpch_q18_large_volume_customer",
    "text_hash_split", "src_orc_roundtrip", "src_jsonl_roundtrip",
    "dedup_minhash_incremental", "maintenance_compact_roundtrip",
    "scale_skew_report", "ts_trend_slope",
    "tpch_q7_volume_shipping", "tpch_q10_returned_items",
    "tpch_q4_order_priority", "tpch_q6_forecast_revenue",
    "tpch_q13_customer_distribution", "tpch_q14_promo_revenue",
    "tpch_q8_market_share", "tpch_q15_top_supplier", "tpch_q17_small_quantity",
    "ts_rollup_incremental_merge",
    "stream_incremental_dedup", "infer_embed_texts",
    "win_first_last_nth", "scalar_string_suite",
    "scalar_json_suite", "join_null_safe_equality",
    "grouped_map_normalize",
    "fraud_benford_digits", "rfm_segmentation",
    "loan_amortization_schedule",
    # DSIR data selection and the Z-order clustered layout (new this
    # session) take q12/q16's slots — the TPC-H family keeps 20 rows
    # above the line; q12/q16 rotate up in r6
    "llm_dsir_select", "scale_zorder_clustered_read",
    # below the 50-slot waterline this round (r6 rotation picks these
    # up): scale_bucketed_join was already driver-green in r4;
    # datetime/EWMA are family-redundant with suites above
    "tpch_q12_late_shipment_priority", "tpch_q16_supplier_counts_by_part",
    "scale_bucketed_join", "scalar_datetime_suite", "ts_ewma_smoothing",
    "ts_moving_median",
    "ann_pq_planted_twin", "ann_ivfpq_planted_twin", "stream_cdc_scd2",
    "text_gopher_filter",
    "win_running_sum_cust_split",
    "dedup_semantic_pairs", "dedup_semantic_keep",
    "quality_metrics_orders", "quality_check_lineitem",
    "text_bm25_rank", "text_bm25_topk", "agg_approx_percentile_band",
    "stream_static_enrich", "dedup_semantic_pairs_full",
    "text_decontaminate_semantic",
    # the 40 entries last validated in round 2 (projection/filter/join/
    # nested-restructuring/scalar families), oldest evidence in the repo
    "win_row_number_topk", "win_lag_delta", "join_dynamicframe_equi",
    "join_multiway_sql", "join_left_semi", "join_left_anti",
    "join_expr_month", "merge_upsert", "apply_mapping_cast",
    "select_fields_nested", "drop_fields_op", "rename_field_op",
    "split_rows_match", "split_rows_rest", "split_fields_op",
    "filter_python_predicate", "filter_drop_policy", "map_python_records",
    "map_error_policy", "drop_null_fields_op", "union_by_name_drift",
    "union_choice_cast", "resolve_choice_make_cols", "subtract_op",
    "intersect_op", "distinct_op", "orderby_topk", "sample_limit",
    "scalar_dates", "scalar_when_case", "scalar_strings", "udf_surface",
    "filter_sql_expr", "string_cleanup", "repartition_coalesce",
    "explode_split", "posexplode_index", "replace_array_element",
    "named_struct_op", "ingestion_time_columns",
    # remaining slots: the oldest round-3-vintage entries
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
