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


# Slot policy (round 13, per the r12 verdict tasks 1 + 2 + 6): slot 1
# is the round's one red row, rewritten through the proven
# integer-cents canon (the r12 bisection read out decimal +
# NULL-free-decimal probes RED vs bool + cents probes GREEN, all four
# locally repr-identical vs DuckDB ⇒ the driver environment's bitwise
# hash diverges on DECIMAL values; the four probes did their job and
# are retired from the registry).  Slots 2-6 are the round's new
# surfaces (pipe syntax, mergeable approx_top_k, statestore reader,
# Python DataSource filter pushdown, Arrow streaming sink).
# Slots 7-15 are the nine non-TPC-H r5-vintage refreshes; slots 16-35
# the 20 TPC-H r5-vintage entries in numeric order (their money
# outputs are all DOUBLE — the r13 DECIMAL sweep confirmed the only
# DECIMAL-typed output columns in the whole registry were the retired
# probe family, so the decimal divergence class cannot recur here).
# Slots 36-50 are the first 15 r6-vintage entries (registry order).
_PRIORITY = [
    # slot 1: the r12 red row, folded onto the cents canon
    "scalar_exists_subqueries",
    # slots 2-6: NEW in r13 — SQL pipe syntax (|> chains), the
    # mergeable approx_top_k accumulate/combine/estimate path, the
    # statestore batch format reading a streaming checkpoint, Python
    # DataSource filter pushdown (pushFilters row-group pruning), and
    # the Arrow streaming manifest sink (DataSourceStreamArrowWriter);
    # each verified at sf0.01 + sf1 the day it landed
    "sql_pipe_syntax_pricing", "agg_approx_top_k_merge",
    "stream_state_reader", "src_pyds_filter_pushdown",
    "stream_pyds_arrow_sink",
    # slots 7-15: non-TPC-H r5-vintage refreshes
    "src_jsonl_roundtrip", "src_orc_roundtrip",
    "stream_incremental_dedup",
    "text_hash_split", "text_pack_sequences", "text_unigram_logprob",
    "ts_rolling_zscore_bucketed", "ts_rollup_incremental_merge",
    "win_first_last_nth",
    # slots 16-35: TPC-H r5-vintage refreshes (q12/q16 are r6-vintage
    # and queue with their cohort below)
    "tpch_q1_pricing_summary", "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority", "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_type_profit", "tpch_q10_returned_items",
    "tpch_q11_important_stock", "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue", "tpch_q15_top_supplier",
    "tpch_q17_small_quantity", "tpch_q18_large_volume_customer",
    "tpch_q19_disjunctive_revenue", "tpch_q20_potential_promotion",
    "tpch_q21_waiting_supplier", "tpch_q22_dormant_high_balance",
    # slots 36-50: r6-vintage refreshes, first 15 in registry order
    "fact_snapshot", "fact_snapshot_split",
    "win_running_sum_cust_split", "win_row_number_topk",
    "join_dynamicframe_equi", "join_multiway_sql",
    "join_left_semi", "join_left_anti", "join_expr_month",
    "merge_upsert", "apply_mapping_cast", "select_fields_nested",
    "drop_fields_op", "rename_field_op", "split_rows_match",
    # ---- 50-slot waterline: split_rows_match is slot 50
    # r14 head: the 31 remaining r6-vintage entries, then r7-vintage
    # (win_lag_delta onward, registry order) to fill the window
    "split_rows_rest", "split_fields_op", "agg_rollup_nation_year",
    "sketch_count_min_estimates", "win_rank_family",
    "quality_metrics_orders", "quality_check_lineitem",
    "agg_approx_percentile_band", "src_xml_roundtrip",
    "ts_trend_slope", "scalar_datetime_suite", "ts_moving_median",
    "ts_ewma_smoothing", "tpch_q12_late_shipment_priority",
    "tpch_q16_supplier_counts_by_part", "dedup_semantic_pairs",
    "dedup_semantic_keep", "text_quality_top_fraction_by_lang",
    "scale_shuffle_key", "dedup_minhash_planted_pairs",
    "dedup_simhash_planted_pairs", "dedup_minhash_planted_keep",
    "text_bm25_rank", "text_bm25_topk", "stream_static_enrich",
    "dedup_semantic_pairs_full", "text_decontaminate_semantic",
    "ann_pq_planted_twin", "stream_cdc_scd2", "text_gopher_filter",
    "ann_ivfpq_planted_twin",
    "win_lag_delta", "filter_python_predicate", "filter_drop_policy",
    "map_python_records", "map_error_policy", "drop_null_fields_op",
    "union_by_name_drift", "union_choice_cast",
    "resolve_choice_make_cols", "subtract_op", "intersect_op",
    "distinct_op", "orderby_topk", "sample_limit", "scalar_dates",
    "scalar_when_case", "scalar_strings", "udf_surface",
    "filter_sql_expr", "string_cleanup", "repartition_coalesce",
    "explode_split", "posexplode_index", "replace_array_element",
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
